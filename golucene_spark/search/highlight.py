"""Snippet highlighting for search hits.

The reference carries no highlighter (Lucene's lives outside core);
search UIs need one, so we provide the Spark-native shape: join the
hits with the source table and compute, per hit, the first match
position of each query term plus a fixed-width snippet window around
the earliest match.  Pure Catalyst (JVM locate/substring) — trivially
SQL-mirrorable, no Python in the loop.

Semantics (deliberately simple + exactly specified):
- match = first case-insensitive occurrence of the term as a substring
  of the document text (1-based char position; 0 = no match),
- snippet = substring(text, max(1, first_pos - before), width) around
  the earliest matching term, empty string when nothing matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def highlight(
    hits: DataFrame,
    source: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    before: int = 20,
    width: int = 80,
) -> DataFrame:
    """hits (doc_id, score) x source (doc_id, text) -> one row per hit
    with per-term first-match positions and a snippet window."""
    src = source.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    j = hits.join(src, "doc_id")
    low = F.lower(F.col("_text"))
    pos_cols = [
        F.locate(t.lower(), low).alias(f"pos_{i}") for i, t in enumerate(terms)
    ]
    j = j.select("*", *pos_cols)
    # earliest nonzero match position (0 when no term matches)
    nonzero = [
        F.when(F.col(f"pos_{i}") > 0, F.col(f"pos_{i}")) for i in range(len(terms))
    ]
    first = F.least(*nonzero) if len(terms) > 1 else nonzero[0]
    first = F.coalesce(first, F.lit(0))
    start = F.greatest(F.lit(1), first - before)
    snippet = F.when(first > 0, F.substring(F.col("_text"), start, width)).otherwise(
        F.lit("")
    )
    return j.select(
        "doc_id",
        *[c for c in hits.columns if c != "doc_id"],
        *[F.col(f"pos_{i}").cast("int").alias(f"pos_{i}") for i in range(len(terms))],
        snippet.alias("snippet"),
    )
