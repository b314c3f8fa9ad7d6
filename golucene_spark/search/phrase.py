"""PhraseQuery (Q18): exact-phrase matching over indexed positions.

The reference indexes positions (W4, termsHashConsumerPerField.go:268-282)
but has no phrase scorer (SURVEY §2.4 Q18 marked v2).  We implement the
Lucene semantics: phrase frequency = number of positions p such that
term_i occurs at p+i for all i; the doc is scored by the query's
similarity with freq=phraseFreq and idf = sum of the terms' idfs
(Lucene's PhraseWeight sums idfs via Similarity.idfExplain(terms)).

Execution shape: conjunction (inner joins on doc_id — only docs
containing ALL terms survive) -> one vectorized pandas stage that
intersects offset-shifted position sets for the WHOLE Arrow batch at
once: per-doc position arrays are flattened into a single int64 array
keyed by (row_index << 32) + (position - term_offset), so one
np.intersect1d per query term replaces any per-doc Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .ast import PhraseQuery


def _flat_positions(col, term_offset: int, n_rows: int):
    """Column of packed little-endian int32 position blobs -> sorted
    int64 keys (row << 32) + (pos - term_offset), invalid (negative)
    shifts dropped.  One frombuffer over the concatenated blobs — no
    per-position Python work."""
    bufs = [bytes(b) if b is not None else b"" for b in col]
    lens = np.fromiter((len(b) >> 2 for b in bufs), dtype=np.int64, count=n_rows)
    flat = np.frombuffer(b"".join(bufs), dtype="<i4").astype(np.int64)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    adj = flat - term_offset
    if term_offset:
        valid = adj >= 0
        rows, adj = rows[valid], adj[valid]
    return (rows << 32) + adj


def phrase_freq_frame(index, field: str, terms: list[str]) -> DataFrame:
    """(doc_id, freq, dlq, norm_byte) for docs matching the exact phrase."""
    base = None
    for i, t in enumerate(terms):
        p = index.postings_for_terms(field, [t], with_positions=True).select(
            F.col("doc_id"),
            F.col("positions").alias(f"pos{i}"),
            *( [F.col("dlq"), F.col("norm_byte")] if i == 0 else [] ),
        )
        base = p if base is None else base.join(p, "doc_id")

    n = len(terms)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("freq", T.IntegerType()),
            T.StructField("dlq", T.DoubleType()),
            T.StructField("norm_byte", T.IntegerType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            match = _flat_positions(pdf["pos0"], 0, m)
            for i in range(1, n):
                if match.size == 0:
                    break
                nxt = _flat_positions(pdf[f"pos{i}"], i, m)
                match = np.intersect1d(match, nxt, assume_unique=True)
            freqs = np.bincount(
                (match >> 32).astype(np.int64), minlength=m
            ).astype(np.int32) if match.size else np.zeros(m, dtype=np.int32)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "freq": freqs,
                    "dlq": pdf["dlq"],
                    "norm_byte": pdf["norm_byte"],
                }
            )
            yield out[out["freq"] > 0]

    return base.mapInPandas(compute, schema)


def phrase_search(searcher, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """Top-k BM25/classic scoring of an exact phrase (the PhraseQuery
    path through the Searcher — same stats/weights machinery as every
    other query)."""
    from .executor import RESULT_SCHEMA

    terms = list(terms)
    if not terms:
        return searcher.index.spark.createDataFrame([], RESULT_SCHEMA)
    return searcher.search(PhraseQuery(field, tuple(terms)), k)
