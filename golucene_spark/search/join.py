"""Query-time join — the Lucene join module's JoinUtil.createJoinQuery
(not ported by the reference; core Lucene 4.10 contrib): values of
``from_field`` harvested from the docs matching ``from_query`` become a
term filter on ``to_field`` of the target index.

Spark-first shape: the from-side match frame joins the from-index's
keyword postings once (term-pruned scan), the distinct join values then
inner-join the to-index's postings for ``to_field`` — set-oriented,
never a driver-side value collect, so a join over millions of distinct
keys stays a shuffle/broadcast join that AQE sizes from measured
stats.  ScoreMode.None semantics: every joined to-doc scores the
constant ``boost`` (compose with ConstantScoreQuery/booleans for other
modes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .facets import field_postings


def join_search(
    from_searcher,
    from_query,
    from_field: str,
    to_searcher,
    to_field: str,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """(doc_id, score) of to-index docs whose ``to_field`` value occurs
    as ``from_field`` of some from-index doc matching ``from_query``;
    constant score, (score desc, doc_id asc) top-k."""
    if isinstance(from_query, str):
        from .parser import parse_query

        from_query = parse_query(from_query)
    matches = from_searcher.score_frame(from_query).select("doc_id")
    join_terms = (
        field_postings(from_searcher.index, from_field)
        .join(matches, "doc_id")
        .select("term")
        .distinct()
    )
    to_docs = (
        field_postings(to_searcher.index, to_field)
        .join(join_terms, "term", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        to_docs.select("doc_id", F.lit(float(boost)).alias("score"))
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )
