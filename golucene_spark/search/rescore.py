"""QueryRescorer (Lucene core search.Rescorer / QueryRescorer; absent
from the reference): two-phase retrieval — a cheap first-pass query
selects top-N candidates, an expensive second query rescores ONLY that
candidate set, and the final score combines both:

    combined = first_pass_score + weight * second_score   (matches)
    combined = first_pass_score                           (no match)

exactly QueryRescorer.combine(firstPassScore, secondPassMatches,
secondPassScore) with the fixed weight.  The Spark shape: the first
pass is the normal top-N TakeOrdered; the candidate list (tiny,
broadcast) LEFT-joins the second query's score frame.  The second
scorer still plans over its own term-pruned postings scan (phrase
conjunctions already restrict it to docs containing all phrase terms);
the join bounds the OUTPUT to candidates.  At extreme scale, restrict
the second pass further by running it against an index filtered to the
candidate id range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rescore(searcher, first_query, second_query, top_n: int = 100,
            weight: float = 1.0, k: int = 10) -> DataFrame:
    """Two-phase top-k: rerank the first pass's top-N with the second
    query.  Returns (doc_id, score) with the combined score, ordered
    (score desc, doc_id asc), limited to k."""
    from .parser import parse_query

    if isinstance(first_query, str):
        first_query = parse_query(first_query)
    if isinstance(second_query, str):
        second_query = parse_query(second_query)
    first = (
        searcher.score_frame(first_query)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_n)
        .select("doc_id", F.col("score").alias("first_score"))
    )
    second = searcher.score_frame(second_query).select(
        "doc_id", F.col("score").alias("second_score")
    )
    combined = (
        first.join(second, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("first_score")
                + F.lit(float(weight)) * F.coalesce("second_score", F.lit(0.0))
            ).alias("score"),
        )
    )
    return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
