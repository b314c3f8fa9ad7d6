"""Result grouping: top groups with top docs per group (the Lucene
grouping module's two-pass TermFirstPassGroupingCollector /
TermSecondPassGroupingCollector, not ported by the reference).

Groups are ranked by their best doc's score (groupSort=relevance, the
module default), docs within a group by (score desc, docID asc).
Spark shape: the scored match frame joins doc_meta for the group key;
one window ranks docs within groups, a tiny groupBy ranks the groups;
the group top-k is a semi-join — no driver-side loop, and the heavy
frame is shuffled once on the group key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_search(searcher, query, group_field: str, k_groups: int = 10,
                 k_per_group: int = 3) -> DataFrame:
    """-> (group, group_max_score, doc_id, score, rnk) for the top
    ``k_groups`` groups, at most ``k_per_group`` docs each, ordered by
    (group_max_score desc, group asc, rnk asc)."""
    if isinstance(query, str):
        from .parser import parse_query

        query = parse_query(query)
    if not hasattr(searcher.index, "doc_meta"):
        from .facets import field_postings

        meta = field_postings(searcher.index, group_field).withColumnRenamed(
            "term", group_field
        )
    else:
        ix = searcher.index
        meta = (ix.live_doc_meta() if hasattr(ix, "live_doc_meta") else ix.doc_meta
                ).select("doc_id", group_field)
    scored = searcher.score_frame(query).join(meta, "doc_id")
    g = F.col(group_field)
    w_doc = Window.partitionBy(g).orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rnk", F.row_number().over(w_doc)).filter(
        F.col("rnk") <= k_per_group
    )
    top_groups = (
        scored.groupBy(g.alias("group"))
        .agg(F.max("score").alias("group_max_score"))
        .orderBy(F.desc("group_max_score"), F.asc("group"))
        .limit(k_groups)
    )
    return (
        ranked.join(top_groups, ranked[group_field] == top_groups["group"])
        .select(
            "group", "group_max_score", "doc_id", "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy(F.desc("group_max_score"), F.asc("group"), F.asc("rnk"))
    )
