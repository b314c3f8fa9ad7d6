"""Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
of heterogeneous rankings — the standard way to combine lexical BM25
with dense-vector ANN without score calibration.

fused(doc) = sum over systems of 1 / (k + rank_system(doc)), rank from
1 on each system's own (score desc, id asc) order.  Rank-based, so the
systems' score scales never need normalizing — exactly why hybrid
search engines default to RRF.

Scale shape: inputs are already top-N candidate lists (constant-sized),
so the global row_number windows sort N rows, not the corpus; the
fusion is one tiny groupBy."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(id_col, rrf) over the union of the input rankings; each input
    is an (id, score) frame (a top-N candidate list)."""
    parts = []
    for r in rankings:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(
            r.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(float(k_rrf)) + F.row_number().over(w))).alias("_c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(F.sum("_c").alias("rrf"))
