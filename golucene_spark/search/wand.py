"""Block-max WAND top-k pruning (SURVEY §4 "custom" row).

Lucene 4.10 predates block-max WAND; we add it on top of the Lucene41-
style block layout: each 128-doc posting block carries (block_max_freq,
block_min_dlq), giving a per-block upper bound on any contained doc's
BM25 contribution.  Two-phase exact algorithm:

  phase 0  collect block metadata upper bounds per query term (tiny
           TakeOrdered jobs, never the postings themselves)
  phase 1  true-score the docs of the best blocks of the highest-ub
           term until >= k candidates -> threshold theta = kth true
           score (a valid lower bound of the global kth score, since
           phase-1 docs are a subset)
  phase 2  keep only blocks where ub(term, block) + sum of other
           terms' max ubs >= theta; any doc living exclusively in
           pruned blocks is provably below theta.  Re-score surviving
           candidate docs against FULL postings (semi-join), take top-k.

Results are identical to exhaustive scoring (pruning only discards
provably sub-threshold docs); tests assert equality.  The win at scale:
phase 2 decodes only surviving blocks of a scan that is otherwise
proportional to the hottest term's df.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .ast import BooleanQuery, Occur, TermQuery
from .executor import Searcher


def _flat_should_terms(query) -> list[TermQuery] | None:
    """Extract [TermQuery...] when the query is a single term or a flat
    pure-SHOULD same-field OR; else None (caller falls back)."""
    if isinstance(query, TermQuery):
        return [query]
    if isinstance(query, BooleanQuery) and query.clauses:
        tqs = []
        for c in query.clauses:
            if c.occur is not Occur.SHOULD or not isinstance(c.query, TermQuery):
                return None
            tqs.append(c.query)
        if len({t.field for t in tqs}) == 1 and len({t.term for t in tqs}) == len(tqs):
            return tqs
    return None


def wand_topk(searcher: Searcher, query, k: int = 10) -> DataFrame:
    """Exact top-k with block-max pruning; falls back to the exhaustive
    plan for query shapes without a pruning path."""
    q = query.rewrite() if hasattr(query, "rewrite") else query
    tqs = _flat_should_terms(q)
    index = searcher.index
    if tqs is None or searcher.sim.name != "bm25" or not hasattr(index, "postings"):
        return searcher.search(q, k)

    field = tqs[0].field
    stats = searcher._term_stats(q)
    cs = searcher._collection_stats(field)
    avgdl = searcher.sim.avgdl(cs["sum_ttf"], cs["max_doc"])
    k1, b = searcher.sim.k1, searcher.sim.b

    weights = {}
    for t in tqs:
        st = stats[(field, t.term)]
        if st.df > 0:
            weights[t.term] = searcher.sim.idf(st.df, cs["max_doc"]) * t.boost * (k1 + 1.0)
    if not weights:
        return searcher.search(q, k)
    terms = list(weights)

    wmap = F.create_map(*[x for kk, v in weights.items() for x in (F.lit(kk), F.lit(v))])
    mf = F.col("block_max_freq").cast("double")
    ub_col = (
        F.element_at(wmap, F.col("term"))
        * mf
        / (mf + k1 * (1.0 - b + b * F.col("block_min_dlq") / avgdl))
    )
    blocks = index.postings.filter(
        (F.col("field") == field) & F.col("term").isin(terms)
    ).select("term", "segment_id", "block_id", "block_len", ub_col.alias("ub"))

    # per-term global max ub (tiny agg)
    max_ub = {
        r["term"]: r["mu"]
        for r in blocks.groupBy("term").agg(F.max("ub").alias("mu")).collect()
    }
    total_ub = sum(max_ub.values())

    # phase 1: enough best blocks (by ub) to cover >= k docs
    need, picked = k, []
    for r in blocks.orderBy(F.desc("ub")).limit(max(4, 2 * k // 128 + 2)).collect():
        picked.append((r["term"], r["segment_id"], r["block_id"]))
        need -= r["block_len"]
        if need <= 0:
            break
    if not picked:
        return searcher.search(q, k)
    pick_cond = None
    for t, s, bid in picked:
        c = (F.col("term") == t) & (F.col("segment_id") == s) & (F.col("block_id") == bid)
        pick_cond = c if pick_cond is None else (pick_cond | c)
    seed_docs = (
        index.postings.filter((F.col("field") == field) & F.col("term").isin(terms))
        .filter(pick_cond)
        .select(F.explode("doc_ids").alias("doc_id"))
        .distinct()
    )
    full = searcher.score_frame(q)
    seed_scores = full.join(F.broadcast(seed_docs), "doc_id")
    seed_topk = seed_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    if len(seed_topk) < k:
        # fewer than k matches exist anywhere near the top blocks: just
        # run exhaustive (cheap corpus)
        return searcher.search(q, k)
    theta = seed_topk[-1]["score"]

    # phase 2: blocks that could still beat theta
    surviving = blocks.withColumn(
        "slack", F.col("ub") + F.lit(total_ub) - F.element_at(
            F.create_map(*[x for kk, v in max_ub.items() for x in (F.lit(kk), F.lit(v))]),
            F.col("term"),
        )
    ).filter(F.col("slack") >= theta)
    cand_docs = (
        index.postings.filter((F.col("field") == field) & F.col("term").isin(terms))
        .join(
            surviving.select("term", "segment_id", "block_id"),
            ["term", "segment_id", "block_id"],
            "left_semi",
        )
        .select(F.explode("doc_ids").alias("doc_id"))
        .distinct()
    )
    rescored = full.join(cand_docs, "doc_id")
    return (
        rescored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )
