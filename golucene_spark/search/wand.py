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
           pruned blocks is provably below theta (a doc with true score
           >= theta therefore appears in >= 1 surviving block, so the
           surviving-block doc set is a superset of the true top-k).

Decode pruning is real in BOTH phases: candidate docs are rescored
from only the blocks whose doc-id range can contain a candidate — a
bucket equi-join on ``doc_id div G`` between candidate buckets and
block [first_doc, last_doc] spans (the skip-list Advance() role,
set-oriented) — never from a full explode of the query terms' postings.

Results are identical to exhaustive scoring (pruning only discards
provably sub-threshold docs); tests assert equality and that decoded
blocks < total blocks on skewed corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ast import BooleanQuery, Occur, TermQuery
from .executor import Searcher

# doc-range bucket granularity for the block/candidate join: one bucket
# per 128-doc block span (doc ids are dense within a segment), so a
# block maps to ~1 bucket and candidate buckets stay broadcast-sized
BUCKET = 128


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


def _blocks_for_candidates(term_blocks: DataFrame, cand_docs: DataFrame) -> DataFrame:
    """Blocks whose doc-id range can contain a candidate doc: equi-join
    on doc-range buckets (block spans few buckets; candidates broadcast-
    sized by construction).  Exact superset of the needed blocks."""
    cand_b = cand_docs.select(
        F.expr(f"doc_id div {BUCKET}").alias("bkt")
    ).distinct()
    spanned = term_blocks.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"block_first_doc div {BUCKET}"),
                F.expr(f"block_last_doc div {BUCKET}"),
            )
        ),
    )
    return spanned.join(F.broadcast(cand_b), "bkt", "left_semi").select(
        "term", "segment_id", "block_id"
    ).distinct()


def _rescore_candidates(
    searcher: Searcher,
    field: str,
    weights: dict[str, float],
    avgdl: float,
    term_blocks: DataFrame,
    cand_docs: DataFrame,
    stats_out: dict | None = None,
    stats_key: str = "blocks_decoded",
) -> DataFrame:
    """Exact (doc_id, score) for the candidate docs, decoding ONLY the
    blocks that can contain them.  Mirrors _flat_terms_frame arithmetic
    (same score_col expression + groupBy-sum)."""
    index = searcher.index
    needed = _blocks_for_candidates(term_blocks, cand_docs)
    if stats_out is not None:
        stats_out[stats_key] = needed.count()
    p = term_blocks.join(needed, ["term", "segment_id", "block_id"], "left_semi")
    flat = p.select(
        "segment_id", "term",
        F.explode(F.arrays_zip("doc_ids", "freqs", "dlqs", "norm_bytes")).alias("e"),
    ).select(
        "segment_id",
        "term",
        F.col("e.doc_ids").alias("doc_id"),
        F.col("e.freqs").alias("freq"),
        F.col("e.dlqs").alias("dlq"),
        F.col("e.norm_bytes").alias("norm_byte"),
    )
    if getattr(index, "_tombstones", None) is not None:
        from ..index.deletes import filter_live

        flat = filter_live(flat, index._tombstones)
    flat = flat.drop("segment_id")
    # plain semi-join: AQE broadcasts when the candidate set is small;
    # at scale a huge candidate set must not be forced driver-side
    flat = flat.join(cand_docs, "doc_id", "left_semi")
    idf_map = F.create_map(*[x for kk, v in weights.items() for x in (F.lit(kk), F.lit(v))])
    norm_col = F.col("norm_byte") if getattr(index, "quantized", True) else None
    score = searcher.sim.score_col(
        F.col("freq").cast("double"), F.col("dlq"), norm_col,
        F.element_at(idf_map, F.col("term")), avgdl, 1.0,
    )
    per_term = flat.select("doc_id", score.alias("score"))
    return per_term.groupBy("doc_id").agg(F.sum("score").alias("score"))


def wand_topk(searcher: Searcher, query, k: int = 10,
              stats_out: dict | None = None) -> DataFrame:
    """Exact top-k with block-max pruning; falls back to the exhaustive
    plan for query shapes without a pruning path.  ``stats_out``: when a
    dict is passed, decode-work counters are recorded in it
    (blocks_total / blocks_decoded_seed / blocks_surviving /
    blocks_decoded_rescore)."""
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

    # per-term folded weight: idf * boost * (k1+1) — the score_col's w
    weights = {}
    for t in tqs:
        st = stats[(field, t.term)]
        if st.df > 0:
            weights[t.term] = searcher.sim.idf(st.df, cs["max_doc"]) * t.boost
    if not weights:
        return searcher.search(q, k)
    terms = list(weights)

    wmap = F.create_map(
        *[x for kk, v in weights.items() for x in (F.lit(kk), F.lit(v * (k1 + 1.0)))]
    )
    mf = F.col("block_max_freq").cast("double")
    ub_col = (
        F.element_at(wmap, F.col("term"))
        * mf
        / (mf + k1 * (1.0 - b + b * F.col("block_min_dlq") / avgdl))
    )
    term_blocks = (
        index.postings_frame(field, terms)
        if hasattr(index, "postings_frame")
        else index.postings.filter((F.col("field") == field) & F.col("term").isin(terms))
    )
    # metadata-only frame, consulted by several small driver jobs
    # (per-term max ub, seed-block pick, surviving filter): cache it so
    # the postings parquet is read once for metadata
    blocks = term_blocks.select(
        "term", "segment_id", "block_id", "block_len",
        "block_first_doc", "block_last_doc", ub_col.alias("ub"),
    ).persist()
    if stats_out is not None:
        stats_out["blocks_total"] = blocks.count()
    try:
        return _wand_phases(searcher, q, k, field, weights, avgdl,
                            term_blocks, blocks, stats_out)
    finally:
        blocks.unpersist()


def _wand_phases(searcher, q, k, field, weights, avgdl, term_blocks, blocks,
                 stats_out) -> DataFrame:
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
        term_blocks.filter(pick_cond)
        .select(F.explode("doc_ids").alias("doc_id"))
        .distinct()
    )
    seed_scores = _rescore_candidates(
        searcher, field, weights, avgdl, term_blocks, seed_docs,
        stats_out, "blocks_decoded_seed",
    )
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
    if stats_out is not None:
        stats_out["blocks_surviving"] = surviving.count()
    cand_docs = (
        term_blocks.join(
            surviving.select("term", "segment_id", "block_id"),
            ["term", "segment_id", "block_id"],
            "left_semi",
        )
        .select(F.explode("doc_ids").alias("doc_id"))
        .distinct()
    )
    rescored = _rescore_candidates(
        searcher, field, weights, avgdl, term_blocks, cand_docs,
        stats_out, "blocks_decoded_rescore",
    )
    out = (
        rescored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )
    # materialize before the caller's unpersist of the metadata cache
    rows = out.collect()
    return searcher.index.spark.createDataFrame(rows, out.schema)
