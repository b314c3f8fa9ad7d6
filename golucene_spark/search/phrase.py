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


def _flat_rows_adj(col, term_offset: int, n_rows: int):
    """Column of packed little-endian int32 position blobs ->
    (rows, adjusted positions) int64 arrays, one frombuffer over the
    concatenated blobs — no per-position Python work."""
    bufs = [bytes(b) if b is not None else b"" for b in col]
    lens = np.fromiter((len(b) >> 2 for b in bufs), dtype=np.int64, count=n_rows)
    flat = np.frombuffer(b"".join(bufs), dtype="<i4").astype(np.int64)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    return rows, flat - term_offset


def _flat_positions(col, term_offset: int, n_rows: int):
    """As above but packed into sorted int64 keys (row << 32) + adj,
    invalid (negative) shifts dropped."""
    rows, adj = _flat_rows_adj(col, term_offset, n_rows)
    if term_offset:
        valid = adj >= 0
        rows, adj = rows[valid], adj[valid]
    return (rows << 32) + adj


def _sloppy_offset_vectors(n_terms: int, slop: int, in_order: bool = False):
    """All offset vectors d = (d_1..d_{n-1}), d_i in [-slop, slop], whose
    spread over (0, d_1, ..) is <= slop, with their 1/(1+spread) weight.
    Each alignment tuple of positions maps to exactly ONE vector
    (d_i = adj_i - adj_0), so summing counts over vectors never
    double-counts.

    ``in_order=True`` keeps only vectors whose ACTUAL positions are
    strictly increasing in term order (pos_{i+1} > pos_i, i.e. the
    non-decreasing-d condition with d_0 = 0) — the ordered
    SpanNearQuery of Lucene's spans module."""
    from itertools import product

    out = []
    for d in product(range(-slop, slop + 1), repeat=n_terms - 1):
        spread = max((0,) + d) - min((0,) + d)
        if spread > slop:
            continue
        if in_order:
            full = (0,) + d
            if any(full[i + 1] < full[i] for i in range(len(full) - 1)):
                continue
        out.append((d, 1.0 / (1.0 + spread)))
    return out


def phrase_freq_frame(index, field: str, terms: list[str], slop: int = 0,
                      in_order: bool = False) -> DataFrame:
    """(doc_id, freq, dlq, norm_byte) for docs matching the phrase.

    slop=0: exact adjacency (Lucene ExactPhraseScorer semantics) —
    integer freq = number of start positions where every term_i sits at
    p+i.

    slop>0: set-oriented sloppy frequency — every alignment tuple (one
    position per term) whose offset-adjusted spread is <= slop
    contributes sloppyFreq = 1/(1 + spread) (similarities.go's
    1/(distance+1)); a deterministic order-independent analogue of
    Lucene's greedy SloppyPhraseScorer (the reference has no phrase
    scorer at all: queryParser.go:58 panics).  Vectorized as one
    intersect1d per offset vector over the whole Arrow batch — at most
    (2*slop+1)^(n_terms-1) intersections, no per-doc Python loop."""
    if slop or in_order:
        return _sloppy_freq_frame(index, field, terms, slop, in_order)
    return _exact_freq_frame(index, field, terms)


def _conjunction_base(index, field: str, terms: list[str]):
    base = None
    for i, t in enumerate(terms):
        p = index.postings_for_terms(field, [t], with_positions=True).select(
            F.col("doc_id"),
            F.col("positions").alias(f"pos{i}"),
            *( [F.col("dlq"), F.col("norm_byte")] if i == 0 else [] ),
        )
        base = p if base is None else base.join(p, "doc_id")
    return base


def _sloppy_freq_frame(index, field: str, terms: list[str], slop: int,
                       in_order: bool = False) -> DataFrame:
    base = _conjunction_base(index, field, terms)
    n = len(terms)
    combos = _sloppy_offset_vectors(n, slop, in_order)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("freq", T.DoubleType()),
            T.StructField("dlq", T.DoubleType()),
            T.StructField("norm_byte", T.IntegerType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            flats = [_flat_rows_adj(pdf[f"pos{i}"], i, m) for i in range(n)]
            keys0 = (flats[0][0] << 32) + flats[0][1]
            freqs = np.zeros(m, dtype=np.float64)
            for d, w in combos:
                match = keys0
                for i in range(1, n):
                    if match.size == 0:
                        break
                    rows_i, adj_i = flats[i]
                    shifted = adj_i - d[i - 1]
                    valid = shifted >= 0
                    keys_i = (rows_i[valid] << 32) + shifted[valid]
                    match = np.intersect1d(match, keys_i, assume_unique=True)
                if match.size:
                    freqs += w * np.bincount(
                        (match >> 32).astype(np.int64), minlength=m
                    ).astype(np.float64)
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


def _exact_freq_frame(index, field: str, terms: list[str]) -> DataFrame:
    """(doc_id, freq, dlq, norm_byte) for docs matching the exact phrase."""
    base = _conjunction_base(index, field, terms)
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


def positions_array_col(col="positions"):
    """JVM-side decode of a packed little-endian int32 position blob to
    array<int> — hex/conv per 4-byte slice inside whole-stage codegen,
    no Python round-trip."""
    return F.expr(
        f"transform(sequence(1, int(length({col}) / 4)), i -> "
        f"cast(conv(concat(hex(substring({col}, i*4, 1)), "
        f"hex(substring({col}, i*4-1, 1)), "
        f"hex(substring({col}, i*4-2, 1)), "
        f"hex(substring({col}, i*4-3, 1))), 16, 10) as int))"
    )


def span_first_search(searcher, field: str, term: str, end: int,
                      k: int = 10) -> DataFrame:
    """SpanFirstQuery (Lucene spans module): the term must occur within
    the first ``end`` positions of the field; the doc is scored by the
    similarity with freq = number of qualifying positions.  Pure
    Catalyst: positions decode JVM-side (positions_array_col) and the
    qualifying freq is a size(filter(...)) over the array — no
    Python."""
    from .ast import TermQuery

    s = searcher
    q = TermQuery(field, term)
    stats = s._term_stats(q)
    st = stats[(field, term)]
    if st.df == 0:
        from .executor import RESULT_SCHEMA

        return s.index.spark.createDataFrame([], RESULT_SCHEMA)
    cs = s._collection_stats(field)
    idf = s.sim.idf(st.df, cs["max_doc"])
    avgdl = s.sim.avgdl(cs["sum_ttf"], cs["max_doc"])
    p = s.index.postings_for_terms(field, [term], with_positions=True)
    pos = positions_array_col()
    qfreq = F.size(F.filter(pos, lambda x: x < F.lit(end)))
    kwargs = (
        {"query_norm": s.sim.query_norm(s._sum_sq(q, stats))}
        if s.sim.uses_coord
        else {}
    )
    norm_col = F.col("norm_byte") if getattr(s.index, "quantized", True) else None
    score = s.sim.score_col(
        qfreq.cast("double"), F.col("dlq"), norm_col, idf, avgdl, 1.0, **kwargs
    )
    return (
        p.withColumn("_qf", qfreq)
        .filter(F.col("_qf") > 0)
        .select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def span_near_search(searcher, field: str, terms: list[str], slop: int = 0,
                     k: int = 10) -> DataFrame:
    """Ordered SpanNearQuery (Lucene spans module; inOrder=true): terms
    must appear in order, alignments with total displacement <= slop
    contribute 1/(1+spread) to the sloppy frequency.  Same conjunction
    + whole-batch vectorized machinery as the phrase scorer."""
    from .ast import PhraseQuery as PQ

    return searcher.search(PQ(field, tuple(terms), 1.0, slop, True), k)


def phrase_search(searcher, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """Top-k BM25/classic scoring of an exact phrase (the PhraseQuery
    path through the Searcher — same stats/weights machinery as every
    other query)."""
    from .executor import RESULT_SCHEMA

    terms = list(terms)
    if not terms:
        return searcher.index.spark.createDataFrame([], RESULT_SCHEMA)
    return searcher.search(PhraseQuery(field, tuple(terms)), k)
