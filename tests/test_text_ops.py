"""Training-data pipeline operators: dedup, minhash-LSH, simhash,
jaccard, quality, language-id, fingerprint, ANN."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from golucene_spark.text import (
    cosine_topk,
    doc_fingerprint,
    exact_dups,
    language_id,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    token_quality,
)
from golucene_spark.text.ann import add_lsh_bucket
from golucene_spark.text.dedup import simhash_hamming_pairs

BASE = (
    "spark builds an inverted index over source code with posting lists "
    "and block max metadata for fast scoring of boolean queries"
)
NEAR = BASE.replace("fast", "rapid")  # one token changed
OTHER = "completely different content about cooking recipes and baking bread with yeast flour water salt"


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, OTHER), (4, "tiny doc"), (5, None)]
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(2)


def test_exact_dups(text_df):
    groups = exact_dups(text_df).collect()
    assert len(groups) == 1
    assert groups[0]["n"] == 2 and groups[0]["doc_ids"] == [0, 1]


def test_ngram_jaccard_hand(spark, text_df):
    pairs = spark.createDataFrame([(0, 2), (0, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(text_df, pairs).collect()}
    # BASE has 21 tokens -> 19 distinct 3-shingles; changing one interior
    # token invalidates 3 shingles each side -> inter=16, union=22
    assert got[(0, 2)] == pytest.approx(16 / 22, rel=1e-12)
    assert got[(0, 3)] == 0.0


def test_minhash_lsh_finds_near_dup(text_df):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(text_df, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup caught by LSH
    assert not any(3 in p for p in pairs)      # unrelated not paired


def test_simhash(text_df):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(text_df).collect()}
    assert sh[0] == sh[1]
    ham02 = bin((sh[0] ^ sh[2]) & ((1 << 64) - 1)).count("1")
    ham03 = bin((sh[0] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    assert ham02 < ham03
    cand = simhash_hamming_pairs(simhash64(text_df), max_dist=ham02).collect()
    assert any({r["id_a"], r["id_b"]} == {0, 2} for r in cand)


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is warm"),
            (1, "der hund ist nicht auf die couch und das ist gut"),
            (2, "xqz zzz qqq"),
        ],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in token_quality(df).collect()}
    assert q[0]["n_tokens"] == 10
    assert q[0]["stop_ratio"] == pytest.approx(7 / 10)
    assert 0.0 <= q[2]["quality"] <= 1.0

    l = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert l[0] == "en" and l[1] == "de" and l[2] == "unknown"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World! Foo"), (1, "hello world FOO"), (2, "hello world bar")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert fp[0] == fp[1] != fp[2]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_topk_vs_numpy(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = sorted(
        ((float(q @ v / (np.linalg.norm(v) * np.linalg.norm(q))), i)
         for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = cosine_topk(emb, q.tolist(), 10, exclude_id=0).collect()
    assert [r["vec_id"] for r in got] == [i for _, i in sims]
    for r, (s, _) in zip(got, sims):
        assert r["cosine"] == pytest.approx(s, rel=1e-9)


def test_lsh_cosine_recall_planted(spark):
    # planted-neighbor design: 20 noisy copies of q among 480 random
    # vectors; LSH bucketing must recover the planted top-10
    rng = np.random.default_rng(7)
    dim = 32
    q = rng.standard_normal(dim)
    rows = []
    for i in range(1, 21):
        rows.append((i, (q + 0.05 * rng.standard_normal(dim)).tolist()))
    for i in range(21, 501):
        rows.append((i, rng.standard_normal(dim).tolist()))
    rows.append((0, q.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bucketed = add_lsh_bucket(df, dim, n_bits=16).cache()
    exact = [r["vec_id"] for r in cosine_topk(df, q.tolist(), 10, exclude_id=0).collect()]
    approx = [r["vec_id"] for r in
              lsh_cosine_topk(bucketed, q.tolist(), 10, n_bits=16, max_hamming=3, exclude_id=0).collect()]
    assert set(exact) <= set(range(1, 21))  # sanity: exact top-10 is planted
    assert len(set(exact) & set(approx)) >= 8


def test_dedup_groups_connected_components(spark):
    from golucene_spark.text.dedup import dedup_groups

    # chain 1-2-3, pair 10-11, chain 20-21-22-23 (long diameter)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_dedup_groups_from_minhash(spark, text_df):
    from golucene_spark.text import minhash_lsh_pairs
    from golucene_spark.text.dedup import dedup_groups

    pairs = minhash_lsh_pairs(text_df, threshold=0.5).select("id_a", "id_b")
    groups = {r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()}
    # docs 0,1 exact dups; 2 near-dup of both -> one component rooted at 0
    assert groups[0] == groups[1] == groups[2] == 0


def test_lsh_bucket_partition_pruning(spark, tmp_path_factory):
    """lsh_cosine_topk's driver-enumerated probe set must prune a
    bucket-partitioned table's partitions (no full scan)."""
    rng = np.random.default_rng(7)
    V = rng.standard_normal((300, 16))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    from golucene_spark.text.ann import lsh_cosine_topk, probe_buckets

    bucketed = add_lsh_bucket(emb, dim=16, n_bits=8)
    path = str(tmp_path_factory.mktemp("lshp")) + "/emb"
    bucketed.write.partitionBy("lsh_bucket").parquet(path)
    table = spark.read.parquet(path)
    qv = [float(x) for x in V[0]]
    out = lsh_cosine_topk(table, qv, k=5, n_bits=8, max_hamming=1, exclude_id=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partition pruning realized: the scan carries PartitionFilters on
    # lsh_bucket (an IN-list), not a post-scan bit_count filter
    assert "PartitionFilters" in plan and "lsh_bucket" in plan
    rows = out.collect()
    # equals brute force restricted to the probed buckets
    probes = set(probe_buckets(
        int(add_lsh_bucket(emb.filter(F.col("vec_id") == 0), 16, 8)
            .select("lsh_bucket").first()[0]), 8, 1))
    cand = bucketed.filter(F.col("lsh_bucket").isin(list(probes)))
    brute = cosine_topk(cand, qv, k=5, exclude_id=0).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in rows] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in brute
    ]


def test_cosine_pairs_lsh_matches_brute_on_clusters(spark):
    """Banded-LSH near-dup equals brute force on cluster-structured
    embeddings (tight clusters -> identical sign bits -> full recall)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, 32)) * 3
    rows = []
    vid = 0
    for c in range(5):
        for _ in range(8):
            v = centers[c] + rng.standard_normal(32) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from golucene_spark.text.ann import cosine_pairs, cosine_pairs_lsh

    brute = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
             for r in cosine_pairs(emb, 0.9).collect()}
    lsh = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
           for r in cosine_pairs_lsh(emb, 0.9, dim=32, n_bands=16, band_bits=3).collect()}
    assert brute == lsh and len(brute) == 5 * (8 * 7 // 2)


def test_ivf_ann(spark, sf_dir):
    import numpy as np
    from golucene_spark.text.ann import (
        add_ivf_cell, cosine_topk, ivf_cosine_topk, ivf_probe_cells, train_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64)
    C = train_ivf(X, n_cells=4, iters=5)
    assert C.shape[1] == X.shape[1]
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)

    qv = [float(x) for x in X[0]]
    celled = add_ivf_cell(emb, C)
    # every vector gets a cell in range; assignment matches NumPy argmax
    cells = {r["vec_id"]: r["ivf_cell"] for r in celled.select("vec_id", "ivf_cell").collect()}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = np.argmax(Xn @ C.T, axis=1)
    got = np.array([cells[i] for i in range(len(X))])
    assert (got == want).mean() > 0.99  # ulp ties only

    # probing ALL cells == exact brute force
    exact = [r["vec_id"] for r in cosine_topk(emb, qv, 5, exclude_id=0).collect()]
    full = [r["vec_id"] for r in
            ivf_cosine_topk(celled, C, qv, 5, nprobe=4, exclude_id=0).collect()]
    assert full == exact
    # nprobe=1 returns a subset of vectors from the probed cell, ranked
    probe1 = ivf_cosine_topk(celled, C, qv, 5, nprobe=1, exclude_id=0).collect()
    top_cell = ivf_probe_cells(qv, C, 1)[0]
    assert all(cells[r["vec_id"]] == top_cell for r in probe1)


def test_quantize_embeddings_roundtrip(spark):
    from golucene_spark.text.ann import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.1, -0.2])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["scale"], r["qvec"]) for r in quantize_embeddings(df).collect()}
    assert got[0][0] == 1.0 and got[0][1] == [64, -127, 32]
    s1, q1 = got[1]
    assert abs(s1 - 0.2) < 1e-6 and q1[2] == -127    # max |x| pins to -127
    assert all(-127 <= v <= 127 for v in q1)


def test_rrf_fuse(spark):
    from golucene_spark.search.hybrid import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(3, 0.9), (1, 0.5)], "doc_id long, score double")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k_rrf=60).collect()}
    assert got[1] == 1 / 61 + 1 / 62      # rank 1 in a, rank 2 in b
    assert got[2] == 1 / 62               # only in a
    assert got[3] == 1 / 63 + 1 / 61
    # ties break by id: equal scores rank ascending by doc_id
    t = spark.createDataFrame([(7, 1.0), (5, 1.0)], "doc_id long, score double")
    tied = {r["doc_id"]: r["rrf"] for r in rrf_fuse([t]).collect()}
    assert tied[5] == 1 / 61 and tied[7] == 1 / 62


def test_repeated_ngram_coverage_interval_union(spark):
    """Overlapping duplicated spans must union, not double-count, and
    same-doc repeats count as duplication."""
    from golucene_spark.text.dedup import repeated_ngram_coverage

    common = "one two three four"  # 4-gram shared by docs 0 and 1
    rows = [
        (0, f"{common} filler0a filler0b"),
        (1, f"prefix1 {common} suffix1"),
        # doc 2 repeats its own 4-gram twice (self-duplication) with
        # overlapping coverage: tokens 'a b c d a b c d'
        (2, "a b c d a b c d"),
        (3, "totally unrelated words here now"),
        (4, "x y"),  # shorter than n: no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in repeated_ngram_coverage(df, n=4, text_col="text").collect()}
    assert out[0]["dup_covered"] == 4 and out[0]["dup_spans"] == 1
    assert out[1]["dup_covered"] == 4
    # doc 2: every 4-gram window of 'a b c d a b c d': starts 0..4;
    # duplicated ones cover the whole 8 tokens
    assert out[2]["dup_covered"] == 8 and out[2]["n_tokens"] == 8
    assert out[2]["dup_frac"] == pytest.approx(1.0)
    assert out[3]["dup_covered"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["dup_spans"] == 0 and out[4]["n_tokens"] == 2


def test_repetition_signals_lines_and_grams(spark):
    from golucene_spark.text.quality import repetition_signals

    rows = [
        (0, "hello world\nhello world\nunique line"),
        (1, "spark spark spark spark"),
        (2, "no repeats at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in repetition_signals(df, text_col="text").collect()}
    # doc 0: 3 lines, 2 identical -> dup_line_frac = 1/3; duplicated
    # line chars = 2*11 over total 2*11+11 = 33
    assert out[0]["n_lines"] == 3
    assert out[0]["dup_line_frac"] == pytest.approx(1 / 3)
    assert out[0]["dup_line_char_frac"] == pytest.approx(22 / 33)
    # doc 1: top 2-gram 'spark spark' occurs 3x, covers 3*10 of 20 chars
    assert out[1]["top2gram_char_frac"] == pytest.approx(30 / 20)
    assert out[2]["dup_line_frac"] == 0.0


def test_pq_encode_and_adc(spark):
    """PQ: JVM encode matches NumPy argmin; ADC distance equals the
    LUT recomputation; approximate top-k overlaps exact L2 top-k."""
    import numpy as np

    from golucene_spark.text.ann import pq_adc_topk, pq_encode, train_pq

    rng = np.random.RandomState(3)
    X = rng.randn(120, 16).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    B = train_pq(X, m=4, k=8, iters=5, seed=42)
    enc = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, B).collect()}
    # NumPy reference encode
    for i in (0, 7, 63):
        want = []
        for s in range(4):
            d2 = ((X[i, s * 4:(s + 1) * 4] - B[s]) ** 2).sum(axis=1)
            want.append(int(np.argmin(d2)))
        assert enc[i] == want, i
    q = X[0]
    top = pq_adc_topk(pq_encode(df, B), B, q, k=10, exclude_id=0).collect()
    for r in top:
        want = sum(
            float(((q[s * 4:(s + 1) * 4] - B[s, enc[r["vec_id"]][s]]) ** 2).sum())
            for s in range(4)
        )
        assert abs(r["adist"] - want) < 1e-9
    # recall sanity: approximate top-10 shares most of the exact top-10
    exact = np.argsort(((X - q) ** 2).sum(axis=1))[1:11]
    approx = {r["vec_id"] for r in top}
    assert len(approx & set(int(x) for x in exact)) >= 5


def test_unigram_logppl_values(spark):
    import math

    from golucene_spark.text.quality import unigram_logppl

    rows = [
        (0, "common common common"),
        (1, "common rare"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in unigram_logppl(df, "text").collect()}
    # corpus: common x4, rare x1, total 5
    p_common, p_rare = 4 / 5, 1 / 5
    assert out[0]["logppl"] == pytest.approx(-math.log(p_common))
    assert out[1]["logppl"] == pytest.approx(
        -(math.log(p_common) + math.log(p_rare)) / 2)
    assert out[2]["n_tokens"] == 0 and out[2]["logppl"] == 0.0
    # the rare-token doc is "more surprising"
    assert out[1]["logppl"] > out[0]["logppl"]
