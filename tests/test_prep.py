"""Training-corpus prep operators: chunking, scrubbing, hash splits."""

import pytest

from golucene_spark.text.prep import chunk_documents, hash_split, scrub_text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(10))),      # 10 tokens
        (1, "only three tokens"),
        (2, ""),                                        # no chunks
        (3, "dup dup dup"),
        (4, "dup dup dup"),                             # exact dup of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_overlap_and_tail(docs):
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"])
        for r in out.collect()
    }
    # stride 2 over 10 tokens: starts 0,2,4,6,8
    assert got[(0, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(0, 1)] == ("t2 t3 t4 t5", 4)       # 2-token overlap carried
    assert got[(0, 4)] == ("t8 t9", 2)             # short tail window
    assert got[(1, 0)] == ("only three tokens", 3)
    assert not any(d == 2 for d, _ in got)          # empty doc -> no chunks


def test_scrub_removes_urls_and_emails(spark):
    df = spark.createDataFrame(
        [(0, "go to https://x.io/a?b=1 or mail a.b+c@d-e.org   now")],
        "doc_id long, text string",
    )
    assert scrub_text(df).collect()[0]["scrubbed"] == "go to or mail now"


def test_hash_split_deterministic_and_dup_consistent(docs):
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
    assert a == b                      # stable across runs
    assert a[3] == a[4]                # exact dups share a split
    assert all(0 <= v[0] < 100 for v in a.values())
    assert all(v[1] in ("train", "val", "test") for v in a.values())


def test_stratified_sample_nested_and_deterministic(spark):
    from golucene_spark.text.prep import stratified_sample

    rows = [(i, f"text number {i}", "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    small = {r["doc_id"] for r in stratified_sample(df, {"a": 0.2}).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, {"a": 0.6}).collect()}
    assert small and small <= big            # nested samples: rate up only grows
    assert all(i % 2 == 0 for i in big)      # stratum b dropped (rate 0)
    again = {r["doc_id"] for r in stratified_sample(df, {"a": 0.2}).collect()}
    assert again == small                    # content-hash: stable across runs


def test_ngram_overlap_decontamination(spark):
    from golucene_spark.text.prep import ngram_overlap

    corpus = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),       # contains the probe 8-gram
            (1, "a b c d e f g X i j"),       # one token off -> no 8-gram match
            (2, "z " * 10),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "a b c d e f g h")], "probe_id long, text string"
    )
    got = {(r["doc_id"], r["probe_id"]): r["n_shared"]
           for r in ngram_overlap(corpus, probes, n=8).collect()}
    assert got == {(0, 100): 1}


def test_assign_shards_packing(spark):
    from golucene_spark.text.prep import assign_shards

    rows = [("train", 0, i, 60) for i in range(5)] + [("val", 1, 0, 10)]
    df = spark.createDataFrame(rows, "split string, doc_id long, chunk_id long, n_tokens long")
    got = {(r["split"], r["doc_id"], r["chunk_id"]): r["shard_id"]
           for r in assign_shards(df, shard_tokens=100).collect()}
    # exclusive running totals 0,60,120,180,240 -> shards 0,0,1,1,2
    assert [got[("train", 0, i)] for i in range(5)] == [0, 0, 1, 1, 2]
    assert got[("val", 1, 0)] == 0           # splits pack independently
    again = {(r["split"], r["doc_id"], r["chunk_id"]): r["shard_id"]
             for r in assign_shards(df, shard_tokens=100).collect()}
    assert again == got                       # deterministic


def test_cap_per_group_nested_deterministic(spark):
    from golucene_spark.text.prep import cap_per_group

    rows = [(i, f"txt {i}", "g" + str(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    small = {r["doc_id"] for r in cap_per_group(df, max_docs=5).collect()}
    big = {r["doc_id"] for r in cap_per_group(df, max_docs=12).collect()}
    assert len(small) == 10 and len(big) == 24
    assert small <= big                  # raising the cap only adds docs
    again = {r["doc_id"] for r in cap_per_group(df, max_docs=5).collect()}
    assert again == small                # content-hash lottery is stable


def test_extract_urls_canonicalization(spark):
    from golucene_spark.text.prep import extract_urls

    rows = [
        (0, "see https://EXample.com:443/Path/?utm_source=x&id=7#frag end"),
        (1, "plain http://Host.org:80/a/ and http://host.org/a"),
        (2, "no urls here"),
        (3, "https://site.io/?utm_campaign=z&fbclid=abc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by = {}
    for r in extract_urls(df).collect():
        by.setdefault(r["doc_id"], []).append(r["canonical"])
    assert by[0] == ["https://example.com/Path/?id=7"]
    # default-port + trailing-slash variants collapse to one key
    assert sorted(by[1]) == ["http://host.org/a", "http://host.org/a"]
    assert 2 not in by
    assert by[3] == ["https://site.io"]


def test_canonical_urls_are_idempotent(spark):
    """Canonicalizing an already-canonical URL is a no-op — the dedup
    key is a fixed point of the chain."""
    from golucene_spark.text.prep import extract_urls

    rows = [
        (0, "x https://EXample.com:443/Path/?utm_source=x&id=7#frag y"),
        (1, "http://Host.org:80/a/ http://host.org/a?ref=z"),
        (2, "https://site.io/?utm_campaign=z&fbclid=abc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    first = extract_urls(df).select("doc_id", "canonical").collect()
    redo = spark.createDataFrame(
        [(r["doc_id"], r["canonical"]) for r in first], "doc_id long, text string"
    )
    second = {(r["doc_id"], r["url"]): r["canonical"]
              for r in extract_urls(redo, text_col="text").collect()}
    for r in first:
        assert second[(r["doc_id"], r["canonical"])] == r["canonical"]
