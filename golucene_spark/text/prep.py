"""Training-data preparation operators: chunking, scrubbing, splits.

The standard LLM-corpus prep stages a 100-TB pipeline runs between
dedup/quality (text/dedup.py, text/quality.py) and tokenization — all
pure Catalyst (JVM regex/array ops, no Python in the loop), each with
an exact DuckDB twin in the driver gate.

- ``chunk_documents``: whitespace-token windows of ``chunk_tokens``
  with ``overlap`` carried between consecutive chunks (posexplode of a
  stride sequence + ``slice`` — one narrow transform, no shuffle).
- ``scrub_text``: URL / e-mail removal + whitespace collapse — the
  deterministic PII-lite scrub (RE2 patterns shared verbatim with the
  SQL twin).
- ``hash_split``: deterministic content-hash bucketing into
  train/val/test — md5-prefix mod 100, so the assignment is stable
  across runs, engines, and partitionings (never rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, chunk, n_tokens): whitespace-token windows of
    ``chunk_tokens`` starting every ``chunk_tokens - overlap`` tokens;
    the final window may be shorter.  Narrow plan: tokenize, explode
    the stride starts, slice — no shuffle, scales with input splits."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
    return (
        t.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.array_join(F.slice("toks", F.col("start") + 1, chunk_tokens), " ").alias("chunk"),
            F.least(F.lit(chunk_tokens), F.size("toks") - F.col("start"))
            .cast("long")
            .alias("n_tokens"),
        )
    )


def scrub_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, scrubbed): URLs and e-mail addresses removed, runs of
    whitespace collapsed to one space, ends trimmed."""
    s = F.col(text_col)
    s = F.regexp_replace(s, URL_RE, "")
    s = F.regexp_replace(s, EMAIL_RE, "")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return docs.select(F.col(id_col).alias("doc_id"), s.alias("scrubbed"))


def assign_shards(
    chunks: DataFrame,
    shard_tokens: int = 1 << 20,
    order_cols: tuple = ("doc_id", "chunk_id"),
    split_col: str | None = "split",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic shard assignment for training-data export: within
    each split, chunks in ``order_cols`` order pack greedily into
    shards of ~``shard_tokens`` tokens — shard_id = floor(exclusive
    running token total / shard_tokens).  One window per split; the
    downstream writer partitions by (split, shard_id) so every shard is
    one file of bounded size.  Fully order-determined: re-running on
    the same input reproduces the same shards byte-for-byte."""
    parts = [split_col] if split_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return chunks.withColumn(
        "shard_id", F.floor(running / shard_tokens).cast("long")
    )


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    max_docs: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quota capping (the per-domain cap of pretraining
    pipelines): keep at most ``max_docs`` docs per ``group_col``,
    chosen deterministically by (md5(text), doc_id) order — a stable
    content-hash lottery, so re-runs and re-partitionings keep the
    SAME winners and growing the quota only ADDS docs (nested, like
    stratified_sample)."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(text_col)), F.col(id_col)
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs)
        .drop("_rn")
    )


def ngram_overlap(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3-style n-gram overlap
    check): (doc_id, probe_id, n_shared) for every corpus doc sharing
    at least one whitespace-token n-gram with a probe document.
    Shingles are md5-hashed before the join so the shuffle carries
    32-byte keys, not text; the probe side is the small one and
    broadcasts under AQE.  A doc with n_shared > 0 is contaminated
    and gets dropped (or flagged) before training."""

    def shingles(df, idc, out_id):
        toks = F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")
        t = df.select(F.col(idc).alias(out_id), toks.alias("toks")).filter(
            F.size("toks") >= n
        )
        starts = F.sequence(F.lit(1), F.size("toks") - (n - 1))
        return t.select(
            out_id, "toks", F.explode(starts).alias("i")
        ).select(
            out_id,
            F.md5(F.array_join(F.slice("toks", F.col("i"), n), " ")).alias("g"),
        ).distinct()

    d = shingles(docs, id_col, "doc_id")
    p = shingles(probes, probe_id_col, "probe_id")
    return (
        d.join(p, "g")
        .groupBy("doc_id", "probe_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict,
    key_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus mixing: keep each ``key_col`` stratum at
    its ``rates[key]`` fraction (keys absent from ``rates`` drop to 0).
    Selection = md5-prefix bucket (0..9999) < rate*10000 — content-
    hashed, so the kept set is stable across runs/partitionings and a
    rate increase strictly grows the previous sample (nested samples,
    the property rand()-sampling lacks)."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long"),
        F.lit(10000),
    )
    pairs = []
    for k, r in sorted(rates.items()):
        pairs += [F.lit(k), F.lit(int(round(r * 10000)))]
    thresh = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(key_col)), F.lit(0)
    )
    return docs.filter(bucket < thresh).select(
        F.col(id_col).alias("doc_id"),
        F.col(key_col).alias("stratum"),
        bucket.alias("bucket"),
    )


def hash_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """(doc_id, bucket, split): deterministic content-hash assignment —
    bucket = int(md5(text)[:8], 16) % 100; train/val/test by
    percentile.  Duplicate texts land in the SAME split (no eval
    leakage across exact dups), and the assignment never moves when
    the corpus is re-partitioned or re-sampled."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def extract_urls(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url, canonical): URLs found in the text plus their
    canonical form — the URL-dedup key a crawl pipeline groups on:

    - fragment dropped
    - tracking query params removed (utm_*, fbclid, gclid, ref),
      dangling '?'/'&' tidied
    - scheme://host lowercased (path/query case preserved)
    - default ports stripped (:80 for http, :443 for https)
    - single trailing slash trimmed

    Pure JVM regex chain, identical expressions in the DuckDB twin.
    """
    # Column-typed pattern avoids SQL string-literal backslash mangling
    s = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    ).alias("url")
    base = docs.select(F.col(id_col).alias("doc_id"), s)
    u = F.col("url")
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    u = F.regexp_replace(u, r"(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*", "")
    u = F.regexp_replace(u, r"&{2,}", "&")                     # collapse &&
    u = F.regexp_replace(u, r"\?&", "?")                       # ?& -> ?
    u = F.regexp_replace(u, r"[?&]+$", "")                     # dangling
    head = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+", 0)
    canon = (
        base.withColumn("_c", u)
        .withColumn("_h", F.lower(head))
        # rest offset uses the ORIGINAL head length (before port strip)
        .withColumn("_r", F.expr("substring(_c, length(_h) + 1)"))
        .withColumn("_h", F.regexp_replace("_h", r"^(http)://([^:/]+):80$", "$1://$2"))
        .withColumn("_h", F.regexp_replace("_h", r"^(https)://([^:/]+):443$", "$1://$2"))
        .withColumn("canonical",
                    F.regexp_replace(F.concat("_h", "_r"), r"/$", ""))
    )
    return canon.select("doc_id", "url", "canonical")
