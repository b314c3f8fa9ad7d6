"""Deduplication operators for large-scale corpus pipelines.

All operators are pure Catalyst plans (no Python UDFs): tokenization
uses JVM regexp_extract_all, hashing uses xxhash64 — so whole-stage
codegen and partial aggregation apply unchanged at 100 TB.

- exact_dups:          hash-groupBy on md5(text)
- minhash_signatures:  k permutations of (a*h+b) mod p over token
                       n-gram shingles, min per permutation
- minhash_lsh_pairs:   banding -> bucket join -> candidate pairs ->
                       exact Jaccard verification (classic MinHash+LSH)
- simhash64:           64-bit SimHash over token frequencies
- ngram_jaccard_pairs: exact shingle-set Jaccard for given/candidate
                       pairs (the verifier stage)

Scale notes: the LSH bucket join self-joins only within (band, bucket)
groups, so the shuffle key is the banded signature — hot buckets are
bounded by band width; candidate verification joins exploded shingle
sets re-partitioned on shingle hash (skew-safe: shingles are near-unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_PATTERN = "[a-z0-9_]+"
# 31-bit Mersenne prime: keeps a*h+b within int64 under ANSI arithmetic
MERSENNE_P = (1 << 31) - 1


def _tokens(col):
    return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN}', 0)")


def _shingles(tokens_col, n: int):
    """n-gram shingles of a token array (JVM transform/slice)."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens_col)))


def exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n"),
            F.min(id_col).alias("keep_doc"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n") > 1)
    )


def _perm_params(num_perm: int, seed: int = 42):
    """Deterministic (a, b) parameters for the universal hash family."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P - 1, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P - 1, size=num_perm, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash array<long>) — one shuffle (groupBy id)."""
    a, b = _perm_params(num_perm, seed)
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_shingles(_tokens(text_col), shingle))).alias("sh"),
    ).withColumn("h", F.pmod(F.xxhash64("sh"), F.lit(MERSENNE_P)))
    mins = [
        F.min((F.col("h") * F.lit(int(ai)) + F.lit(int(bi))) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (ai, bi) in enumerate(zip(a, b))
    ]
    g = sh.groupBy(id_col).agg(*mins)
    return g.select(F.col(id_col), F.array(*[f"mh{i}" for i in range(num_perm)]).alias("minhash"))


def minhash_signatures_stateless(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash) with NO shuffle: the per-doc min over permuted
    shingle hashes runs as higher-order array functions inside one
    projection.  Identical output to minhash_signatures (tested), but
    streaming-safe (stateless) and shuffle-free — prefer it when the
    signature feeds a downstream repartition anyway."""
    a, b = _perm_params(num_perm, seed)
    hs = F.transform(
        F.array_distinct(_shingles(_tokens(text_col), shingle)),
        lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)),
    )
    tmp = df.withColumn("_hs", hs)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    "_hs",
                    lambda h: (h * F.lit(int(ai)) + F.lit(int(bi))) % F.lit(MERSENNE_P),
                )
            )
            for ai, bi in zip(a, b)
        ]
    )
    return tmp.select(F.col(id_col), sig.alias("minhash"))


def band_buckets(
    sig: DataFrame, id_col: str = "doc_id", num_perm: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, bucket): xxhash64 of each band's signature slice —
    the LSH banding step shared by the batch pair join and the
    streaming candidate emitter."""
    rows_per_band = num_perm // bands
    return sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            "_",
                            F.transform(
                                F.slice("minhash", bnd * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs: minhash -> band buckets -> bucket self-join
    -> exact Jaccard >= threshold.  Returns (id_a, id_b, jaccard)."""
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle, seed)
    banded = band_buckets(sig, id_col, num_perm, bands)
    l = banded.alias("l")
    r = banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return ngram_jaccard_pairs(df, cand, text_col, id_col, shingle).filter(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,  # (id_a, id_b)
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for the given pairs (verifier stage)."""
    sets = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(_shingles(_tokens(text_col), shingle)).alias("_sh"),
    )
    a = sets.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a")
    b = sets.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b")
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )


def dedup_groups(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Near-duplicate GROUPS from candidate pairs: connected components
    via iterative min-label propagation (the canonical-doc selection
    step after MinHash/SimHash pair generation).

    Input: (id_a, id_b) pairs.  Output: (doc_id, group_id) where
    group_id = min doc id of the component (the kept/canonical doc).
    Converges in O(component diameter) joins; each iteration is one
    shuffle — the standard large-scale CC formulation.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("group_id", F.col("doc_id"))
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.least(F.col("group_id"), F.coalesce("nbr_min", "group_id")).alias("group_id"),
            # convergence flag computed INLINE while both labels are in
            # hand: the former new-vs-old join cost a full extra
            # shuffle-join of the label table per iteration just to
            # count changes; this is one scan of the checkpointed frame
            (F.coalesce("nbr_min", "group_id") < F.col("group_id")).alias("_changed"),
        )
        # truncate lineage each iteration: without this the plan doubles
        # per round and deep components blow up the optimizer at scale
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).count()
        labels.unpersist()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over token frequencies (JVM-side bit algebra)."""
    tf = (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.xxhash64("tok"))
    )
    bit_sums = [
        F.sum(
            (F.shiftright("h", k).bitwiseAND(F.lit(1)) * 2 - 1) * F.col("w")
        ).alias(f"b{k}")
        for k in range(64)
    ]
    g = tf.groupBy(id_col).agg(*bit_sums)
    acc = F.lit(0).cast("long")
    for k in range(64):
        acc = acc + F.when(F.col(f"b{k}") > 0, F.lit(1).cast("long") * (1 << k) if k < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(0)
    return g.select(F.col(id_col), acc.alias("simhash"))


def simhash_hamming_pairs(sig: DataFrame, id_col: str = "doc_id", max_dist: int = 3) -> DataFrame:
    """Candidate pairs within Hamming distance via 4x16-bit block index
    (a pair within distance 3 shares at least one exact 16-bit block)."""
    blocks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", "b.blk", "b.val")
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.val") == F.col("r.val"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", dist.alias("hamming")).filter(F.col("hamming") <= max_dist)


def repeated_ngram_coverage(df: DataFrame, n: int = 8,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Corpus-level exact-substring duplication signal (the ExactSubstr
    pass of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — re-expressed
    set-oriented, no suffix array): an n-token span occurring more than
    once ANYWHERE in the corpus (another doc, or another offset of the
    same doc) marks its token range as duplicated; per doc we report
    how many token positions at least one duplicated span covers.

    Returns (doc_id, n_tokens, dup_spans, dup_covered, dup_frac).

    Scale shape: one shingle explode (narrow, O(total tokens)), ONE
    wide shuffle on the md5 shingle key (a hot span collapses to a
    single counting row — no skew amplification), a semi-join back,
    and a per-doc window for the interval union.  Linear in total
    tokens; the 100-TB cost is the one shingle-keyed exchange.
    """
    from pyspark.sql import Window

    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    shing = F.when(
        F.col("n_tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - n + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = base.select("doc_id", F.posexplode(shing).alias("start", "h"))
    dup_keys = spans.groupBy("h").count().filter(F.col("count") > 1).select("h")
    dup_spans = spans.join(dup_keys, "h", "left_semi")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("start") + n).over(w)
    add = F.greatest(
        F.lit(0),
        (F.col("start") + n)
        - F.greatest(F.coalesce(prev_end, F.col("start")), F.col("start")),
    )
    cov = (
        dup_spans.withColumn("add", add)
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_spans"), F.sum("add").alias("dup_covered"))
    )
    return base.select("doc_id", "n_tokens").join(cov, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        F.coalesce("dup_covered", F.lit(0)).cast("long").alias("dup_covered"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("dup_covered", F.lit(0)).cast("double") / F.col("n_tokens"),
        ).otherwise(F.lit(0.0)).alias("dup_frac"),
    )
