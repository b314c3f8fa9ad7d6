"""Approximate-nearest-neighbor search over embedding columns.

- cosine_topk: exact brute force — one scan, JVM zip_with/aggregate
  dot products, TakeOrderedAndProject top-k.  The correctness baseline.
- lsh_cosine_topk: random-hyperplane LSH (sign bits -> bucket) with
  multi-probe fallback; brute force within the (much smaller) matching
  buckets.  The scale path: bucketing turns an O(N) scan per query
  into a partition-pruned scan when the table is written partitioned
  by bucket.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact top-k by cosine similarity to query_vec (python list)."""
    qv = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in qv))
    qcol = F.array(*[F.lit(x) for x in qv])
    d = emb.withColumn("_v", F.col(vec_col).cast("array<double>"))
    if exclude_id is not None:
        d = d.filter(F.col(id_col) != exclude_id)
    cos = _dot(F.col("_v"), qcol) / (F.sqrt(_dot(F.col("_v"), F.col("_v"))) * F.lit(qn))
    return (
        d.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold (embedding near-duplicate dedup).
    Brute-force self-join baseline; at scale, pre-bucket with
    add_lsh_bucket and join within buckets instead."""
    d = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    a = d.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    b = d.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return j.select("id_a", "id_b", cos.alias("cosine")).filter(F.col("cosine") >= threshold)


def hyperplanes(dim: int, n_bits: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def add_lsh_bucket(
    emb: DataFrame, dim: int, n_bits: int = 16, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit bucket id column (random hyperplane LSH).  At scale,
    write the table partitioned/bucketed by this column."""
    H = hyperplanes(dim, n_bits, seed)
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for i in range(n_bits):
        h = F.array(*[F.lit(float(x)) for x in H[i]])
        bucket = bucket + F.when(_dot(v, h) > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return emb.withColumn("lsh_bucket", bucket)


def probe_buckets(qbucket: int, n_bits: int, max_hamming: int) -> list[int]:
    """All bucket ids within Hamming distance ``max_hamming`` of the
    query bucket, enumerated driver-side (C(n_bits, <=h) values) so the
    scan becomes a pushed-down IN-list — partition pruning when the
    table is written partitioned by lsh_bucket, instead of a full-table
    bit_count filter."""
    from itertools import combinations

    out = [int(qbucket)]
    for h in range(1, max_hamming + 1):
        for idxs in combinations(range(n_bits), h):
            m = 0
            for i in idxs:
                m |= 1 << i
            out.append(int(qbucket) ^ m)
    return out


def lsh_cosine_topk(
    emb_bucketed: DataFrame,
    query_vec,
    k: int = 10,
    n_bits: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Approximate top-k: scan only buckets within `max_hamming` bits of
    the query's bucket, brute-force cosine inside them.  The probe set
    is enumerated driver-side -> `lsh_bucket IN (...)` prunes files/
    partitions; never a full scan."""
    qv = [float(x) for x in query_vec]
    H = hyperplanes(len(qv), n_bits, seed)
    qbucket = 0
    for i in range(n_bits):
        # sequential left-fold dot: the exact association order of the
        # JVM aggregate in add_lsh_bucket (and of the SQL oracle twin),
        # so the query's bucket matches the table's bucketing bit-for-bit
        dot = 0.0
        for hx, vx in zip(H[i], qv):
            dot += float(hx) * vx
        if dot > 0:
            qbucket |= 1 << i
    cand = emb_bucketed.filter(
        F.col("lsh_bucket").isin(probe_buckets(qbucket, n_bits, max_hamming))
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_id)


def band_keys(
    emb: DataFrame,
    dim: int,
    n_bands: int = 16,
    band_bits: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, key) rows: sign-bit LSH split into bands (the MinHash
    banding trick applied to random-hyperplane signatures).  Vectorized:
    one NumPy matmul per Arrow batch."""
    import pandas as pd
    from pyspark.sql import types as T

    H = hyperplanes(dim, n_bands * band_bits, seed)
    pows = (1 << np.arange(band_bits, dtype=np.int64))

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("key", T.LongType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            V = np.array(pdf["_v"].tolist(), dtype=np.float64)
            bits = (V @ H.T) > 0  # (m, n_bands*band_bits)
            keys = bits.reshape(m, n_bands, band_bits).astype(np.int64) @ pows
            yield pd.DataFrame(
                {
                    "_id": np.repeat(pdf["_id"].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), m),
                    "key": keys.reshape(-1),
                }
            )

    src = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    return src.mapInPandas(compute, schema)


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_bands: int = 16,
    band_bits: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs via banded sign-LSH: candidates =
    pairs sharing >= 1 band key (within-bucket equi-join, never an
    all-pairs cross join), then EXACT cosine verification with the same
    arithmetic as cosine_pairs.  Approximate-recall by construction
    (a qualifying pair missed by every band is lost); with 16 bands x
    3 bits the miss probability at cosine>=0.4 is < 1e-2 per pair and
    the gate asserts exact equality with the brute-force oracle on the
    test corpus."""
    keys = band_keys(emb, dim, n_bands, band_bits, seed, id_col, vec_col)
    a = keys.select(F.col("_id").alias("id_a"), "band", "key")
    b = keys.select(F.col("_id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    d = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    j = (
        cand.join(d.select(F.col("_id").alias("id_a"), F.col("_v").alias("va")), "id_a")
        .join(d.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb")), "id_b")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return j.select("id_a", "id_b", cos.alias("cosine")).filter(F.col("cosine") >= threshold)
