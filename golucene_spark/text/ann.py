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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse spherical k-means quantizer -> cell
# assignment -> probe top-nprobe cells.  The second scale path beside
# LSH: cells adapt to the data distribution, so recall at equal probe
# cost is typically higher than data-oblivious hyperplanes.
# ---------------------------------------------------------------------------

def train_ivf(vectors: np.ndarray, n_cells: int = 8, iters: int = 10,
              seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd, fixed iterations, seeded
    init): returns L2-NORMALIZED centroids (n_cells, dim).  Train on a
    driver-side sample — the coarse quantizer needs thousands of
    vectors, not the corpus."""
    rng = np.random.default_rng(seed)
    X = np.asarray(vectors, dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=n_cells, replace=False)]
    for _ in range(iters):
        sims = Xn @ C.T                       # (n, k) cosine to each centroid
        # argmax with smallest-cell tie-break (argmax returns first max)
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = Xn[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def add_ivf_cell(emb: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding") -> DataFrame:
    """`ivf_cell` column: index of the max-cosine centroid (ties ->
    smallest cell).  Pure JVM expressions (one dot fold per cell); at
    scale, write the table partitioned by ivf_cell."""
    v = F.col(vec_col).cast("array<double>")
    vnorm = F.sqrt(_dot(v, v))
    scored = []
    for cell, c in enumerate(np.asarray(centroids, dtype=np.float64)):
        carr = F.array(*[F.lit(float(x)) for x in c])
        # centroids are unit-norm; cosine = dot / ||v||
        scored.append(F.struct(
            (_dot(v, carr) / vnorm).alias("d"),
            F.lit(-cell).cast("int").alias("nc"),
        ))
    best = F.array_max(F.array(*scored))
    return emb.withColumn("ivf_cell", (-best["nc"]).cast("int"))


def ivf_probe_cells(query_vec, centroids: np.ndarray, nprobe: int) -> list[int]:
    """Top-nprobe cells by query-to-centroid cosine (ties -> smaller
    cell), enumerated driver-side -> pushed-down IN-list."""
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    sims = np.asarray(centroids, dtype=np.float64) @ q
    order = sorted(range(len(sims)), key=lambda c: (-sims[c], c))
    return [int(c) for c in order[:nprobe]]


def ivf_cosine_topk(
    emb_celled: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Approximate top-k: brute-force cosine inside the top-nprobe
    cells only.  With the table partitioned by ivf_cell the IN-list is
    partition pruning — scan cost is nprobe/n_cells of the corpus."""
    cells = ivf_probe_cells(query_vec, centroids, nprobe)
    pruned = emb_celled.filter(F.col("ivf_cell").isin(cells))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, exclude_id)


def quantize_embeddings(emb: DataFrame, col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization per vector (the embedding-serving
    compression step): scale = max(|x|), q_i = round(x_i * 127 / scale)
    in [-127, 127].  4x smaller storage; dot products against int8
    vectors rescale by (scale_a * scale_b / 127^2).  Pure Catalyst
    higher-order functions — deterministic, no Python in the loop."""
    mx = F.array_max(F.transform(col, lambda x: F.abs(x))).cast("double")
    q = F.transform(
        col, lambda x: F.round(x.cast("double") * 127.0 / mx, 0).cast("int")
    )
    return emb.select(
        F.col(id_col),
        mx.alias("scale"),
        q.alias("qvec"),
    )


def train_pq(vectors: np.ndarray, m: int = 8, k: int = 16, iters: int = 10,
             seed: int = 42) -> np.ndarray:
    """Deterministic product-quantization codebooks (Jegou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): split the
    dimension into ``m`` subspaces and run plain Lloyd k-means per
    subspace (seeded init, fixed iterations).  Returns (m, k, dsub)
    float64.  Train on a driver-side sample — codebooks need thousands
    of vectors, not the corpus."""
    X = np.asarray(vectors, dtype=np.float64)
    n, d = X.shape
    assert d % m == 0, f"dim {d} not divisible into {m} subspaces"
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                msk = assign == c
                if msk.any():
                    C[c] = Xs[msk].mean(axis=0)
        books[s] = C
    return books


def pq_encode(emb: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """``pq_code``: array<int> of m sub-codes — per subspace the argmin
    squared-L2 centroid (ties -> smaller code).  Pure JVM expressions
    (one (x-c)^2 fold per centroid inside whole-stage codegen); at
    100 TB each stored vector shrinks from 4*dim bytes to m codes."""
    v = F.col(vec_col).cast("array<double>")
    m, k, dsub = codebooks.shape
    codes = []
    for s in range(m):
        sub = F.slice(v, s * dsub + 1, dsub)
        cands = []
        for j in range(k):
            carr = F.array(*[F.lit(float(x)) for x in codebooks[s, j]])
            diff = F.zip_with(sub, carr, lambda x, c: (x - c) * (x - c))
            dist = F.aggregate(diff, F.lit(0.0), lambda a, x: a + x)
            cands.append(F.struct(dist.alias("d"), F.lit(j).cast("int").alias("j")))
        codes.append(F.array_min(F.array(*cands))["j"])
    return emb.select(F.col(id_col), F.array(*codes).alias("pq_code"))


def pq_adc_topk(encoded: DataFrame, codebooks: np.ndarray, query_vec,
                k: int = 10, id_col: str = "vec_id",
                exclude_id=None) -> DataFrame:
    """Asymmetric distance computation: the query's per-subspace
    distance table LUT[s][j] = ||q_s - c_sj||^2 is computed driver-side
    (m*k floats) and folded into ONE projection over the stored code
    arrays — the scan reads only the m-int codes, never the vectors.
    Returns (vec_id, adist) ascending (approximate L2 nearest)."""
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    m, kk, dsub = codebooks.shape
    expr = None
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        lut = [float(((qs - codebooks[s, j]) ** 2).sum()) for j in range(kk)]
        term = F.element_at(
            F.array(*[F.lit(x) for x in lut]),
            F.element_at(F.col("pq_code"), s + 1) + 1,
        )
        expr = term if expr is None else (expr + term)
    out = encoded
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.select(F.col(id_col), expr.alias("adist"))
        .orderBy(F.asc("adist"), F.asc(id_col))
        .limit(k)
    )
