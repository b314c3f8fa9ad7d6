"""Streaming deduplication for continuously-ingested corpora — the
operators a crawl pipeline needs to suppress duplicates BEFORE they
reach the index/training set (the reference has no streaming;
SURVEY §2.5).

- ``dedup_exact_stream``: emit only the first occurrence of each
  content hash, with state bounded by a watermark
  (dropDuplicatesWithinWatermark — Spark expires a hash's state once
  the watermark passes, so unbounded streams don't accumulate
  unbounded state).
- ``lsh_candidates_stream``: streaming MinHash-LSH candidate emitter —
  the stateless per-doc signature (no shuffle) explodes into band
  buckets, and a stateful operator keyed by (band, bucket) emits a
  candidate pair for every new doc against the docs previously seen
  in that bucket.  Downstream, the batch verifier
  (text/dedup.ngram_jaccard_pairs) confirms candidates exactly —
  the same bucket->candidates->verify shape as the batch pipeline,
  incrementalized.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..text.dedup import band_buckets, minhash_signatures_stateless

CAND_SCHEMA = "band int, bucket long, id_a long, id_b long"
_CAND_STATE = "ids array<long>"


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per sha256(text) within the watermark horizon.
    Docs whose hash state has expired (older than the watermark) may
    re-emit — the standard bounded-state trade-off."""
    h = docs.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    return h.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha256"]
    )


def _cand_fn(max_bucket_size: int):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        out = []
        for pdf in pdfs:
            for did in pdf["doc_id"].tolist():
                did = int(did)
                if did in seen:
                    continue
                for prev in seen:
                    a, b = (prev, did) if prev < did else (did, prev)
                    out.append((key[0], key[1], a, b))
                if len(seen) < max_bucket_size:
                    seen.append(did)
        state.update((seen,))
        if out:
            yield pd.DataFrame(out, columns=["band", "bucket", "id_a", "id_b"])

    return fn


def lsh_candidates_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Streaming near-duplicate CANDIDATES (band, bucket, id_a, id_b).
    State per (band, bucket) is the doc-id list seen so far, capped at
    ``max_bucket_size`` (a hot bucket stops growing; its existing
    members still match new arrivals).  Pairs may repeat across bands —
    dedupe downstream with the exact verifier, exactly as the batch
    ``minhash_lsh_pairs`` does."""
    sig = minhash_signatures_stateless(
        docs, text_col, id_col, num_perm, shingle, seed
    )
    banded = band_buckets(sig, id_col, num_perm, bands).select(
        F.col(id_col).alias("doc_id"), "band", "bucket"
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _cand_fn(max_bucket_size),
        CAND_SCHEMA,
        _CAND_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
