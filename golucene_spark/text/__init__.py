from .dedup import exact_dups, minhash_signatures, minhash_lsh_pairs, simhash64, ngram_jaccard_pairs, dedup_groups
from .quality import token_quality, language_id, doc_fingerprint, bpe_token_count
from .ann import (
    cosine_topk,
    cosine_pairs,
    cosine_pairs_lsh,
    lsh_cosine_topk,
    add_lsh_bucket,
    band_keys,
    probe_buckets,
)

__all__ = [
    "exact_dups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "dedup_groups",
    "token_quality",
    "language_id",
    "doc_fingerprint",
    "bpe_token_count",
    "cosine_topk",
    "cosine_pairs",
    "cosine_pairs_lsh",
    "lsh_cosine_topk",
    "add_lsh_bucket",
    "band_keys",
    "probe_buckets",
]
