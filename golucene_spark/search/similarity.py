"""Scoring models as column expressions (and NumPy twins for the oracle).

- ClassicSimilarity == Lucene 4.10 DefaultSimilarity/TFIDFSimilarity
  (core/search/search.go:253-519): tf=sqrt(freq),
  idf=ln(maxDoc/(df+1))+1, lengthNorm = SmallFloat-quantized
  1/sqrt(length), queryNorm=1/sqrt(sum of squared clause weights),
  coord=overlap/maxOverlap.
- BM25Similarity: absent from the reference core (only a commented stub
  at test_framework/search/similarity.go:17); implemented per published
  Lucene 4.10 BM25: idf=ln(1+(N-df+0.5)/(df+0.5)),
  tfNorm=freq*(k1+1)/(freq+k1*(1-b+b*dl/avgdl)), k1=1.2, b=0.75, where
  dl is the decoded quantized norm byte and avgdl=sumTotalTermFreq/maxDoc.
  BM25 ignores queryNorm and coord (Similarity.coord()==1 in 4.10).

Both models are pure arithmetic over (freq, dlq|norm_byte) columns with
per-term scalars (idf, weights) computed once from collected stats —
the Spark analogue of CreateNormalizedWeight (search.go:154-171).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, functions as F

from ..index import smallfloat


def _c(x) -> Column | float:
    """Accept either a Python float or a Column for per-term scalars
    (the flat multi-term fast path passes map-lookup Columns)."""
    return x if isinstance(x, Column) else float(x)


class BM25Similarity:
    name = "bm25"
    uses_coord = False

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b

    def idf(self, df: int, max_doc: int) -> float:
        return math.log(1.0 + (max_doc - df + 0.5) / (df + 0.5))

    def avgdl(self, sum_ttf: int, max_doc: int) -> float:
        return 1.0 if sum_ttf <= 0 or max_doc <= 0 else sum_ttf / max_doc

    def score_col(self, freq: Column, dlq: Column, norm_byte: Column,
                  idf, avgdl: float, boost=1.0) -> Column:
        w = _c(idf) * _c(boost) * (self.k1 + 1.0)
        denom = freq + self.k1 * (1.0 - self.b + self.b * dlq / avgdl)
        return w * freq / denom

    def score_np(self, freq, dlq, norm_byte, idf, avgdl, boost=1.0):
        freq = np.asarray(freq, dtype=np.float64)
        dlq = np.asarray(dlq, dtype=np.float64)
        w = idf * boost * (self.k1 + 1.0)
        return w * freq / (freq + self.k1 * (1.0 - self.b + self.b * dlq / avgdl))

    # weight normalization is a no-op for BM25 (BM25Stats.normalize
    # ignores queryNorm in Lucene 4.10)
    def query_norm(self, sum_sq: float) -> float:
        return 1.0

    def value_for_normalization(self, idf: float, boost: float) -> float:
        return (idf * boost) ** 2


_NORM_TABLE_LIST = [float(x) for x in smallfloat.NORM_TABLE]


class ClassicSimilarity:
    name = "classic"
    uses_coord = True

    def idf(self, df: int, max_doc: int) -> float:
        return math.log(max_doc / (df + 1.0)) + 1.0  # search.go:513-515

    def avgdl(self, sum_ttf: int, max_doc: int) -> float:
        return 1.0  # unused

    def query_norm(self, sum_sq: float) -> float:
        return 1.0 / math.sqrt(sum_sq) if sum_sq > 0 else 1.0  # search.go:160-170

    def value_for_normalization(self, idf: float, boost: float) -> float:
        return (idf * boost) ** 2

    def score_col(self, freq: Column, dlq: Column, norm_byte: Column,
                  idf, avgdl: float, boost=1.0,
                  query_norm: float = 1.0) -> Column:
        # folded TermWeight value: queryNorm * (idf*boost)^2 then
        # per-doc tf(freq) * decode(normByte)  (search.go:325-361)
        w = query_norm * (_c(idf) * _c(boost)) * _c(idf)
        if norm_byte is not None:
            decode = F.element_at(
                F.array(*[F.lit(x) for x in _NORM_TABLE_LIST]), norm_byte + 1
            )
        else:
            decode = 1.0 / F.sqrt(dlq)
        return w * F.sqrt(freq) * decode

    def score_np(self, freq, dlq, norm_byte, idf, avgdl, boost=1.0, query_norm=1.0):
        freq = np.asarray(freq, dtype=np.float64)
        if norm_byte is not None:
            decode = smallfloat.NORM_TABLE[np.asarray(norm_byte, dtype=np.int64)].astype(np.float64)
        else:
            decode = 1.0 / np.sqrt(np.asarray(dlq, dtype=np.float64))
        return query_norm * (idf * boost) * idf * np.sqrt(freq) * decode

    @staticmethod
    def coord(overlap: int, max_overlap: int) -> float:
        return overlap / max_overlap  # search.go:467-469


class LMDirichletSimilarity:
    """LMDirichletSimilarity of Lucene 4.10 (language-model scoring with
    Bayesian Dirichlet smoothing; absent from the reference):

        score = boost * max(0, log(1 + freq / (mu * P(t|C)))
                               + log(mu / (dl + mu)))

    with P(t|C) = (totalTermFreq + 1) / (sumTotalTermFreq + 1)
    (LMSimilarity.fillBasicStats) and mu = 2000 by default.  The
    per-term scalar channel carries P(t|C) instead of idf
    (Searcher._term_scalar); dl is the (quantized-decoded) doc length,
    exactly the norm Lucene's LM implementations read back."""

    name = "lm_dirichlet"
    uses_coord = False

    def __init__(self, mu: float = 2000.0):
        self.mu = mu

    # per-term scalar: collection probability (needs ttf, not df)
    def term_scalar(self, st, cs) -> float:
        return (st.ttf + 1.0) / (cs["sum_ttf"] + 1.0)

    # fallback for generic callers; not a meaningful LM quantity on its
    # own, kept so shared code paths (explain summaries) don't crash
    def idf(self, df: int, max_doc: int) -> float:
        return 1.0

    def avgdl(self, sum_ttf: int, max_doc: int) -> float:
        return 1.0 if sum_ttf <= 0 or max_doc <= 0 else sum_ttf / max_doc

    def score_col(self, freq: Column, dlq: Column, norm_byte: Column,
                  p, avgdl: float, boost=1.0) -> Column:
        raw = (
            F.log(1.0 + freq / (_c(p) * self.mu))
            + F.log(F.lit(self.mu) / (dlq + self.mu))
        )
        return _c(boost) * F.greatest(F.lit(0.0), raw)

    def score_np(self, freq, dlq, norm_byte, p, avgdl, boost=1.0):
        freq = np.asarray(freq, dtype=np.float64)
        dlq = np.asarray(dlq, dtype=np.float64)
        raw = np.log(1.0 + freq / (p * self.mu)) + np.log(self.mu / (dlq + self.mu))
        return boost * np.maximum(0.0, raw)

    def query_norm(self, sum_sq: float) -> float:
        return 1.0

    def value_for_normalization(self, p: float, boost: float) -> float:
        return boost ** 2


def get_similarity(name: str):
    if name in ("bm25", None):
        return BM25Similarity()
    if name in ("classic", "tfidf", "default"):
        return ClassicSimilarity()
    if name in ("lm_dirichlet", "lm", "dirichlet"):
        return LMDirichletSimilarity()
    raise ValueError(f"unknown similarity {name!r}")
