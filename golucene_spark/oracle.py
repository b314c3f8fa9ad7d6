"""Independent single-node search oracle (no Spark).

A dict-based inverted index + scorer implementing the identical
formulas as the engine but through a completely different execution
path (per-doc Python loops, heapq top-k).  Used by tests to assert
rank-identity of the Spark plans (FIXTURES.md F3/F4).

Formulas:
  BM25 (Lucene 4.10): idf=ln(1+(N-df+0.5)/(df+0.5)),
      score=idf*boost*(k1+1)*f/(f+k1*(1-b+b*dl/avgdl)), avgdl=sumTTF/N
  Classic TFIDF (search.go:253-519): idf=ln(N/(df+1))+1,
      score=queryNorm*(idf*boost)*idf*sqrt(f)*decode(normByte), coord.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from .analysis import get_analyzer
from .index import smallfloat
from .search.ast import BooleanQuery, Occur, TermQuery


class OracleIndex:
    def __init__(self, docs, analyzer="standard", quantize=True,
                 keyword_docs: dict | None = None):
        """docs: iterable of (doc_id, text).  keyword_docs: optional
        {field: [(doc_id, value)]} for StringField-style exact terms."""
        an = get_analyzer(analyzer)
        self.postings: dict[tuple, dict[int, int]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        self.dlq: dict[int, float] = {}
        self.norm_byte: dict[int, int] = {}
        self.n_docs = 0
        total = 0
        for doc_id, text in docs:
            terms, _, _ = an.analyze_batch([text])
            tf: dict[str, int] = defaultdict(int)
            for t in terms.tolist():
                tf[t] += 1
            length = len(terms)
            nb = int(smallfloat.encode_norm_from_length(np.array([length]))[0])
            self.dl[doc_id] = length
            self.norm_byte[doc_id] = nb
            self.dlq[doc_id] = (
                float(smallfloat.quantized_doc_length(np.array([nb], dtype=np.uint8))[0])
                if quantize
                else float(length)
            )
            for t, f in tf.items():
                self.postings[("content", t)][doc_id] = f
            self.n_docs += 1
            total += length
        for fld, pairs in (keyword_docs or {}).items():
            for doc_id, v in pairs:
                if v is not None:
                    self.postings[(fld, v)][doc_id] = 1
        self.sum_ttf = total
        self.avgdl = 1.0 if total <= 0 else total / self.n_docs

    # -- scoring ----------------------------------------------------------
    def _idf(self, df, sim):
        if sim == "bm25":
            return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
        return math.log(self.n_docs / (df + 1.0)) + 1.0

    def _term_scores(self, q: TermQuery, sim, query_norm) -> dict[int, float]:
        pl = self.postings.get((q.field, q.term), {})
        if not pl:
            return {}
        idf = self._idf(len(pl), sim)
        out = {}
        for d, f in pl.items():
            if sim == "bm25":
                k1, b = 1.2, 0.75
                if q.field == "content":
                    dl = self.dlq[d]
                    out[d] = idf * q.boost * (k1 + 1) * f / (
                        f + k1 * (1 - b + b * dl / self.avgdl)
                    )
                else:
                    # omitNorms (StringField): Lucene's NoNorms BM25
                    # denominator is freq + k1
                    out[d] = idf * q.boost * (k1 + 1) * f / (f + k1)
            else:
                if q.field == "content":
                    decode = float(smallfloat.NORM_TABLE[self.norm_byte[d]])
                else:
                    decode = 1.0
                out[d] = query_norm * (idf * q.boost) * idf * math.sqrt(f) * decode
        return out

    def _sum_sq(self, q, sim):
        if isinstance(q, TermQuery):
            df = len(self.postings.get((q.field, q.term), {}))
            return (self._idf(df, sim) * q.boost) ** 2
        # BooleanWeight: boost^2 * sum of children (booleanQuery.go:68-80)
        return q.boost ** 2 * sum(
            self._sum_sq(c.query, sim) for c in q.clauses if not c.is_prohibited
        )

    def _frame(self, q, sim, query_norm) -> dict[int, float] | None:
        if isinstance(q, TermQuery):
            s = self._term_scores(q, sim, query_norm)
            return s if s else None
        scoring = [c for c in q.clauses if not c.is_prohibited]
        prohibited = [c for c in q.clauses if c.is_prohibited]
        n_must = sum(1 for c in scoring if c.is_required)
        max_coord = len(scoring)
        sums: dict[int, float] = defaultdict(float)
        coord: dict[int, int] = defaultdict(int)
        must: dict[int, int] = defaultdict(int)
        any_frame = False
        for c in scoring:
            f = self._frame(c.query, sim, query_norm)
            if f is None:
                if c.is_required:
                    return None
                continue
            any_frame = True
            for d, s in f.items():
                sums[d] += s
                coord[d] += 1
                if c.is_required:
                    must[d] += 1
        if not any_frame:
            return None
        out = {}
        for d, s in sums.items():
            if n_must and must[d] != n_must:
                continue
            if q.minimum_should_match and (coord[d] - must[d]) < q.minimum_should_match:
                continue
            sc = s
            if sim != "bm25" and max_coord > 1:
                sc = sc * coord[d] / max_coord
            out[d] = sc * q.boost
        for c in prohibited:
            f = self._frame(c.query, sim, 1.0)
            if f:
                for d in f:
                    out.pop(d, None)
        return out

    def search(self, query, k=10, similarity="bm25"):
        q = query.rewrite() if hasattr(query, "rewrite") else query
        qn = 1.0
        if similarity != "bm25":
            ss = self._sum_sq(q, similarity)
            qn = 1.0 / math.sqrt(ss) if ss > 0 else 1.0
        f = self._frame(q, similarity, qn) or {}
        # Collector order mirrors the engine's documented keyset:
        # (round(score*1e6) HALF_UP desc, doc_id asc) — raw-float order
        # would diverge from Searcher.search/search_after on sub-1e-6
        # score ties (executor.py::_score_e6 / cursor_e6).
        from .search.executor import cursor_e6

        return sorted(f.items(), key=lambda kv: (-cursor_e6(kv[1]), kv[0]))[:k]
