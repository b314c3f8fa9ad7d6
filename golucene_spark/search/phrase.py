"""PhraseQuery (Q18): exact-phrase matching over indexed positions.

The reference indexes positions (W4, termsHashConsumerPerField.go:268-282)
but has no phrase scorer (SURVEY §2.4 Q18 marked v2).  We implement the
Lucene semantics: phrase frequency = number of positions p such that
term_i occurs at p+i for all i; the doc is scored by the query's
similarity with freq=phraseFreq and idf = sum of the terms' idfs
(Lucene's PhraseWeight sums idfs via Similarity.idfExplain(terms)).

Execution shape: conjunction (inner joins on doc_id — only docs
containing ALL terms survive) -> one vectorized pandas stage decoding
the packed position blobs and intersecting offset-shifted position
sets per doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .ast import TermQuery


def _decode(buf) -> np.ndarray:
    if buf is None:
        return np.array([], dtype=np.int32)
    return np.frombuffer(bytes(buf), dtype="<i4")


def phrase_freq_frame(index, field: str, terms: list[str]) -> DataFrame:
    """(doc_id, freq, dlq, norm_byte) for docs matching the exact phrase."""
    base = None
    for i, t in enumerate(terms):
        p = index.postings_for_terms(field, [t], with_positions=True).select(
            F.col("doc_id"),
            F.col("positions").alias(f"pos{i}"),
            *( [F.col("dlq"), F.col("norm_byte")] if i == 0 else [] ),
        )
        base = p if base is None else base.join(p, "doc_id")

    n = len(terms)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("freq", T.IntegerType()),
            T.StructField("dlq", T.DoubleType()),
            T.StructField("norm_byte", T.IntegerType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            freqs = np.zeros(len(pdf), dtype=np.int32)
            for r in range(len(pdf)):
                match = _decode(pdf["pos0"].iat[r])
                for i in range(1, n):
                    nxt = _decode(pdf[f"pos{i}"].iat[r]) - i
                    match = np.intersect1d(match, nxt, assume_unique=True)
                    if match.size == 0:
                        break
                freqs[r] = match.size
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "freq": freqs,
                    "dlq": pdf["dlq"],
                    "norm_byte": pdf["norm_byte"],
                }
            )
            yield out[out["freq"] > 0]

    return base.mapInPandas(compute, schema)


def phrase_search(searcher, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """Top-k BM25/classic scoring of an exact phrase."""
    from .executor import RESULT_SCHEMA

    terms = list(terms)
    if not terms:
        return searcher.index.spark.createDataFrame([], RESULT_SCHEMA)
    if len(terms) == 1:
        return searcher.search(TermQuery(field, terms[0]), k)
    stats = searcher._term_stats(
        # reuse the stats path via a throwaway boolean of the terms
        _terms_query(field, terms)
    )
    if any(stats[(field, t)].df == 0 for t in terms):
        return searcher.index.spark.createDataFrame([], RESULT_SCHEMA)
    cs = searcher._collection_stats(field)
    idf = sum(searcher.sim.idf(stats[(field, t)].df, cs["max_doc"]) for t in terms)
    avgdl = searcher.sim.avgdl(cs["sum_ttf"], cs["max_doc"])
    frame = phrase_freq_frame(searcher.index, field, terms)
    norm_col = F.col("norm_byte") if getattr(searcher.index, "quantized", True) else None
    kwargs = {}
    if searcher.sim.uses_coord:
        qn = searcher.sim.query_norm(searcher.sim.value_for_normalization(idf, 1.0))
        kwargs["query_norm"] = qn
    score = searcher.sim.score_col(
        F.col("freq").cast("double"), F.col("dlq"), norm_col, idf, avgdl, 1.0, **kwargs
    )
    return (
        frame.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _terms_query(field, terms):
    from .ast import BooleanClause, BooleanQuery, Occur

    return BooleanQuery(
        tuple(BooleanClause(TermQuery(field, t), Occur.MUST) for t in terms)
    )
