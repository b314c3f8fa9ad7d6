"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: BM25 boolean search over sf0.001 documents via
               the full engine (standard UAX#29 analyzer).
queries()    — one entry per implemented operator (SURVEY.md §2),
               each exactly mirrored by oracle_sql() in DuckDB.
oracle_sql() — ANSI-SQL twins (see golucene_spark/gate.py for the
               bit-for-bit mirroring rules).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from golucene_spark.index import CorpusSpec, LogicalIndex
    from golucene_spark.search import Searcher, parse_query

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ix = LogicalIndex(docs, CorpusSpec.documents(), analyzer="standard")
    s = Searcher(ix, "bm25")
    q = parse_query("text:data OR text:table AND NOT text:slow", default_field="text")
    return s.search(q, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from golucene_spark.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from golucene_spark.gate import ORACLES

    return dict(ORACLES)
