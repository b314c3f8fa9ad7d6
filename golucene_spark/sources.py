"""Corpus source resolution: one string names the input table, whatever
its storage (the north rule's input is an Iceberg table of source-code
repositories; CI/testdata are plain parquet — the engine is agnostic
because IndexBuilder takes a DataFrame).

Schemes:
  iceberg:<catalog.db.table>  spark.read.format("iceberg") — needs the
                              Iceberg Spark runtime on the classpath
                              (spark-submit --packages
                              org.apache.iceberg:iceberg-spark-runtime-*)
                              and a configured catalog; this sandbox
                              ships neither, so the scheme raises a
                              clear error here but is the production
                              path.
  parquet:<path>              spark.read.parquet
  table:<name>                spark.table (catalog-registered view)
  <path>                      parquet directory/file (default)

An Iceberg/catalog source also gives the build snapshot isolation for
free: resolve once with ``snapshot_id`` and every chunk of a resumed
build reads the same table version (the checkpoint/resume contract
assumes the input is immutable across attempts — with raw parquet
that's on the operator)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_corpus(spark: SparkSession, source: str,
                snapshot_id: int | None = None) -> DataFrame:
    if source.startswith("iceberg:"):
        name = source[len("iceberg:"):]
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        try:
            return reader.load(name)
        except Exception as e:  # pragma: no cover - depends on runtime jars
            raise RuntimeError(
                "Iceberg source requires the Iceberg Spark runtime on the "
                "classpath and a configured catalog (spark-submit "
                "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13 "
                "--conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog)"
            ) from e
    if source.startswith("parquet:"):
        return spark.read.parquet(source[len("parquet:"):])
    if source.startswith("table:"):
        return spark.table(source[len("table:"):])
    return spark.read.parquet(source)
