"""KMV distinct sketch: accuracy, determinism, mergeability, exact
fallback below k."""

import pytest

from golucene_spark.sketch import kmv_distinct, kmv_hashes


def test_estimate_accuracy_and_determinism(spark):
    n = 5000
    df = spark.createDataFrame([(f"value-{i % 2000}",) for i in range(n)], "text string")
    r1 = kmv_distinct(df, "text", k=256).collect()[0]
    r2 = kmv_distinct(df, "text", k=256).collect()[0]
    assert r1 == r2                                   # seedless -> reproducible
    est = r1["estimate_e6"] / 1e6
    assert est == pytest.approx(2000, rel=0.15)       # ~1/sqrt(k) error


def test_exact_below_k(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(40)], "text string")
    r = kmv_distinct(df, "text", k=256).collect()[0]
    assert r["n_kept"] == 40 and r["estimate_e6"] == 40_000_000


def test_merge_is_klimit_of_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "text string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "text string")
    merged = (
        kmv_hashes(a, "text", 64).unionByName(kmv_hashes(b, "text", 64))
        .distinct().orderBy("h").limit(64).collect()
    )
    direct = kmv_hashes(a.unionByName(b), "text", 64).collect()
    assert [r["h"] for r in merged] == [r["h"] for r in direct]
