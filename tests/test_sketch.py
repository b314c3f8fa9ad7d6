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


def test_cms_upper_bound_and_merge(spark):
    from golucene_spark.sketch import cms_build, cms_estimate
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("hot", 100), ("warm", 10), ("cold", 1)], "term string, freq long"
    )
    cms = cms_build(df, "term", weight_col="freq", depth=4, width=64)
    est = {r["term"]: r["est"]
           for r in cms_estimate(cms, ["hot", "warm", "cold", "never"], depth=4, width=64).collect()}
    assert est["hot"] >= 100 and est["warm"] >= 10 and est["cold"] >= 1  # upper bounds
    assert est["hot"] <= 111  # total mass caps any bucket
    # merge = union + re-sum
    a = cms_build(df, "term", weight_col="freq", depth=4, width=64)
    merged = (a.unionByName(cms).groupBy("r", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    est2 = {r["term"]: r["est"]
            for r in cms_estimate(merged, ["hot"], depth=4, width=64).collect()}
    assert est2["hot"] == 2 * est["hot"]
