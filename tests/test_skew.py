"""Skew utilities: salted two-stage aggregation must agree with the
plain aggregation and spread hot keys over many reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from hjsonschema_spark.functions.skew import salted_agg, salted_count, with_salt


def _skewed(spark):
    # one white-hot key (80% of rows) + a long tail
    hot = spark.range(0, 80_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    tail = spark.range(0, 20_000).select(
        F.concat(F.lit("k"), (F.col("id") % 500).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(tail)


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"], buckets=32).collect()}
    assert salted == plain
    assert salted["hot"] == 80_000


def test_salted_agg_sum_min_max(spark):
    df = _skewed(spark)
    got = salted_agg(
        df,
        ["k"],
        [F.sum("v").alias("_s"), F.min("v").alias("_mn"), F.max("v").alias("_mx")],
        [F.sum("_s").alias("s"), F.min("_mn").alias("mn"), F.max("_mx").alias("mx")],
        buckets=16,
    )
    want = df.groupBy("k").agg(F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx"))
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    salted = with_salt(df, ["k"], buckets=32)
    spread = (
        salted.filter("k = 'hot'").select("_salt").distinct().count()
    )
    assert spread >= 24  # hot key lands on most of the 32 sub-groups