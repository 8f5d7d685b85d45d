"""Structured-Streaming incremental validation: AvailableNow catch-up
processes new files only, violations accumulate across triggers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hjsonschema_spark.checks import CheckSuite, Enum, Required
from hjsonschema_spark.sources import ROLE_VOCAB, TranscriptGen
from hjsonschema_spark.streaming import validate_stream

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
SUITE = CheckSuite(
    name="stream",
    key_columns=("conv_id", "turn_idx"),
    checks=(Required(column="role"), Enum(column="role", values=tuple(ROLE_VOCAB))),
)


def test_available_now_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    g1 = TranscriptGen(n_convs=100, seed=41, bad_role_rate=0.05, n_partitions=4)
    g1.df(spark).write.mode("append").parquet(inp)
    n_bad_1 = g1.df(spark).filter(~F.col("role").isin(ROLE_VOCAB)).count()
    assert n_bad_1 > 0

    validate_stream(spark, inp, SCHEMA_DDL, SUITE, out, ckpt)
    v1 = spark.read.parquet(f"{out}/violations")
    assert v1.count() == n_bad_1

    # second batch of files: only the NEW data is processed
    g2 = TranscriptGen(n_convs=100, seed=43, bad_role_rate=0.10, n_partitions=4)
    g2.df(spark).write.mode("append").parquet(inp)
    n_bad_2 = g2.df(spark).filter(~F.col("role").isin(ROLE_VOCAB)).count()

    validate_stream(spark, inp, SCHEMA_DDL, SUITE, out, ckpt)
    v2 = spark.read.parquet(f"{out}/violations")
    assert v2.count() == n_bad_1 + n_bad_2
    assert v2.select("batch_id").distinct().count() >= 2

    # third catch-up with nothing new: no additional violations
    validate_stream(spark, inp, SCHEMA_DDL, SUITE, out, ckpt)
    assert spark.read.parquet(f"{out}/violations").count() == n_bad_1 + n_bad_2

    verd = spark.read.parquet(f"{out}/verdicts")
    # every check gets a verdict row per batch; only enum:role failed
    assert {r["check"] for r in verd.collect()} == {"enum:role", "required:role"}
    assert {r["check"] for r in verd.filter("NOT passed").collect()} == {"enum:role"}
    assert verd.filter("check = 'required:role' AND NOT passed").count() == 0
