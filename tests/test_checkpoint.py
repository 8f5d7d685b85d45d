"""Checkpoint/resume: an interrupted run must resume where it stopped,
and the union of violations must equal the single-shot run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hjsonschema_spark.checks import CheckSuite, Enum, Length, Required, run_suite
from hjsonschema_spark.checks.checkpoint import CheckpointedRun, check_version
from hjsonschema_spark.sources import ROLE_VOCAB, TranscriptGen

SUITE = CheckSuite(
    name="ckpt",
    key_columns=("conv_id", "turn_idx"),
    checks=(
        Required(column="role"),
        Enum(column="role", values=tuple(ROLE_VOCAB)),
        Length(column="text", max_len=4000),
    ),
)


@pytest.fixture(scope="module")
def input_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ckpt") / "transcripts")
    TranscriptGen(n_convs=300, seed=31, bad_role_rate=0.02, long_text_rate=0.01, n_partitions=12).df(
        spark
    ).write.parquet(p)
    return p


def test_interrupt_and_resume(spark, input_path, tmp_path):
    store = CheckpointedRun(str(tmp_path / "store"))
    # simulate interruption: only 2 batches of 3 files each
    first = store.run(spark, input_path, SUITE, files_per_batch=3, max_batches=2)
    assert first["batches"] == 2 and first["remaining_files"] > 0
    ck = store.checkpoints(spark)
    # two-phase commit: one 'started' + one 'done' row per batch
    assert ck.filter("status = 'done'").count() == 2
    assert ck.filter("status = 'started'").count() == 2
    # resume: completes the rest, skips the 6 done files
    second = store.run(spark, input_path, SUITE, files_per_batch=3)
    assert second["skipped_files"] == 6
    assert second["remaining_files"] == 0
    # union of checkpointed violations == single-shot run
    got = {
        (r["conv_id"], r["turn_idx"], r["check"])
        for r in store.violations(spark).collect()
    }
    ref = run_suite(spark.read.parquet(input_path), SUITE)
    want = {(r["conv_id"], r["turn_idx"], r["check"]) for r in ref.violations.collect()}
    assert got == want and len(want) > 0
    # lineage rows carry manifest + metrics
    rows = store.checkpoints(spark).collect()
    assert all(r["n_files"] == len(r["file_manifest"]) for r in rows)
    done = [r for r in rows if r["status"] == "done"]
    assert done and all(r["wall_sec"] > 0 and r["n_rows"] > 0 for r in done)
    assert {r["check_version"] for r in rows} == {check_version(SUITE)}


def test_changed_suite_invalidates_progress(spark, input_path, tmp_path):
    store = CheckpointedRun(str(tmp_path / "store2"))
    store.run(spark, input_path, SUITE, files_per_batch=100)
    changed = CheckSuite(
        name="ckpt", key_columns=("conv_id", "turn_idx"),
        checks=SUITE.checks + (Required(column="ts"),),
    )
    out = store.run(spark, input_path, changed, files_per_batch=100)
    assert out["skipped_files"] == 0 and out["batches"] == 1  # full re-run


def test_noop_when_everything_done(spark, input_path, tmp_path):
    store = CheckpointedRun(str(tmp_path / "store3"))
    store.run(spark, input_path, SUITE, files_per_batch=100)
    again = store.run(spark, input_path, SUITE, files_per_batch=100)
    assert again["batches"] == 0 and again["n_rows"] == 0


def test_crash_between_violations_and_done_does_not_duplicate(spark, input_path, tmp_path):
    """Crash window: violations written but no 'done' row. The resumed
    run reprocesses the batch; violations() must still equal the
    single-shot result (orphan rows filtered out by batch_id)."""
    store = CheckpointedRun(str(tmp_path / "store4"))
    store.run(spark, input_path, SUITE, files_per_batch=3, max_batches=1)
    # simulate the crash: demote the batch's 'done' row to an orphan by
    # replaying its violations under a fresh batch_id with no checkpoint
    orphan = store.violations(spark).withColumn("batch_id", F.lit("deadbeef0000"))
    orphan.write.mode("append").parquet(store._viol_path)
    store.run(spark, input_path, SUITE, files_per_batch=3)  # finish the rest
    got = {
        (r["conv_id"], r["turn_idx"], r["check"])
        for r in store.violations(spark).collect()
    }
    ref = run_suite(spark.read.parquet(input_path), SUITE)
    want = {(r["conv_id"], r["turn_idx"], r["check"]) for r in ref.violations.collect()}
    assert got == want
    # the orphan rows exist on disk but are invisible to readers
    raw = spark.read.parquet(store._viol_path)
    assert raw.filter("batch_id = 'deadbeef0000'").count() > 0


def test_capped_violation_writes(spark, input_path, tmp_path):
    """max_violations_per_check bounds what lands in the violations
    store per batch while checkpoint rows keep exact counts."""
    store = CheckpointedRun(str(tmp_path / "store_cap"))
    cap = 5
    totals = store.run(
        spark, input_path, SUITE, files_per_batch=100, max_violations_per_check=cap
    )
    written = store.violations(spark)
    per_check = {
        r["check"]: r["n"]
        for r in written.groupBy("check").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_check and all(n <= cap for n in per_check.values())
    # exact totals in the checkpoint metrics, not the capped count
    ck_total = (
        store.checkpoints(spark).filter("status = 'done'").agg(F.sum("n_violations")).first()[0]
    )
    assert totals["n_violations"] == ck_total
    assert ck_total > cap  # the generator injects more than cap violations
