"""Chaos/recovery tests for the two-phase checkpoint ledger (round-4
VERDICT item 7): a run killed between the 'started' and 'done' commit
phases — or whose ledger files are later truncated/corrupted — must
resume with neither a skipped nor a double-validated partition, and
``violations()`` must equal the single-shot run byte-for-byte on the
(conv_id, turn_idx, check) key set.

The crash states are constructed on disk exactly as a SIGKILL would
leave them (a 'started' row with no 'done', orphan violation rows
tagged with a batch_id that never committed, a ledger part file cut
mid-stream) — same bytes, deterministic instead of racy.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from hjsonschema_spark.checks import CheckSuite, Enum, Length, Required, run_suite
from hjsonschema_spark.checks.checkpoint import CheckpointedRun, check_version
from hjsonschema_spark.sources import ROLE_VOCAB, TranscriptGen

SUITE = CheckSuite(
    name="chaos",
    key_columns=("conv_id", "turn_idx"),
    checks=(
        Required(column="role"),
        Enum(column="role", values=tuple(ROLE_VOCAB)),
        Length(column="text", max_len=4000),
    ),
)


@pytest.fixture(scope="module")
def input_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("chaos") / "transcripts")
    TranscriptGen(
        n_convs=200, seed=47, bad_role_rate=0.03, long_text_rate=0.01, n_partitions=6
    ).df(spark).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def want(spark, input_path):
    ref = run_suite(spark.read.parquet(input_path), SUITE)
    keys = {(r["conv_id"], r["turn_idx"], r["check"]) for r in ref.violations.collect()}
    assert keys, "fixture must produce violations"
    return keys


def _got(spark, store):
    return {
        (r["conv_id"], r["turn_idx"], r["check"])
        for r in store.violations(spark).collect()
    }


def test_crash_after_started_before_violations(spark, input_path, tmp_path, want):
    """Kill window 1: the 'started' row landed, no violations written.
    Resume must REPROCESS that file (a 'started'-only batch is not
    evidence of completion) and converge to the single-shot result."""
    store = CheckpointedRun(str(tmp_path / "store"))
    first = store.run(spark, input_path, SUITE, files_per_batch=1, max_batches=1)
    assert first["batches"] == 1
    # crash state: batch 2 got its phase-1 row and died
    all_files = sorted(spark.read.parquet(input_path).inputFiles())
    crashed = [f for f in all_files if f not in store.completed_files(spark, first["check_version"])][0]
    store._append_ckpt(
        spark, uuid.uuid4().hex[:12], "deadrun", SUITE.name,
        first["check_version"], [crashed], None, None, None, "started",
    )
    resumed = store.run(spark, input_path, SUITE, files_per_batch=1)
    # not skipped: only batch 1's file counts as done
    assert resumed["skipped_files"] == 1
    assert resumed["remaining_files"] == 0
    assert _got(spark, store) == want
    # the crashed file was validated exactly once on resume
    ck = store.checkpoints(spark)
    done_manifests = [
        f for r in ck.filter("status = 'done'").collect() for f in r["file_manifest"]
    ]
    assert done_manifests.count(crashed) == 1
    assert len(done_manifests) == len(set(done_manifests)) == len(all_files)


def test_crash_after_violations_before_done(spark, input_path, tmp_path, want):
    """Kill window 2: violations fully written, 'done' never landed.
    The orphan rows must stay invisible to violations() and the batch
    must be re-validated — no skip, no double-count."""
    store = CheckpointedRun(str(tmp_path / "store"))
    first = store.run(spark, input_path, SUITE, files_per_batch=1, max_batches=1)
    version = first["check_version"]
    all_files = sorted(spark.read.parquet(input_path).inputFiles())
    crashed = [f for f in all_files if f not in store.completed_files(spark, version)][0]
    # crash state: phase-1 row + the batch's full violations, no 'done'
    orphan_batch = uuid.uuid4().hex[:12]
    store._append_ckpt(
        spark, orphan_batch, "deadrun", SUITE.name, version,
        [crashed], None, None, None, "started",
    )
    res = run_suite(spark.read.parquet(crashed), SUITE)
    res.violations.withColumn("batch_id", F.lit(orphan_batch)).withColumn(
        "run_id", F.lit("deadrun")
    ).write.mode("append").parquet(store._viol_path)
    n_orphans = res.violations.count()

    resumed = store.run(spark, input_path, SUITE, files_per_batch=1)
    assert resumed["skipped_files"] == 1  # only batch 1; the orphan doesn't count
    assert _got(spark, store) == want  # set equality: no skip
    # multiset check: the orphan rows are excluded, not deduplicated away
    committed = store.violations(spark)
    assert committed.count() == len(want) or n_orphans == 0
    assert committed.filter(F.col("batch_id") == orphan_batch).count() == 0


def test_ledger_corruption_recovers(spark, input_path, tmp_path, want):
    """Kill window 3: the ledger itself is damaged (truncated part
    file, garbage bytes — what a dying writer or disk leaves). Reads
    must skip the unreadable parts; every batch whose 'done' row was
    lost is re-validated, its old violations orphaned; the final
    violation set still equals the single-shot run."""
    store = CheckpointedRun(str(tmp_path / "store"))
    store.run(spark, input_path, SUITE, files_per_batch=2)
    assert _got(spark, store) == want

    ckpt_dir = store._ckpt_path
    parts = sorted(
        f for f in os.listdir(ckpt_dir) if f.endswith(".parquet") and f.startswith("part-")
    )
    assert parts
    # truncate one real ledger file mid-stream + drop in pure garbage
    victim = os.path.join(ckpt_dir, parts[0])
    with open(victim, "r+b") as f:
        f.truncate(max(os.path.getsize(victim) // 2, 8))
    with open(os.path.join(ckpt_dir, "part-garbage.parquet"), "wb") as f:
        f.write(b"\x00not a parquet file\x00")

    # reads survive the damage (and still see the intact 'done' rows)
    survivors = store.completed_files(spark, check_version(SUITE))
    assert isinstance(survivors, set)
    # resume: lost-'done' batches re-validate; nothing double-counts
    store.run(spark, input_path, SUITE, files_per_batch=2)
    assert _got(spark, store) == want
    ck = store.checkpoints(spark)
    # every input file has EXACTLY one surviving readable 'done' row
    all_files = sorted(spark.read.parquet(input_path).inputFiles())
    done_manifests = [
        f for r in ck.filter("status = 'done'").collect() for f in r["file_manifest"]
    ]
    assert sorted(set(done_manifests)) == all_files
    assert len(done_manifests) == len(set(done_manifests))
