"""Deployment-path integration test: the north rule runs the engine
"via spark-submit --py-files" on a cluster. This test exercises that
exact surface: build dist/hjsonschema_spark.zip with package_pyfiles,
then spark-submit a driver script from a scratch cwd (so the package
is importable ONLY from the zip shipped with --py-files) and assert
the job validates a generated transcript table end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import json
from hjsonschema_spark.sources.transcripts import TranscriptGen
from hjsonschema_spark.checks import (
    CheckSuite, Contiguous, Enum, Required, UniqueKey, run_suite,
)
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
df = TranscriptGen(n_convs=100, seed=11, bad_role_rate=0.1).df(spark)
suite = CheckSuite(
    name="submit_smoke",
    key_columns=("conv_id", "turn_idx"),
    checks=(
        Required(column="text"),
        Enum(column="role", values=("system", "user", "assistant", "tool")),
        UniqueKey(columns=("conv_id", "turn_idx")),
        Contiguous(order_column="turn_idx", group_by=("conv_id",), start=0),
    ),
)
res = run_suite(df, suite, persist=True)
summary = res.summary()
res.unpersist()
print("SUBMIT_RESULT " + json.dumps(summary, sort_keys=True))
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_with_pyfiles_zip(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "hjsonschema_spark.zip")
    assert os.path.exists(zip_path)

    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = dict(os.environ)
    # scrub any path that could resolve the package outside the zip
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            str(job),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert lines, proc.stdout[-3000:]
    summary = json.loads(lines[0][len("SUBMIT_RESULT ") :])
    assert summary["suite"] == "submit_smoke"
    # bad_role_rate=0.1 guarantees enum violations; the generator's
    # clean keys guarantee unique/contiguous stay quiet
    assert summary["by_check"].get("enum:role", 0) > 0
    assert summary["n_violations"] == summary["by_check"]["enum:role"]
