"""CLI integration tests: `python -m hjsonschema_spark` is the
filesystem-config entry point (fetchFilesystemAndValidate analogue,
src/JSONSchema/Draft4.hs:101-129) — suite JSON from disk, table in,
violations/verdicts tables + one JSON summary line out, exit code
reporting pass/fail/config-error."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*argv, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "hjsonschema_spark", *argv],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=cwd,
        env=env,
    )


@pytest.fixture(scope="module")
def table_path(spark, tmp_path_factory):
    from hjsonschema_spark.sources.transcripts import TranscriptGen

    p = str(tmp_path_factory.mktemp("cli") / "transcripts.parquet")
    TranscriptGen(n_convs=80, seed=3, bad_role_rate=0.1).df(spark).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def suite_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("suites")
    # root suite Refs a second suite file to exercise the fixpoint loader
    (d / "base_checks.json").write_text(
        json.dumps(
            {
                "name": "base_checks",
                "key_columns": ["conv_id", "turn_idx"],
                "checks": [
                    {"kind": "required", "column": "text"},
                    {
                        "kind": "enum",
                        "column": "role",
                        "values": ["system", "user", "assistant", "tool"],
                    },
                ],
            }
        )
    )
    root = d / "transcripts.json"
    root.write_text(
        json.dumps(
            {
                "name": "transcripts",
                "key_columns": ["conv_id", "turn_idx"],
                "checks": [
                    {"kind": "ref", "suite": "base_checks"},
                    {
                        "kind": "unique_key",
                        "columns": ["conv_id", "turn_idx"],
                    },
                ],
            }
        )
    )
    return str(root)


def test_validate_finds_violations_and_writes_outputs(table_path, suite_file, tmp_path, spark):
    out = str(tmp_path / "out")
    proc = _run_cli(
        "validate",
        "--table", table_path,
        "--suite", suite_file,
        "--out", out,
        "--cores", "4",
        cwd=tmp_path,
    )
    assert proc.returncode == 1, proc.stderr[-2000:]  # violations found
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["suite"] == "transcripts"
    assert summary["passed"] is False
    assert summary["by_check"].get("enum:role", 0) > 0
    # outputs written and readable
    viol = spark.read.parquet(os.path.join(out, "violations"))
    assert viol.count() == summary["n_violations"]
    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.filter("scope = 'check'").count() >= 3  # required+enum+unique


def test_validate_quarantine_outputs(table_path, suite_file, tmp_path, spark):
    """--quarantine writes clean/ + quarantine/: together they cover the
    input, clean rows keep the input schema, quarantined rows carry
    failure structs."""
    out = str(tmp_path / "outq")
    proc = _run_cli(
        "validate",
        "--table", table_path,
        "--suite", suite_file,
        "--out", out,
        "--quarantine",
        "--cores", "4",
        cwd=tmp_path,
    )
    assert proc.returncode == 1, proc.stderr[-2000:]
    src = spark.read.parquet(table_path)
    clean = spark.read.parquet(os.path.join(out, "clean"))
    quar = spark.read.parquet(os.path.join(out, "quarantine"))
    assert set(clean.columns) == set(src.columns)
    assert set(quar.columns) == set(src.columns) | {"_failures"}
    assert 0 < clean.count() < src.count()
    assert quar.count() > 0
    # quarantined rows genuinely failed a row check
    assert quar.filter("size(_failures) = 0").count() == 0


def test_validate_from_draft4_schema(table_path, tmp_path):
    """--schema: a raw draft-4 document compiled by suite_from_schema,
    self-validated against the meta-schema before any data is read."""
    doc = tmp_path / "transcripts_schema.json"
    doc.write_text(json.dumps({
        "type": "object",
        "required": ["conv_id", "turn_idx"],
        "properties": {
            "conv_id": {"type": "string"},
            "turn_idx": {"type": "integer", "minimum": 0},
            "role": {"enum": ["system", "user", "assistant", "tool"]},
            "text": {"type": "string"},
        },
    }))
    proc = _run_cli(
        "validate", "--table", table_path, "--schema", str(doc),
        "--key", "conv_id,turn_idx", "--unique-key", "--cores", "4",
        cwd=tmp_path,
    )
    assert proc.returncode == 1, proc.stderr[-2000:]
    summary = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["suite"] == "transcripts_schema"
    assert summary["by_check"].get("enum:role", 0) > 0

    # a document the meta-schema rejects => exit 2 before data is read
    bad = tmp_path / "bad_schema.json"
    bad.write_text(json.dumps({"type": "object",
                               "properties": {"x": {"type": 12}}}))
    proc = _run_cli(
        "validate", "--table", table_path, "--schema", str(bad),
        "--key", "conv_id", "--cores", "2",
        cwd=tmp_path,
    )
    assert proc.returncode == 2, (proc.stdout, proc.stderr[-1000:])
    err = json.loads(proc.stderr.strip().splitlines()[-1])
    assert err["error"] == "config_invalid" and "meta-schema" in err["detail"]


def test_validate_config_error_exit_2(table_path, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"name": "bad", "key_columns": ["conv_id"],
                               "checks": [{"kind": "ref", "suite": "missing_suite"}]}))
    proc = _run_cli(
        "validate", "--table", table_path, "--suite", str(bad), "--cores", "2",
        cwd=tmp_path,
    )
    assert proc.returncode == 2, (proc.stdout, proc.stderr[-1000:])
    err = json.loads(proc.stderr.strip().splitlines()[-1])
    assert err["error"] == "config_invalid"


def test_stats_subcommand(table_path, tmp_path):
    proc = _run_cli(
        "stats", "--table", table_path, "--columns", "role", "turn_idx",
        "--cores", "2",
        cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    cols = {r["column"] for r in out["stats"]}
    assert cols == {"role", "turn_idx"}
