"""Unit tests for the scaling-bench child runner (no Spark): the host
occasionally kills or hangs a child JVM mid-sample; the runner must
retry once with diagnostics and fail loudly after two attempts."""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _ok(payload):
    return subprocess.CompletedProcess(
        args=[], returncode=0, stdout=json.dumps(payload) + "\n", stderr=""
    )


def _dead():
    return subprocess.CompletedProcess(
        args=[], returncode=-9, stdout="", stderr="jvm killed\n"
    )


def test_child_success_first_try(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _ok({"turns_per_sec": 1.0}))
    assert bench._run_scaling_child([], {}, 8) == {"turns_per_sec": 1.0}


def test_child_retries_after_kill(bench, monkeypatch, capsys):
    calls = iter([_dead(), _ok({"turns_per_sec": 2.0})])
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: next(calls))
    assert bench._run_scaling_child([], {}, 32) == {"turns_per_sec": 2.0}
    assert "jvm killed" in capsys.readouterr().err


def test_child_retries_after_hang(bench, monkeypatch):
    state = {"n": 0}

    def fake_run(*a, **k):
        state["n"] += 1
        if state["n"] == 1:
            raise subprocess.TimeoutExpired(cmd=[], timeout=k.get("timeout"), stderr=b"stuck")
        return _ok({"turns_per_sec": 3.0})

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_scaling_child([], {}, 32, timeout=1) == {"turns_per_sec": 3.0}


def test_child_fails_twice_raises(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _dead())
    with pytest.raises(RuntimeError, match="failed twice"):
        bench._run_scaling_child([], {}, 8)


def test_sys_executable_untouched():
    # sanity: module import above must not have started Spark or
    # mutated interpreter state
    assert "pyspark" not in sys.argv
