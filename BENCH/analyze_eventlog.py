"""Offline stage-level analysis of a scaling child's Spark event log.

Answers WHERE a local[N] run spends its wall: per-stage walls vs
aggregate task time (parallelism actually achieved), executor compute
vs GC vs shuffle/serialization, straggler spread (max task vs median),
and the driver-side gaps no stage covers (scheduling, Catalyst/AQE
planning, py4j chatter) — the serial term Amdahl charges at 4N.

Usage:
  python BENCH/analyze_eventlog.py /tmp/spark_graft_eventlogs/<app-id> [--json]

The log is newline-delimited JSON (one SparkListener event per line).
Only stdlib is used; safe to run while no Spark session is alive.
"""
from __future__ import annotations

import json
import sys
from collections import defaultdict


def _read_text(path: str) -> str:
    if path.endswith(".zstd"):
        import subprocess

        return subprocess.run(
            ["zstd", "-dc", path], capture_output=True, text=True, check=False
        ).stdout
    with open(path) as f:
        return f.read()


def load(path: str) -> list[dict]:
    # Accept either a single event-log file or a rolling (v2) log dir
    # containing events_<n>_<appid>[.codec] parts.
    import os

    paths = [path]
    if os.path.isdir(path):
        parts = sorted(
            p for p in os.listdir(path) if p.startswith("events_")
        )
        paths = [os.path.join(path, p) for p in parts]
    evs = []
    for p in paths:
        for line in _read_text(p).splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                evs.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn final line of a live log
    return evs


def analyze(path: str) -> dict:
    evs = load(path)
    stages: dict[tuple, dict] = {}
    # task metric sums per (stage_id, attempt)
    tmetrics: dict[tuple, dict] = defaultdict(
        lambda: {
            "n_tasks": 0,
            "task_time_ms": 0.0,
            "gc_ms": 0.0,
            "cpu_ms": 0.0,
            "deser_ms": 0.0,
            "ser_ms": 0.0,
            "shuffle_write_ms": 0.0,
            "shuffle_fetch_wait_ms": 0.0,
            "max_task_ms": 0.0,
            "task_walls": [],
        }
    )
    jobs: list[dict] = []
    app_start = app_end = None
    for e in evs:
        ev = e.get("Event", "")
        if ev == "SparkListenerApplicationStart":
            app_start = e.get("Timestamp")
        elif ev == "SparkListenerApplicationEnd":
            app_end = e.get("Timestamp")
        elif ev == "SparkListenerJobStart":
            jobs.append(
                {
                    "job_id": e.get("Job ID"),
                    "t0": e.get("Submission Time"),
                    "t1": None,
                    "stage_ids": e.get("Stage IDs", []),
                }
            )
        elif ev == "SparkListenerJobEnd":
            jid = e.get("Job ID")
            for j in jobs:
                if j["job_id"] == jid:
                    j["t1"] = e.get("Completion Time")
        elif ev == "SparkListenerStageCompleted":
            si = e.get("Stage Info", {})
            key = (si.get("Stage ID"), si.get("Stage Attempt ID"))
            stages[key] = {
                "name": (si.get("Stage Name") or "")[:60],
                "n_tasks": si.get("Number of Tasks"),
                "t0": si.get("Submission Time"),
                "t1": si.get("Completion Time"),
            }
        elif ev == "SparkListenerTaskEnd":
            key = (e.get("Stage ID"), e.get("Stage Attempt ID"))
            ti = e.get("Task Info", {})
            tm = e.get("Task Metrics") or {}
            m = tmetrics[key]
            wall = (ti.get("Finish Time") or 0) - (ti.get("Launch Time") or 0)
            m["n_tasks"] += 1
            m["task_time_ms"] += wall
            m["task_walls"].append(wall)
            m["max_task_ms"] = max(m["max_task_ms"], wall)
            m["gc_ms"] += tm.get("JVM GC Time", 0)
            m["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6  # ns -> ms
            m["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            m["ser_ms"] += tm.get("Result Serialization Time", 0)
            sw = tm.get("Shuffle Write Metrics") or {}
            m["shuffle_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
            sr = tm.get("Shuffle Read Metrics") or {}
            m["shuffle_fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)

    rows = []
    for key, s in sorted(stages.items()):
        m = tmetrics.get(key, None)
        wall = ((s["t1"] or 0) - (s["t0"] or 0)) / 1e3
        walls = sorted(m["task_walls"]) if m else []
        med = walls[len(walls) // 2] / 1e3 if walls else 0.0
        rows.append(
            {
                "stage": key[0],
                "name": s["name"],
                "wall_s": round(wall, 2),
                "n_tasks": s["n_tasks"],
                "task_sum_s": round(m["task_time_ms"] / 1e3, 1) if m else 0.0,
                "eff_par": round(m["task_time_ms"] / 1e3 / wall, 1)
                if m and wall > 0
                else None,  # achieved parallelism = task-time / stage-wall
                "gc_s": round(m["gc_ms"] / 1e3, 2) if m else 0.0,
                "cpu_frac": round(m["cpu_ms"] / m["task_time_ms"], 2)
                if m and m["task_time_ms"]
                else None,
                "max_task_s": round(m["max_task_ms"] / 1e3, 2) if m else 0.0,
                "med_task_s": round(med, 2),
                "fetch_wait_s": round(m["shuffle_fetch_wait_ms"] / 1e3, 2)
                if m
                else 0.0,
            }
        )

    # Driver-side gaps: wall not covered by any stage, within each job
    # and between consecutive jobs.
    jobs = [j for j in jobs if j["t0"] and j["t1"]]
    jobs.sort(key=lambda j: j["t0"])
    gaps = []
    for a, b in zip(jobs, jobs[1:]):
        g = (b["t0"] - a["t1"]) / 1e3
        if g > 0.05:
            gaps.append({"after_job": a["job_id"], "gap_s": round(g, 2)})
    job_wall = sum((j["t1"] - j["t0"]) / 1e3 for j in jobs)
    stage_walls = sum(r["wall_s"] for r in rows)
    return {
        "path": path,
        "app_wall_s": round(((app_end or 0) - (app_start or 0)) / 1e3, 1)
        if app_start and app_end
        else None,
        "n_jobs": len(jobs),
        "job_wall_sum_s": round(job_wall, 1),
        "stage_wall_sum_s": round(stage_walls, 1),
        "inter_job_gaps_s": round(sum(g["gap_s"] for g in gaps), 1),
        "biggest_gaps": sorted(gaps, key=lambda g: -g["gap_s"])[:8],
        "stages_by_wall": sorted(rows, key=lambda r: -r["wall_s"])[:14],
    }


def main() -> int:
    path = sys.argv[1]
    out = analyze(path)
    if "--json" in sys.argv:
        print(json.dumps(out))
        return 0
    print(f"== {path}")
    print(
        f"app_wall={out['app_wall_s']}s  jobs={out['n_jobs']} "
        f"(sum {out['job_wall_sum_s']}s)  stage_wall_sum={out['stage_wall_sum_s']}s  "
        f"inter-job gaps={out['inter_job_gaps_s']}s"
    )
    for g in out["biggest_gaps"]:
        print(f"  gap {g['gap_s']}s after job {g['after_job']}")
    hdr = (
        f"{'stage':>5} {'wall':>7} {'tasks':>5} {'par':>5} {'gc':>6} "
        f"{'cpu%':>5} {'max_t':>6} {'med_t':>6} {'fetchw':>6}  name"
    )
    print(hdr)
    for r in out["stages_by_wall"]:
        print(
            f"{r['stage']:>5} {r['wall_s']:>7} {r['n_tasks']:>5} "
            f"{r['eff_par'] if r['eff_par'] is not None else '-':>5} "
            f"{r['gc_s']:>6} "
            f"{int((r['cpu_frac'] or 0) * 100):>4}% {r['max_task_s']:>6} "
            f"{r['med_task_s']:>6} {r['fetch_wait_s']:>6}  {r['name']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
