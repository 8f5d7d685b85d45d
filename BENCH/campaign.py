"""Opportunistic scaling-evidence campaign.

The north rule needs throughput scaling efficiency >= 0.8 (N -> 4N),
demonstrated repeatably. On this shared VM, clean windows are rare and
unpredictable (see BENCH/BASELINE.md control history), so the campaign
loops paired scaling samples back-to-back for hours: each iteration
runs the 30s host probe (logged for exoneration, not used as a hard
gate — the paired harness carries its own per-pair hardware control)
and then one `bench.py --scaling --paired` invocation with
SPARK_GRAFT_SCALING_PAIRS pairs. Clean pairs surface on their own when
the host gives a clean ~15-min window; dirty pairs still contribute
normalized-efficiency evidence (engine vs control in the same minutes).

Stops when:
- /root/repo/BENCH/STOP_CAMPAIGN exists (touch it to stop), or
- `--max-iters K` iterations have run (default 14), or
- the success criterion is met: >= SUCCESS_PAIRS pairs across the
  campaign with raw efficiency >= 0.8, or with (control >= 0.85 and
  normalized >= 1.0).

Usage: python BENCH/campaign.py [--max-iters K] [--pairs-per-iter P]
Never run any other Spark session while this is alive (CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "BENCH")
STOP = os.path.join(BENCH, "STOP_CAMPAIGN")
LOG = os.path.join(BENCH, "campaign_log.jsonl")
SAMPLES = os.path.join(BENCH, "scaling_samples.jsonl")
SUCCESS_PAIRS = 3


def _log(rec: dict) -> None:
    rec["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _probe() -> dict:
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(BENCH, "host_probe.py")],
            capture_output=True, text=True, timeout=180,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])
    except Exception as e:  # probe failure is not fatal to the campaign
        return {"error": str(e)[:200]}


PAIR_SAMPLES = os.path.join(BENCH, "pair_samples.jsonl")


def _qualifies(e, c) -> bool:
    return e is not None and (
        e >= 0.8 or (c is not None and c >= 0.85 and e / c >= 1.0)
    )


def _clean_pairs_so_far(since_ts: float) -> int:
    """Count qualifying pairs since the epoch (raw >= 0.8, or ctl >=
    0.85 with norm >= 1.0). Primary source: pair_samples.jsonl (one
    line per pair, written the moment the pair completes — survives a
    killed invocation). Legacy source: scaling_samples.jsonl pair_effs
    arrays, counted only BEFORE the first pair_samples timestamp so a
    pair is never double-counted (every pair since the per-pair log
    exists appears in both files)."""
    n = 0
    first_pair_ts = float("inf")
    try:
        with open(PAIR_SAMPLES) as f:
            for line in f:
                s = json.loads(line)
                first_pair_ts = min(first_pair_ts, s.get("ts", float("inf")))
                if s.get("ts", 0) >= since_ts and _qualifies(s.get("eff"), s.get("ctl_eff")):
                    n += 1
    except FileNotFoundError:
        pass
    try:
        with open(SAMPLES) as f:
            for line in f:
                s = json.loads(line)
                if not (since_ts <= s.get("ts", 0) < first_pair_ts):
                    continue
                effs = s.get("pair_effs") or [s.get("efficiency")]
                ctls = s.get("pair_ctl_effs") or [s.get("control_efficiency")]
                for e, c in zip(effs, ctls):
                    if _qualifies(e, c):
                        n += 1
    except FileNotFoundError:
        pass
    return n


def main() -> int:
    max_iters = 14
    pairs = "1"
    # rand_eff pre-gate OFF by default (round-5 probe-vs-regime study,
    # PLANS.md: over all 10 probe-carrying attempts rand_eff is
    # ANTI-correlated with the engine's actual regime — its two
    # cleanest readings preceded stalls — and no probe beats the base
    # rate at any non-degenerate threshold). Sleeping 120s on a
    # non-signal is strictly worse than letting the engine gate abort
    # a stalled attempt in ~7 min. Set a value to re-enable.
    rand_gate = "0"
    argv = sys.argv[1:]
    if "--max-iters" in argv:
        max_iters = int(argv[argv.index("--max-iters") + 1])
    if "--pairs-per-iter" in argv:
        pairs = argv[argv.index("--pairs-per-iter") + 1]
    if "--rand-gate" in argv:
        rand_gate = argv[argv.index("--rand-gate") + 1]
    t_start = time.time()
    # --since TS: count qualifying pairs from an earlier epoch (e.g.
    # the round start) so a relaunched campaign does not forget pairs
    # already banked by a previous invocation this round.
    t_count = t_start
    if "--since" in argv:
        t_count = float(argv[argv.index("--since") + 1])
    _log(
        {
            "event": "campaign_start", "max_iters": max_iters,
            "pairs_per_iter": pairs, "rand_gate": rand_gate,
        }
    )
    for i in range(max_iters):
        if os.path.exists(STOP):
            _log({"event": "stopped_by_file", "iter": i})
            break
        got = _clean_pairs_so_far(t_count)
        if got >= SUCCESS_PAIRS:
            _log({"event": "success", "clean_pairs": got, "iter": i})
            break
        probe = _probe()
        _log({"event": "probe", "iter": i, **probe})
        env = dict(
            os.environ,
            SPARK_GRAFT_SCALING_PAIRS=pairs,
            SPARK_GRAFT_PAIR_GATE_RAND=os.environ.get(
                "SPARK_GRAFT_PAIR_GATE_RAND", rand_gate
            ),
        )
        t0 = time.time()
        # Timeout headroom: pairs (~18 min each) + the per-pair
        # clean-window gate (<= 25 min wait each) can stack; a
        # TimeoutExpired must degrade to a logged failed iteration,
        # never kill the campaign loop.
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling", "--paired"],
                env=env, capture_output=True, text=True, timeout=14400,
            )
            rc, out, err = p.returncode, p.stdout, p.stderr
        except subprocess.TimeoutExpired as e:
            rc, out, err = -9, (e.stdout or ""), f"campaign-level timeout: {e}"
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
        lines = [l for l in out.strip().splitlines() if l.startswith("{")]
        sample = json.loads(lines[-1]) if (rc == 0 and lines) else None
        _log(
            {
                "event": "sample",
                "iter": i,
                "rc": rc,
                "wall_min": round((time.time() - t0) / 60, 1),
                "pair_effs": sample and sample.get("pair_effs"),
                "pair_ctl_effs": sample and sample.get("pair_ctl_effs"),
                "stderr_tail": None if sample else (err or "")[-800:],
            }
        )
    got = _clean_pairs_so_far(t_count)
    _log({"event": "campaign_end", "clean_pairs": got, "wall_min": round((time.time() - t_start) / 60, 1)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
