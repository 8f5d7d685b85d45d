"""Per-pair scaling report: joins each paired sample's pair_effs with
its per-pair host probes (pair_probes, recorded since the round-3
harness change) and prints one row per pair, plus rank correlations of
pair efficiency vs each probe metric once >= 4 probed pairs exist.

Purpose: decide whether the random-gather probe (host_probe.py
rand_eff) predicts the memory-stall regime in which 32-thread engine
runs inflate ~2x — and if so, at what threshold to set
SPARK_GRAFT_PAIR_GATE_RAND for future campaigns.

Usage: python BENCH/pair_report.py [--since TS]
"""
from __future__ import annotations

import json
import os
import sys
import time

SAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_samples.jsonl")
PAIR_SAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pair_samples.jsonl")


def _rank(xs: list[float]) -> list[float]:
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    r = [0.0] * len(xs)
    for rank, i in enumerate(order):
        r[i] = float(rank)
    return r


def spearman(xs: list[float], ys: list[float]) -> float | None:
    if len(xs) < 4 or len(set(xs)) < 2 or len(set(ys)) < 2:
        return None
    rx, ry = _rank(xs), _rank(ys)
    mx = sum(rx) / len(rx)
    my = sum(ry) / len(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    return num / den if den else None


def main() -> int:
    since = 0.0
    if "--since" in sys.argv:
        since = float(sys.argv[sys.argv.index("--since") + 1])
    rows = []
    # primary: the per-pair log (one line per pair the moment it
    # completes; survives killed invocations)
    first_pair_ts = float("inf")
    try:
        with open(PAIR_SAMPLES) as f:
            for line in f:
                s = json.loads(line)
                first_pair_ts = min(first_pair_ts, s.get("ts", float("inf")))
                if s.get("ts", 0) < since:
                    continue
                # aborted pair ATTEMPTS (engine-gated pairing) are not
                # pairs — no efficiency was measured
                if s.get("aborted"):
                    continue
                p = s.get("probe")
                rows.append(
                    {
                        "ts": s["ts"],
                        "eff": s.get("eff"),
                        "ctl": s.get("ctl_eff"),
                        "compute": p and p.get("compute_eff"),
                        "bw": p and p.get("bandwidth_eff"),
                        "rand": p and p.get("rand_eff"),
                    }
                )
    except FileNotFoundError:
        pass
    # legacy: pair arrays embedded in invocation-end samples, counted
    # only before the per-pair log existed (no double counting)
    with open(SAMPLES) as f:
        for line in f:
            s = json.loads(line)
            if s.get("ts", 0) < since or not s.get("paired") or s.get("ts", 0) >= first_pair_ts:
                continue
            effs = s.get("pair_effs") or []
            ctls = s.get("pair_ctl_effs") or [None] * len(effs)
            probes = s.get("pair_probes") or [None] * len(effs)
            for k, e in enumerate(effs):
                p = probes[k] if k < len(probes) else None
                rows.append(
                    {
                        "ts": s["ts"],
                        "eff": e,
                        "ctl": ctls[k] if k < len(ctls) else None,
                        "compute": p and p.get("compute_eff"),
                        "bw": p and p.get("bandwidth_eff"),
                        "rand": p and p.get("rand_eff"),
                    }
                )
    rows.sort(key=lambda r: r["ts"])
    print(f"{'when':16} {'eff':>6} {'ctl':>6} {'compute':>8} {'bw':>6} {'rand':>6}")
    for r in rows:
        when = time.strftime("%m-%d %H:%M", time.localtime(r["ts"]))
        fmt = lambda v: f"{v:.3f}" if isinstance(v, (int, float)) else "-"
        print(
            f"{when:16} {fmt(r['eff']):>6} {fmt(r['ctl']):>6} "
            f"{fmt(r['compute']):>8} {fmt(r['bw']):>6} {fmt(r['rand']):>6}"
        )
    probed = [r for r in rows if r["rand"] is not None]
    qualifying = [r for r in rows if r["eff"] is not None and r["eff"] >= 0.8]
    print(f"\npairs: {len(rows)}  probed: {len(probed)}  raw >= 0.8: {len(qualifying)}")
    if len(probed) >= 4:
        effs = [r["eff"] for r in probed]
        for metric in ("compute", "bw", "rand"):
            vals = [r[metric] for r in probed]
            if any(v is None for v in vals):
                continue
            rho = spearman(effs, vals)
            print(f"spearman(eff, {metric}) = {rho and round(rho, 3)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
