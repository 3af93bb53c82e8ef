#!/usr/bin/env python3
"""Regime throughput sweep: runs bench.py once per scoring regime
(serial subprocesses - the chip is single-tenant) and writes
benchmarks/regimes.json with one entry per regime, device-stamped.

The regime set mirrors BENCH_NOTES.md's table; the north-star is
>=50 steps/s at 102,400 particles in EVERY regime (BASELINE.md).

Run: python benchmarks/bench_regimes.py [--regimes a,b] [--steps N]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGIMES = {
    # converged serving regime (headline)
    "converged_conv": {},
    # spread cloud, tracked thetas (full window crop kernel)
    "spread_tracked": {"BENCH_EXTENT": "0", "BENCH_THETA_SPREAD": "0"},
    # spread cloud, 40-way theta search (global init)
    "spread_init": {
        "BENCH_EXTENT": "0",
        "BENCH_THETA_SPREAD": "0",
        "BENCH_MODE": "init",
    },
    # exploration at coarse range resolution (mip crop)
    "mip4_coarse": {
        "BENCH_EXTENT": "0",
        "BENCH_THETA_SPREAD": "0",
        "BENCH_RES": "2.0",
    },
    # unknown scale, 10 hypotheses, theta search
    "multi_init": {"BENCH_MULTI": "1", "BENCH_MODE": "init"},
    # unknown scale, 10 hypotheses, tracked
    "multi_tracked": {"BENCH_MULTI": "1"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", default=",".join(REGIMES))
    ap.add_argument("--steps", default=None)
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    out = {}
    path = os.path.join(ROOT, "benchmarks", "regimes.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                out = json.load(f)
        except json.JSONDecodeError:
            pass
    for name in args.regimes.split(","):
        env = dict(os.environ, **REGIMES[name])
        if args.steps:
            env["BENCH_STEPS"] = args.steps
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, env=env,
            timeout=args.timeout,
        )
        lines = [
            l for l in p.stdout.splitlines() if l.startswith("{")
        ]
        if p.returncode != 0 or not lines:
            print(f"[regimes] {name} FAILED:\n{p.stdout}\n{p.stderr}",
                  file=sys.stderr)
            out[name] = {"error": p.returncode}
            continue
        r = json.loads(lines[-1])
        out[name] = {
            "steps_per_s": r["value"],
            "step_ms": r["extra"]["step_ms"],
            "path": r["extra"]["path"],
            "device": r["extra"]["device"],
            "knobs": REGIMES[name],
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    worst = min(
        (v["steps_per_s"] for v in out.values() if "steps_per_s" in v),
        default=None,
    )
    print(json.dumps({"worst_regime_steps_per_s": worst}))


if __name__ == "__main__":
    main()
