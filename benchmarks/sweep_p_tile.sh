#!/bin/bash
# p_tile sweep over the crop-kernel regimes (queue item 5).
# Serial on the TPU; each line of the output file is
#   {"tag": ..., "env": {...}, "bench": {bench.py JSON}}
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/p_tile_sweep.jsonl}
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "[sweep] $tag: $*" >&2
  local line
  line=$(env "$@" timeout 1500 python bench.py 2>/tmp/sweep_err.log | tail -1)
  if [ -z "$line" ]; then
    echo "[sweep] $tag FAILED:" >&2; tail -5 /tmp/sweep_err.log >&2
    line='{"error": true}'
  fi
  printf '{"tag": "%s", "env": "%s", "bench": %s}\n' "$tag" "$*" "$line" >> "$OUT"
}

run tracked_p128 TDR_P_TILE_TRACKED=128 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0
run tracked_p256 TDR_P_TILE_TRACKED=256 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0
run init_p128    TDR_P_TILE_INIT=128 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 BENCH_MODE=init
run init_p256    TDR_P_TILE_INIT=256 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 BENCH_MODE=init
run multi_tracked_p128 TDR_P_TILE_TRACKED=128 BENCH_MULTI=1
run multi_init_p128    TDR_P_TILE_INIT=128 BENCH_MULTI=1 BENCH_MODE=init
echo "[sweep] done" >&2
