#!/bin/bash
# Round-5 final-session on-chip queue (chip is single-tenant).
# 1) yfold A/B on the crop regimes (post mo=24 bitcast fix)
# 2) headline re-confirm
# Logs one JSON line per measurement to benchmarks/chain_log.jsonl.
cd /root/repo
LOG=benchmarks/chain_log.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag start $(date +%T) ===" >&2
  local out
  out=$(timeout 2400 env "$@" python bench.py 2>/tmp/chain_err.txt)
  local rc=$?
  local line
  line=$(echo "$out" | grep '^{' | tail -1)
  TAG="$tag" RC="$rc" ENVSTR="$*" LINE="$line" python3 - >> $LOG <<'EOF'
import json, os
try:
    bench = json.loads(os.environ.get("LINE", ""))
except (json.JSONDecodeError, ValueError):
    bench = None
print(json.dumps({
    "tag": os.environ["TAG"],
    "rc": int(os.environ["RC"]),
    "env": os.environ["ENVSTR"],
    "bench": bench,
}))
EOF
  echo "=== $tag rc=$rc: $line ===" >&2
  tail -3 /tmp/chain_err.txt >&2
}
run spread_tracked_yf2 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 TDR_YFOLD=1
run spread_init_yf2 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 BENCH_MODE=init TDR_YFOLD=1
run spread_tracked_yf_fuse2 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 TDR_YFOLD=1 TDR_FUSE_CROP=1
run mip4_yf2 BENCH_EXTENT=0 BENCH_THETA_SPREAD=0 BENCH_RES=2.0 TDR_YFOLD=1 TDR_FUSE_CROP=1
run headline_r5_final DUMMY=0
echo "CHAIN DONE" >&2
