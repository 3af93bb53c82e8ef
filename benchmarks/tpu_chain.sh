#!/bin/bash
# Serial on-chip measurement chain (chip is single-tenant).
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
  # build the log line with json.dumps: malformed bench output (e.g. a
  # partial line on timeout) degrades to bench=null instead of
  # corrupting the JSONL; env values with quotes/backslashes are safe
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
run headline
run multi_tracked BENCH_MULTI=1
run multi_init BENCH_MULTI=1 BENCH_MODE=init
run spread_tracked BENCH_EXTENT=0 BENCH_THETA_SPREAD=0
echo "CHAIN DONE" >&2
