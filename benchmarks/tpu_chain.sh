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
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"env\": \"$*\", \"bench\": ${line:-null}}" >> $LOG
  echo "=== $tag rc=$rc: $line ===" >&2
  tail -3 /tmp/chain_err.txt >&2
}
run headline
run multi_tracked_mo12 TDR_MULTI_MO=12 BENCH_MULTI=1
run multi_init_mo12 TDR_MULTI_MO=12 BENCH_MULTI=1 BENCH_MODE=init
run spread_tracked BENCH_EXTENT=0 BENCH_THETA_SPREAD=0
echo "CHAIN DONE" >&2
