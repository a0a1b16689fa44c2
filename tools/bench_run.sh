#!/bin/bash
# One load-instrumented bench run: records /proc/loadavg before/after plus
# timestamps alongside the Bench JSON, appending to tools/benchlog/runs.jsonl.
# graft.Bench prints a slim medians-only line to stdout (the driver's ~2 KB
# tail capture must parse it) and appends the FULL payload (runs[], loadavg[])
# to tools/benchlog/bench_detail.jsonl — this script logs the full payload.
cd /root/repo
N=${1:-x}
LOG=tools/benchlog/runs.jsonl
DETAIL=tools/benchlog/bench_detail.jsonl
LOAD_BEFORE=$(cut -d' ' -f1-3 /proc/loadavg)
T0=$(date -u +%Y-%m-%dT%H:%M:%SZ)
DETAIL_LINES_BEFORE=$(wc -l < "$DETAIL" 2>/dev/null || echo 0)
SLIM=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"')
T1=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOAD_AFTER=$(cut -d' ' -f1-3 /proc/loadavg)
# use the detail payload only if THIS run actually appended one — otherwise a
# crashed run would silently log the previous run's numbers under a new tag
DETAIL_LINES_AFTER=$(wc -l < "$DETAIL" 2>/dev/null || echo 0)
if [ "$DETAIL_LINES_AFTER" -gt "$DETAIL_LINES_BEFORE" ]; then
  OUT=$(tail -n 1 "$DETAIL")
else
  OUT=$SLIM
fi
if [ -z "$OUT" ]; then
  echo "[bench_run] FAILED: no bench output (see sbt run)" >&2
  exit 1
fi
echo "{\"tag\":\"$N\",\"t0\":\"$T0\",\"t1\":\"$T1\",\"load_before\":\"$LOAD_BEFORE\",\"load_after\":\"$LOAD_AFTER\",\"bench\":$OUT}" >> $LOG
