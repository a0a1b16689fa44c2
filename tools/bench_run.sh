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
SLIM=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"')
T1=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOAD_AFTER=$(cut -d' ' -f1-3 /proc/loadavg)
OUT=$(tail -n 1 "$DETAIL" 2>/dev/null)
[ -z "$OUT" ] && OUT=$SLIM
echo "{\"tag\":\"$N\",\"t0\":\"$T0\",\"t1\":\"$T1\",\"load_before\":\"$LOAD_BEFORE\",\"load_after\":\"$LOAD_AFTER\",\"bench\":$OUT}" >> $LOG
