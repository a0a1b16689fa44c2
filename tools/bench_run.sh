#!/bin/bash
# One load-instrumented bench run: records /proc/loadavg before/after plus
# timestamps alongside the Bench JSON line, appending to tools/benchlog/runs.jsonl
cd /root/repo
N=${1:-x}
LOG=tools/benchlog/runs.jsonl
LOAD_BEFORE=$(cut -d' ' -f1-3 /proc/loadavg)
T0=$(date -u +%Y-%m-%dT%H:%M:%SZ)
OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"')
T1=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOAD_AFTER=$(cut -d' ' -f1-3 /proc/loadavg)
echo "{\"tag\":\"$N\",\"t0\":\"$T0\",\"t1\":\"$T1\",\"load_before\":\"$LOAD_BEFORE\",\"load_after\":\"$LOAD_AFTER\",\"bench\":$OUT}" >> $LOG
