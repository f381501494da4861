#!/bin/bash
# Round-17 stream-leg second decade (r16 verdict #4): the three live
# curate legs (text/media/crawl) measured at sf1 AND sf10 — their
# durable digest stores are the component a decade stresses (store
# reads must stay digest-bounded as the corpus grows 10x).
# Protocol = the round-15 stream protocol: streams-only JVM
# (SPARK_GRAFT_ONLY set to a non-matching sentinel + STREAM=1),
# median-of-3 fresh-topic runs per leg, per-run loadavg recorded by
# Bench itself; one JVM per SF.
set -eo pipefail
cd "$(dirname "$0")/.."
for sf in "$@"; do
  echo "=== stream legs @ $sf ==="
  # full per-SF log (an earlier filtered form cut the first leg's
  # line out of the tail window); the summary greps the saved file
  SPARK_GRAFT_SF_DIR="/root/repo/localdata/$sf" SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_ONLY=__streams__ SPARK_GRAFT_STREAM=1 \
    sbt 'runMain graft.Bench' > "/tmp/streams_r17_$sf.log" 2>&1 || true
  grep -E "stream bench|FAILED" "/tmp/streams_r17_$sf.log" \
    || echo "no stream-leg lines in /tmp/streams_r17_$sf.log (sbt died early?)"
done
echo "STREAMS_R17_DONE"
