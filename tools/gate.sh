#!/bin/bash
# One-shot quality gate mirroring the driver's checks:
#   compile + tests + Verify@sf0.01 + DuckDB oracle diff + Bench@sf0.1
# Run from /root/repo. Uses a throwaway sbt batch invocation (slower
# than the warm shell — prefer the tmux shell while iterating).
set -e
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt "test" "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v01" "runMain graft.Bench"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_v01
echo "GATE GREEN"
