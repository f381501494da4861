#!/bin/bash
# One-shot quality gate mirroring the driver's checks:
#   compile + tests + Verify@sf0.01 + DuckDB oracle diff + Bench@sf0.1
#   + per-query bench regression diff vs the newest BENCH_r{N}.json
# Run from /root/repo. Uses a throwaway sbt batch invocation (slower
# than the warm shell — prefer the tmux shell while iterating).
set -eo pipefail
cd "$(dirname "$0")/.."

# Environment-drift watch: record every testdata table's physical schema
# in the gate log. The generator changed events.ts from INT64-nanos to
# TIMESTAMP(MICROS) unannounced between rounds 7 and 8; when it changes
# again, this block plus the loader-level Tables.checkSchema turn the
# break into a one-line diagnosis instead of 31 Catalyst errors.
echo "== testdata schemas (sf0.01) =="
python3 - <<'EOF'
import pyarrow.parquet as pq, glob, os
for p in sorted(glob.glob('/root/testdata/sf0.01/*.parquet')):
    s = pq.read_schema(p)
    cols = ', '.join(f'{f.name}:{f.type}' for f in s)
    print(f'  {os.path.basename(p)}: {cols}')
EOF

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt "test" "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v01" "runMain graft.Bench" \
  | tee /tmp/gate_out.txt
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_v01

# Regression watch: diff this run's bench line against the newest
# driver-recorded round (>=2x per-query slowdowns exit nonzero — the
# check that would have caught q32's round-6 anomaly in-round).
# Advisory only when no prior BENCH exists.
grep -o '{"metric".*}' /tmp/gate_out.txt | tail -1 > /tmp/gate_bench.json
last_bench=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)
if [ -n "$last_bench" ] && [ -s /tmp/gate_bench.json ]; then
  python3 tools/bench_diff.py "$last_bench" /tmp/gate_bench.json
fi
echo "GATE GREEN"
