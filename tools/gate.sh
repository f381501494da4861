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
# Both dirs the gate exercises: Verify reads sf0.01, tests+Bench read
# $SPARK_GRAFT_SF_DIR (default sf0.1) — drift in either must show here.
python3 - <<'EOF'
import pyarrow.parquet as pq, glob, os
for d in dict.fromkeys(['/root/testdata/sf0.01',
                        os.environ.get('SPARK_GRAFT_SF_DIR',
                                       '/root/testdata/sf0.1')]):
    print(f'== testdata schemas ({os.path.basename(d)}) ==')
    for p in sorted(glob.glob(f'{d}/*.parquet')):
        s = pq.read_schema(p)
        cols = ', '.join(f'{f.name}:{f.type}' for f in s)
        print(f'  {os.path.basename(p)}: {cols}')
EOF

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt "test" "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v01" \
      "runMain graft.Explain /root/testdata/sf0.001 /tmp/gate_plans.md" \
      "runMain graft.Bench" \
  | tee /tmp/gate_out.txt
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_v01

# Plan-discipline sweep over the plans as BUILT (not the committed
# PLANS.md, which may lag the code): no mid-plan shuffle may carry a
# raw text/payload/url column, no undeclared cartesian/BNLJ. This is
# the check that caught p4 shuffling text as a window rider in r14.
python3 tools/plan_discipline.py /tmp/gate_plans.md

# Regression watch: diff this run's bench line against the most recent
# LIVE reading per query across ALL driver-recorded rounds (>=2x
# per-query slowdowns exit nonzero). Passing every artifact closes the
# r9 blind spot where a query's r-1 entry was a failure stub and its
# real swing vs the last live round went unseen. Advisory only when no
# prior BENCH exists.
grep -o '{"metric".*}' /tmp/gate_out.txt | tail -1 > /tmp/gate_bench.json
benches=$(ls BENCH_r*.json 2>/dev/null | sort)
if [ -n "$benches" ] && [ -s /tmp/gate_bench.json ]; then
  # selftest first: proves the pinned-baseline fallback still closes
  # the truncated-history hole (a phantom-class query must flag even
  # when the caller passes only artifacts where it is phantom)
  python3 tools/bench_diff.py --selftest
  python3 tools/bench_diff.py $benches /tmp/gate_bench.json
fi
echo "GATE GREEN"
