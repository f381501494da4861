#!/bin/bash
# Round-17 scale captures (r16 verdict #2/#4/#5/#7):
#   - sf1→sf10 exponents for the operators round 16/17 rewrote or
#     added: d9/p7 (star-edge candidates, groupBy-min hubs), a31
#     (never scale-measured), a32 (new this round).
#   - the lshStarEdges hub A/B: d9 at both SFs from a HEAD~ clone
#     (window-min hub) vs this tree (groupBy-min hub) — verdict #7's
#     "parity or better, else documented".
#   - 5-run medians at sf1 (the short, noise-dominated end of the
#     exponent) per verdict #5; 3 runs at sf10 where single runs are
#     long enough to be stable and disk/GC pressure dominates.
# Protocol is the round-16 second-decade one: solo JVM per (query,
# SF), untimed sf0.001 + target-SF warmups (Bench ONLY mode does
# both), SPARK_GRAFT_GC_EVERY_RUN=1, 48g driver heap, cpus=32.
# Usage: tools/scale_r17.sh [window_arm_repo_dir]
set -eo pipefail
cd "$(dirname "$0")/.."
WINARM="${1:-}"

run_one() { # repo sfdir runs query tag
  local repo="$1" sfdir="$2" runs="$3" q="$4" tag="$5"
  echo "=== $tag: $q @ $sfdir (runs=$runs) ==="
  (cd "$repo" && SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_GC_EVERY_RUN=1 \
    SPARK_GRAFT_RUNS="$runs" SPARK_GRAFT_ONLY="$q" \
    sbt 'runMain graft.Bench') 2>&1 | tail -4
}

SF1=/root/repo/localdata/sf1
SF10=/root/repo/localdata/sf10

for q in d9_dup_components p7_dedup_cascade a31_compact_exec a32_rebuild_exec; do
  run_one /root/repo "$SF1" 5 "$q" "star/new sf1"
done
for q in d9_dup_components p7_dedup_cascade a31_compact_exec a32_rebuild_exec; do
  run_one /root/repo "$SF10" 3 "$q" "star/new sf10"
done
if [ -n "$WINARM" ]; then
  run_one "$WINARM" "$SF1" 5 d9_dup_components "window-hub sf1"
  run_one "$WINARM" "$SF10" 3 d9_dup_components "window-hub sf10"
fi
echo "SCALE_R17_DONE"
