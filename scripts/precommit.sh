#!/usr/bin/env bash
# Gate before ANY commit (and especially before an end-of-round snapshot):
# the tree must compile and the sf0.001 correctness loop must be green.
# Rounds 3 and 4 were lost to snapshotting a tree that didn't compile.
#
# Usage: scripts/precommit.sh [--full | --bench]
#   default: compile + sf0.001 Verify + selfcheck  (~2 min)
#   --full:  also sf0.01 Verify + selfcheck, the ScalaTest suite, and
#            the bench-regression gate (fresh sf0.1 bench vs the last
#            committed BENCH_LOCAL.json via benchdiff --factor auto —
#            fails on per-query regressions that survive both the
#            variance-range overlap and the global-factor strip)
#   --bench: the bench-regression gate alone (~6 min)
set -euo pipefail
cd /root/repo

bench_gate() {
  # fresh full bench vs the last COMMITTED BENCH_LOCAL.json. The
  # committed side is read from git (not the working tree) so the gate
  # can't be defeated by overwriting the baseline in the same commit.
  git show HEAD:BENCH_LOCAL.json > /tmp/bench_committed.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_fresh.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_gate.log 2>&1
  # --max-factor bounds the auto strip: a uniform >1.25x move (which the
  # median strip would otherwise hide entirely) fails the gate and must be
  # adjudicated manually, keeping the "silent 1.5x can't land" promise for
  # commit-caused global slowdowns, not just per-query outliers.
  python3 scripts/benchdiff.py /tmp/bench_committed.json /tmp/bench_fresh.json \
    --factor auto --max-factor 1.25 --threshold 1.4
}

if [[ "${1:-}" == "--bench" ]]; then
  bench_gate
  echo "precommit (bench gate): OK"
  exit 0
fi

python3 scripts/surveycheck.py

sbt -batch compile

rm -rf /tmp/precommit_vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/precommit_vout"
python3 scripts/selfcheck.py /root/testdata/sf0.001 /tmp/precommit_vout

# Plan-shape hygiene over EVERY declared query (plans only, never executes —
# cheap). Runs unconditionally so a query added to SparkEntry.queries can't
# land with an unallowlisted nested-loop join / cartesian / naive window
# (round 8 shipped exactly that regression).
sbt -batch "testOnly graft.PlanHygieneSpec graft.SourceHygieneSpec"

if [[ "${1:-}" == "--full" ]]; then
  rm -rf /tmp/precommit_vout01
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/precommit_vout01"
  python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/precommit_vout01
  sbt -batch test
  bench_gate
fi

echo "precommit: OK"
