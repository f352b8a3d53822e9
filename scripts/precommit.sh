#!/usr/bin/env bash
# Gate before ANY commit (and especially before an end-of-round snapshot):
# the tree must compile and the sf0.001 correctness loop must be green.
# Rounds 3 and 4 were lost to snapshotting a tree that didn't compile.
#
# Usage: scripts/precommit.sh [--full]
#   default: compile + sf0.001 Verify + selfcheck  (~2 min)
#   --full:  also sf0.01 Verify + selfcheck and the ScalaTest suite
set -euo pipefail
cd /root/repo

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
fi

echo "precommit: OK"
