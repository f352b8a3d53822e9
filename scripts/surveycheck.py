#!/usr/bin/env python3
"""SURVEY <-> SparkEntry.queries sync gate (dev tooling, not shipped).

Round 8 declared q_dedup_simhash_eval without a SURVEY §2 row and the
drift went unnoticed for a round — documentation coverage had no machine
check. This closes it both ways:

  1. every query key registered in a Scala `queries` map ("q_..." ->)
     must be mentioned in SURVEY.md;
  2. every `q_...` key SURVEY.md mentions must be a registered key
     (catches stale docs after a rename/removal).

Exit 1 with the offending keys on any drift. Run by scripts/precommit.sh.
"""
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
registered = set()
for f in (root / "src" / "main" / "scala").rglob("*.scala"):
    registered |= set(re.findall(r'"(q_[a-z0-9_]+)"\s*->', f.read_text()))

survey = (root / "SURVEY.md").read_text()
mentioned = set(re.findall(r"`(q_[a-z0-9_]+)`", survey))

undocumented = sorted(registered - mentioned)
stale = sorted(mentioned - registered)

if undocumented:
    print(f"SURVEY drift: {len(undocumented)} registered key(s) with no "
          f"SURVEY.md mention: {undocumented}")
if stale:
    print(f"SURVEY drift: {len(stale)} SURVEY.md key(s) not registered in "
          f"any queries map: {stale}")
if not undocumented and not stale:
    print(f"surveycheck: OK ({len(registered)} keys, two-way)")
sys.exit(1 if undocumented or stale else 0)
