#!/bin/bash
# Round-14 async patch lander: waits for the targeted sf10 oracle
# re-check (3 workers x 40GB x 1800s over the 13 first-pass-starved
# TIME entries) to finish, then folds its verdicts into the committed
# gate artifact and commits — the r12 "chain lands it asynchronously"
# house rule: the SURVEY claim already says "see the artifact", so the
# commit IS the claim.
set -u
cd "$(dirname "$0")/.."
while pgrep -f "check.py /tmp/sf10" > /dev/null; do sleep 60; done
python3 tools/merge_correctness.py CORRECTNESS_SF10_r14.json \
  /tmp/check_sf10_retry.log | tail -3 > /tmp/r14_merge_summary.txt
git add CORRECTNESS_SF10_r14.json
git commit -q -m "Fold the targeted sf10 oracle re-decisions into the r14 gate artifact

First-pass compare ran 4 workers x 20GB — under-resourced vs r13's 3x36GB —
and 13 dedup-family oracles (11 r13-green) hit the 900s budget on
memory-starved spill thrash. This merge lands the 3x40GB x 1800s targeted
re-run's verdicts (tools/merge_correctness.py, the r12 precedent)." \
  -- CORRECTNESS_SF10_r14.json
