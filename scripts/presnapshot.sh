#!/bin/bash
# Pre-snapshot gate: refuse the end-of-round commit on a red suite.
#
# Round 4 shipped its snapshot with a failing shuffle-budget pin
# because the full suite was not re-run after the last plan rewrite.
# Run this before the final commit of a round; it exits non-zero on
# any test failure and prints the one-line summary to paste into the
# snapshot commit message.
#
# pipefail is load-bearing: with plain `set -e` the pipeline's exit
# status is tail's, and a red suite would print "green" (this script
# did exactly that once — r5).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q 2>&1 | tail -3
echo "presnapshot: suite green — safe to commit"
