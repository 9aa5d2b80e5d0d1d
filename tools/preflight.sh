#!/usr/bin/env bash
# Pre-snapshot gate: the round's final commit must pass this script
# AFTER its tree is in place (run it, then commit; quote the marker in
# the commit body). Exists because round 6 shipped a snapshot commit
# that did not compile — the driver gate died at compileIncremental and
# the whole round went unverified.
#
# Usage: tools/preflight.sh [--full]
#   default: sbt compile + Test/compile   (~1 min, catches r6-class breaks)
#   --full:  also runs the whole ScalaTest suite (~5 min)
set -uo pipefail
cd "$(dirname "$0")/.."

TASKS="compile; Test/compile"
if [[ "${1:-}" == "--full" ]]; then
  TASKS="compile; Test/compile; test"
fi

if sbt -batch "$TASKS" >/tmp/preflight.log 2>&1; then
  MARKER="PREFLIGHT OK ($TASKS) @ git $(git rev-parse --short HEAD 2>/dev/null || echo none) + $(git status --porcelain | wc -l) dirty files"
  echo "$MARKER" | tee .preflight_ok
  exit 0
else
  echo "PREFLIGHT FAILED — tail of /tmp/preflight.log:" >&2
  tail -20 /tmp/preflight.log >&2
  rm -f .preflight_ok
  exit 1
fi
