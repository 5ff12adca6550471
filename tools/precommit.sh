#!/usr/bin/env bash
# Pre-snapshot gate (r11 post-mortem: the round-11 end-of-round commit
# carried a 2-line paste error that broke `sbt compile`, voiding every
# driver gate for the round). Run before ANY commit that touches Scala
# sources; wire as .git/hooks/pre-commit via:
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
#
# Cheap by design: compile only (the full suite runs separately) — the
# failure mode this guards against is "snapshot does not even build".
set -euo pipefail
cd "$(dirname "$0")/.."
if git diff --cached --name-only | grep -qE '\.(scala|sbt)$' ||
   [ "${PRECOMMIT_FORCE:-0}" = "1" ]; then
  echo "[precommit] scala/sbt sources staged -> sbt compile + Test/compile"
  sbt -batch "compile; Test/compile" < /dev/null
else
  echo "[precommit] no scala/sbt changes staged; skipping compile"
fi
