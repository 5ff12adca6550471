#!/usr/bin/env bash
# Pre-snapshot gate (r11 post-mortem: the round-11 end-of-round commit
# carried a 2-line paste error that broke `sbt compile`, voiding every
# driver gate for the round). Run before ANY commit that touches Scala
# sources; wire as .git/hooks/pre-commit via:
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
#
# Cheap by design: compile only (the full suite runs separately) — the
# failure mode this guards against is "snapshot does not even build".
#
# Skips (exit 0 with a loud warning) when another sbt/JVM holds the
# project — blocking a commit behind a running bench's sbt lock would
# stall automation worse than the risk it guards. GRAFT_PRECOMMIT=0
# bypasses explicitly.
set -uo pipefail
# Resolve the REPO ROOT via git, not $0: when git runs this as
# .git/hooks/pre-commit (a symlink), dirname "$0" is .git/hooks and
# "$0"/.. is .git — sbt then "succeeds" in 1 s against a synthetic
# empty project ("set current project to root--git"), silently voiding
# the compile gate this script exists to provide.
# ...and check BOTH steps: `cd ""` silently succeeds in bash without
# moving, which would re-open the exact wrong-directory hole above.
toplevel=$(git rev-parse --show-toplevel) || exit 1
[ -n "$toplevel" ] || { echo "[precommit] cannot resolve repo root" >&2; exit 1; }
cd "$toplevel" || exit 1
if [ "${GRAFT_PRECOMMIT:-1}" = "0" ]; then
  echo "[precommit] bypassed (GRAFT_PRECOMMIT=0)"
  exit 0
fi
# Capture the staged list FIRST: with pipefail, `git diff | grep -q`
# could report failure even when a .scala file IS staged — grep -q exits
# on first match, the SIGPIPE'd git diff makes the pipeline status 141,
# and the hook would silently skip the compile gate (r12 advice).
staged_files=$(git diff --cached --name-only)
if ! printf '%s\n' "$staged_files" | grep -E '\.(scala|sbt)$' > /dev/null &&
   [ "${PRECOMMIT_FORCE:-0}" != "1" ]; then
  echo "[precommit] no scala/sbt changes staged; skipping compile"
  exit 0
fi
if pgrep -f "sbt-launch" > /dev/null 2>&1; then
  echo "[precommit] WARNING: another sbt is running (project lock) —" \
       "skipping the compile gate; run 'sbt compile' yourself before" \
       "trusting this commit"
  exit 0
fi
echo "[precommit] scala/sbt sources staged -> sbt compile + Test/compile"
if sbt -batch "compile; Test/compile" < /dev/null; then
  exit 0
else
  echo "[precommit] COMPILE FAILED — refusing to commit a broken tree" \
       "(bypass only if you know why: GRAFT_PRECOMMIT=0 git commit ...)"
  exit 1
fi
