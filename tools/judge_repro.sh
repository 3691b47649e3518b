#!/usr/bin/env bash
# One-command judge reproduction (r12 VERDICT ask #7): runs the full
# evidence chain and prints the four verdict numbers —
#   1. full pytest suite result (the all-registered-queries oracle
#      sweep included)
#   2. registry import-diff vs the previous round tag (strict
#      additivity: zero removals / zero oracle edits)
#   3. spot-oracle pass over N queries, rotation preferring names
#      with no PASS event in the VERIFIED.md ledger at the target sf
#      (r14 ask #1: FAIL rows never count as coverage)
#   4. diagnostic LoC (repo non-test source vs reference core)
#
# usage: tools/judge_repro.sh [PREV_REF=r12] [N_SPOT=12]
# PREV_REF may be a round tag (r12) or any git ref; if round tags are
# missing, recreate them from the "round N: verdict" first-parent
# commits (see bench.py resolve_round_ref).
set -uo pipefail
cd "$(dirname "$0")/.."

PREV="${1:-r12}"
NSPOT="${2:-12}"
rc=0

echo "=== 1/4 full pytest suite (includes the all-registered-queries oracle sweep) ==="
python -m pytest tests/ -q 2>&1 | tail -2 || rc=1

echo "=== 2/4 registry import-diff vs ${PREV} ==="
python tools/registry_diff.py "$PREV" || rc=1

echo "=== 3/4 spot oracle over ${NSPOT} queries (unledgered-at-sf first) ==="
# Capture the tool's exit status explicitly: deriving rc from a
# `... | grep -v ... || rc=1` pipeline under pipefail conflates the
# tool's status with grep's (grep exits 1 when every line is
# filtered, mis-reporting an all-green run as a failure), and
# 2>/dev/null hid real tracebacks from the evidence log.
# --no-ledger keeps this reproduction read-only; to RECORD an
# independent pass in the cumulative VERIFIED.md ledger instead, run
#   python tools/spot_oracle.py --n 15 --source judge-spot --salt <own>
spot_out=$(python tools/spot_oracle.py --n "$NSPOT" --no-ledger) || rc=1
printf '%s\n' "$spot_out" | grep -v '^26/\|WARN' || true

echo "=== 4/4 diagnostic LoC ==="
repo_loc=$(find cdc_publisher_spark -name '*.py' | xargs cat | wc -l)
extra_loc=$(cat bench.py tools/gen_sf.py __spark_entry__.py | wc -l)
ref_loc=$(find /root/reference/src -name '*.clj' 2>/dev/null | xargs cat 2>/dev/null | wc -l)
echo "repo non-test source: $((repo_loc + extra_loc)) (package ${repo_loc} + bench/gen_sf/entry ${extra_loc})"
echo "reference core (src/**/*.clj): ${ref_loc}"

echo "=== judge_repro: $([ "$rc" -eq 0 ] && echo ALL GREEN || echo FAILURES ABOVE) ==="
exit "$rc"
