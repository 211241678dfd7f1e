#!/bin/bash
# Mechanical round-close gate: run AFTER the last code commit of a round.
#
# 1. full pytest (must be green)
# 2. full registry-vs-oracle sweep at sf0.01 (must be 0 BAD)
# 3. bench at sf0.01 (smoke: must emit the JSON line)
#
# Appends a one-line dated record to GATES.log and exits nonzero if any
# gate fails, so "the round closed with untested changes" cannot recur:
# the record names the exact commit the gates ran against.
set -u
cd "$(dirname "$0")/.."

sha=$(git rev-parse --short HEAD)
dirty=$(git status --porcelain | wc -l | tr -d ' ')
ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)

echo "=== round-close gates @ ${sha} (dirty files: ${dirty}) ==="

# Run each gate to a temp file so the recorded exit code is the gate
# command's own, not the tail/grep at the end of a pipe (a failing
# pytest piped through `tail -1` reports rc=0 without pipefail).
tmp=$(mktemp)
trap 'rm -f "${tmp}"' EXIT

python -m pytest tests/ -q >"${tmp}" 2>&1
pytest_rc=$?
pytest_out=$(tail -1 "${tmp}")
echo "pytest: ${pytest_out} (rc=${pytest_rc})"

python tools/check_all.py /root/testdata/sf0.01 >"${tmp}" 2>&1
check_rc=$?
check_out=$(grep '^===' "${tmp}" | tail -1)
echo "check_all: ${check_out} (rc=${check_rc})"

bench_out=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=16 \
    python bench.py 2>/dev/null | grep '"metric"' | head -1)
bench_rc=$([ -n "${bench_out}" ] && echo 0 || echo 1)
echo "bench: ${bench_out:-MISSING} (rc=${bench_rc})"

status=PASS
if [ "${pytest_rc}" -ne 0 ] || [ "${check_rc}" -ne 0 ] || [ "${bench_rc}" -ne 0 ]; then
    status=FAIL
fi
echo "${ts} ${sha} dirty=${dirty} ${status} | pytest: ${pytest_out} | oracle: ${check_out} | bench: $(echo "${bench_out}" | cut -c1-80)" >> GATES.log

# Keep ADVICE.md from going stale: stamp which HEAD the last green gate
# covered so a reader can tell addressed findings from open ones.
if [ "${status}" = PASS ] && [ -f ADVICE.md ]; then
    grep -q '^_Gate status:' ADVICE.md && \
        sed -i "s|^_Gate status:.*|_Gate status: findings above re-checked at ${sha} (${ts}); see GATES.log._|" ADVICE.md || \
        printf '\n_Gate status: findings above re-checked at %s (%s); see GATES.log._\n' "${sha}" "${ts}" >> ADVICE.md
fi
echo "=== ${status} (recorded in GATES.log) ==="
[ "${status}" = PASS ]
