#!/bin/sh
# Pre-snapshot gate: HEAD must pass the FULL non-slow suite (round-3
# shipped a failing test that the old 8-file fast gate could not catch).
# Usage:
#   sh scripts/gate.sh        # full gate (run before any snapshot/commit
#                             #   that ends a work session; ~35 min on the
#                             #   8-device virtual CPU mesh)
#   sh scripts/gate.sh fast   # collection + fast subset (inner-loop check)
set -e
cd "$(dirname "$0")/.."
# STATUS.md perf numbers must cite the newest bench artifact (drift guard)
python tools/status_perf.py --check STATUS.md
python -m pytest tests/ --collect-only -q >/dev/null
if [ "$1" = "fast" ]; then
    python -m pytest tests/test_field.py tests/test_poseidon.py tests/test_ntt.py \
        tests/test_merkle.py tests/test_binfile.py tests/test_zkey_binfile.py \
        tests/test_serialization.py tests/test_misc_utils.py -q -x
else
    python -m pytest tests/ -q -m "not slow"
fi
echo "gate: green"
