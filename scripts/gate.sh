#!/bin/sh
# Pre-snapshot gate: the repo must at minimum collect and pass the fast
# test subset before any snapshot/commit is considered shippable.
# Usage: sh scripts/gate.sh   (exit 0 = green)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ --collect-only -q >/dev/null
python -m pytest tests/test_field.py tests/test_poseidon.py tests/test_ntt.py \
    tests/test_merkle.py tests/test_binfile.py tests/test_zkey_binfile.py \
    tests/test_serialization.py tests/test_misc_utils.py -q -x
echo "gate: green"
