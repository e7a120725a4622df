#!/bin/sh
# Populate the persistent XLA compilation cache for the bench/prove
# program set (VERDICT r4 item 5: a cache flush — new jaxlib, new host —
# re-pays the full cold compile inside whatever budget next runs).
#
# Run this ONCE after any toolchain/host change, outside a timed budget:
#   sh scripts/prewarm.sh
#
# It executes the exact driver bench (which exercises every hot program:
# 2^24 NTT, 2^20x8 LDE, 2^20 planar tree, full 2^20 device prove) and the
# graft entry compile check; all compiles land in the
# jaxcache-keyed persistent cache, so subsequent bench/prove runs on this
# host+jaxlib are warm.
set -e
cd "$(dirname "$0")/.."
python - <<'EOF'
import __graft_entry__ as g
import jax
fn, args = g.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("entry() compiled")
EOF
python bench.py
echo "prewarm: done (cache dir $(python -c 'from pil2_stark_tpu.utils import jaxcache; print(jaxcache.setup_cache())'))"
