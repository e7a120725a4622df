"""Extract Poseidon-GL optimized constants (Neptune-style C/S/M/P tables) from
the reference's data file into a compact .npz consumed by
pil2_stark_tpu.hash.poseidon_gl.

The tables are protocol DATA (hex field elements), not code; see
/root/reference/src/helpers/hash/poseidon/poseidon_constants_opt.js.
"""
import re
import numpy as np

SRC = "/root/reference/src/helpers/hash/poseidon/poseidon_constants_opt.js"
OUT = "/root/repo/pil2_stark_tpu/hash/poseidon_gl_constants.npz"

text = open(SRC).read()

# split into top-level keys: CPOSEIDON, C, S, M, P
keys = {}
for m in re.finditer(r"^\s+([A-Z]+):", text, re.M):
    keys[m.group(1)] = m.start()
order = sorted(keys.items(), key=lambda kv: kv[1])
sections = {}
for i, (k, start) in enumerate(order):
    end = order[i + 1][1] if i + 1 < len(order) else len(text)
    sections[k] = text[start:end]

def hexes(s):
    return [int(h, 16) for h in re.findall(r"0x[0-9a-fA-F]+", s)]

C = np.array(hexes(sections["C"]), dtype=np.uint64)
S = np.array(hexes(sections["S"]), dtype=np.uint64)
# M and P are 12x12 nested arrays; row-major order of appearance
M = np.array(hexes(sections["M"]), dtype=np.uint64).reshape(12, 12)
P = np.array(hexes(sections["P"]), dtype=np.uint64).reshape(12, 12)

t, RF, RP = 12, 8, 22
assert len(C) == 5 * t + RP + 3 * t, f"C len {len(C)}"
assert len(S) == (2 * t - 1) * RP, f"S len {len(S)}"
np.savez_compressed(OUT, C=C, S=S, M=M, P=P)
print("C", C.shape, "S", S.shape, "M", M.shape, "P", P.shape)
print("C[0]", hex(int(C[0])))
