"""On-chain exporters E2E: the generated Solidity verifier, executed.

Mirrors how the circom tier is validated: the contract emitted by
fflonk/solidity.py is straight-line statements over a uint256 memory
array, so a small statement evaluator (standing in for the EVM, with
the BN254 precompiles mapped to curve/bn254.py) runs the *generated
text* against a live proof's calldata.  The emitted verifier must
ACCEPT the real proof and REJECT corrupted calldata / wrong publics —
the same acceptance test the reference can only get by deploying
verifier_pilfflonk.sol.ejs's output.

Reference: /root/reference/src/fflonk/solidity/{exportFflonkCalldata.js,
exportPilFflonkVerifier.js}, main_exportCalldata.js,
main_exportSolidityVerifier.js.
"""
import json
import random
import re

import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.curve import bn254
from pil2_stark_tpu.fflonk import solidity as sol
from pil2_stark_tpu.fflonk.prover import fflonk_prove
from pil2_stark_tpu.fflonk.shkey import fflonk_setup, verification_key
from pil2_stark_tpu.fflonk.verifier import fflonk_verify
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.ops.fft_bn128 import FR
from pil2_stark_tpu.protocol.keccak import keccak256
from pil2_stark_tpu.protocol.shplonk import dev_ptau

N_BITS = 4
N = 1 << N_BITS


@pytest.fixture(scope="module")
def chain():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(N_BITS))
    pil["name"] = "Fibonacci"
    info = pilinfo.pil_info(pil, stark=False)
    fflonk_info = info["pilInfo"]

    const_names = [p["name"] for p in fflonk_info["constPolsMap"]]
    const_pols = [[0] * len(const_names) for _ in range(N)]
    const_pols[0][const_names.index("Fibonacci.L1")] = 1
    const_pols[N - 1][const_names.index("Fibonacci.LLAST")] = 1

    cm_names = [p["name"] for p in fflonk_info["cmPolsMap"] if p["stage"] == 1]
    l1, l2 = [0] * N, [0] * N
    l2[0], l1[0] = 1, 2
    for i in range(1, N):
        l2[i] = l1[i - 1]
        l1[i] = (l1[i - 1] ** 2 + l2[i - 1] ** 2) % FR
    cm1 = np.empty((N, len(cm_names)), dtype=object)
    cm1[:, cm_names.index("Fibonacci.l1")] = l1
    cm1[:, cm_names.index("Fibonacci.l2")] = l2
    publics = [1, 2, l1[N - 1]]

    ptau = dev_ptau(4 * (N + 4) + 8 * N, tau=9999)
    zkey = fflonk_setup(const_pols, fflonk_info, ptau)
    res = fflonk_prove(
        zkey, ptau, fflonk_info, info["expressionsInfo"], cm1, publics,
        rng=random.Random(3),
    )
    vk = verification_key(zkey, fflonk_info)
    assert fflonk_verify(
        vk, fflonk_info, info["verifierInfo"], res["proof"], res["publics"]
    )
    return info, vk, res


# ---------------------------------------------------------------------------
# calldata round-trip through fflonk_verify


def test_calldata_roundtrip_verifies(chain):
    info, vk, res = chain
    calldata = sol.export_calldata(vk, res["proof"], res["publics"])
    proof2, publics2 = sol.decode_calldata(vk, calldata)
    assert publics2 == [int(p) % FR for p in res["publics"]]
    assert fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], proof2, publics2
    ) is True


def test_calldata_corruption_rejected(chain):
    info, vk, res = chain
    calldata = sol.export_calldata(vk, res["proof"], res["publics"])
    arrays = json.loads(f"[{calldata}]")
    # flip the last proof word (an evaluation hint)
    bad = int(arrays[0][-3], 16) ^ 1
    arrays[0][-3] = f"0x{bad:064x}"
    bad_calldata = ",".join(json.dumps(a) for a in arrays)
    proof2, publics2 = sol.decode_calldata(vk, bad_calldata)
    assert not fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], proof2, publics2
    )


def test_calldata_word_count_checked(chain):
    info, vk, res = chain
    calldata = sol.export_calldata(vk, res["proof"], res["publics"])
    arrays = json.loads(f"[{calldata}]")
    arrays[0] = arrays[0][:-1]
    with pytest.raises(ValueError, match="proof words"):
        sol.decode_calldata(vk, ",".join(json.dumps(a) for a in arrays))


# ---------------------------------------------------------------------------
# a tiny EVM stand-in: executes the generated verifyProof body with the
# BN254 precompiles mapped to curve/bn254.py


class SolRun:
    def __init__(self, contract: str, proof_words, pubs):
        self.proof = list(proof_words)
        self.pubs = list(pubs)
        self.m = {}
        body = contract.split("uint256[] memory m")[1]
        # statements after the scratchpad allocation
        self.lines = [
            ln.strip() for ln in body.splitlines()[1:]
            if ln.strip() and not ln.strip().startswith("//")
        ]

    # -- expression atoms (the emitter never nests further than these) --
    def val(self, s: str) -> int:
        s = s.strip()
        if s == "q":
            return FR
        if s.startswith("q - ("):
            assert s.endswith(")")
            return (FR - self.val(s[len("q - ("):-1])) % FR
        if s.startswith("uint256(") and s.endswith(")"):
            return self.val(s[len("uint256("):-1])
        m = re.fullmatch(r"proof\[(\d+)\]", s)
        if m:
            return self.proof[int(m.group(1))]
        m = re.fullmatch(r"pubs\[(\d+)\]", s)
        if m:
            return self.pubs[int(m.group(1))]
        m = re.fullmatch(r"m\[(\d+)\]", s)
        if m:
            return self.m[int(m.group(1))]
        return int(s)

    @staticmethod
    def _split_args(s: str):
        args, depth, cur = [], 0, ""
        for ch in s:
            if ch == "," and depth == 0:
                args.append(cur)
                cur = ""
                continue
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            cur += ch
        if cur.strip():
            args.append(cur)
        return args

    def _call(self, fn: str, argstr: str):
        if fn == "hashToFr":
            inner = argstr.strip()
            assert inner.startswith("abi.encodePacked(") and inner.endswith(")")
            parts = self._split_args(inner[len("abi.encodePacked("):-1])
            buf = b"".join(self.val(p).to_bytes(32, "big") for p in parts)
            return int.from_bytes(keccak256(buf), "big") % FR
        args = [self.val(a) for a in self._split_args(argstr)]
        if fn == "mulmod":
            return args[0] * args[1] % args[2]
        if fn == "addmod":
            return (args[0] + args[1]) % args[2]
        if fn == "expmod":
            return pow(args[0], args[1], FR)
        if fn == "inv":
            return pow(args[0], FR - 2, FR)
        if fn == "negY":
            return (sol.FQ - args[0]) % sol.FQ if args[0] else 0
        if fn in ("ecAdd", "ecMul"):
            a = None if args[0] == 0 and args[1] == 0 else (args[0], args[1])
            if fn == "ecAdd":
                b = None if args[2] == 0 and args[3] == 0 else (args[2], args[3])
                r = bn254.g1_add(a, b)
            else:
                r = bn254.g1_mul(a, args[2])
            return (0, 0) if r is None else (r[0], r[1])
        if fn == "pairingCheck":
            a1 = (args[0], args[1])
            b1 = ((args[3], args[2]), (args[5], args[4]))
            a2 = (args[6], args[7])
            b2 = ((args[9], args[8]), (args[11], args[10]))
            a1 = None if a1 == (0, 0) else a1
            a2 = None if a2 == (0, 0) else a2
            return bn254.pairing_check([(a1, b1), (a2, b2)])
        raise ValueError(f"unknown function {fn}")

    def run(self) -> bool:
        for ln in self.lines:
            ln = ln.split("//")[0].strip()
            if not ln:
                continue
            m = re.fullmatch(r"if \((.+) (!=|>=) (.+)\) return false;", ln)
            if m:
                a, op, b = self.val(m.group(1)), m.group(2), self.val(m.group(3))
                if (op == "!=" and a != b) or (op == ">=" and a >= b):
                    return False
                continue
            m = re.fullmatch(r"return (\w+)\((.*)\);", ln)
            if m:
                return bool(self._call(m.group(1), m.group(2)))
            m = re.fullmatch(r"m\[(\d+)\] = (\w+)\((.*)\);", ln)
            if m:
                self.m[int(m.group(1))] = self._call(m.group(2), m.group(3))
                continue
            m = re.fullmatch(
                r"\(m\[(\d+)\], m\[(\d+)\]\) = (\w+)\((.*)\);", ln
            )
            if m:
                x, y = self._call(m.group(3), m.group(4))
                self.m[int(m.group(1))] = x
                self.m[int(m.group(2))] = y
                continue
            raise ValueError(f"unparseable generated statement: {ln}")
        raise ValueError("generated code fell off the end without returning")


@pytest.fixture(scope="module")
def contract(chain):
    info, vk, res = chain
    return sol.export_pilfflonk_verifier(
        vk, info["pilInfo"], info["verifierInfo"]
    )


def _words(chain):
    info, vk, res = chain
    calldata = sol.export_calldata(vk, res["proof"], res["publics"])
    arrays = json.loads(f"[{calldata}]")
    return ([int(h, 16) for h in arrays[0]],
            [int(h, 16) for h in arrays[1]] if len(arrays) > 1 else [])


def test_generated_verifier_accepts_real_proof(chain, contract):
    words, pubs = _words(chain)
    assert SolRun(contract, words, pubs).run() is True


def test_generated_verifier_rejects_corrupted_eval(chain, contract):
    words, pubs = _words(chain)
    words[-1] = (words[-1] + 1) % FR  # invZh hint
    assert SolRun(contract, words, pubs).run() is False
    words, _ = _words(chain)
    words[-4] ^= 1  # some committed evaluation
    assert SolRun(contract, words, pubs).run() is False


def test_generated_verifier_rejects_wrong_public(chain, contract):
    words, pubs = _words(chain)
    pubs[0] = (pubs[0] + 1) % FR
    assert SolRun(contract, words, pubs).run() is False


def test_generated_verifier_rejects_out_of_range_word(chain, contract):
    info, vk, res = chain
    words, pubs = _words(chain)
    _, evals, _ = sol.calldata_layout(vk)
    first_eval = len(words) - len(evals)
    words[first_eval] += FR  # same residue, out of range
    assert SolRun(contract, words, pubs).run() is False


def test_contract_structure(chain, contract):
    info, vk, res = chain
    assert contract.startswith("// SPDX-License-Identifier")
    assert "pragma solidity" in contract
    assert "staticcall(gas(), 0x08" in contract  # pairing precompile
    # embedded const commitments match the vk
    for cm in vk["constCommits"].values():
        assert str(int(cm[0])) in contract
    # X_2 words embedded
    x2 = vk["X_2"]
    for w in (x2[0][0], x2[0][1], x2[1][0], x2[1][1]):
        assert str(int(w)) in contract
    # braces balance (cheap syntax sanity)
    assert contract.count("{") == contract.count("}")


# ---------------------------------------------------------------------------
# real EVM semantics: the contract compiled to bytecode (fflonk/evm.py)
# and executed as a stack machine with calldata ABI, memory-expansion and
# precompile gas — the in-repo equivalent of the reference's hardhat
# deployment tests (/root/reference/smart_contract_tests/)


def _proof_words(vk, proof):
    calldata = sol.export_calldata(vk, proof["proof"], proof["publics"])
    arrays = json.loads(f"[{calldata}]")
    return [int(w, 16) for w in arrays[0]]


def test_evm_bytecode_accepts_real_proof(chain):
    from pil2_stark_tpu.fflonk import evm

    info, vk, res = chain
    words = _proof_words(vk, res)
    ok, gas = evm.run_verifier(
        vk, info["pilInfo"], info["verifierInfo"], words,
        [int(p) % FR for p in res["publics"]],
    )
    assert ok is True
    assert 0 < gas < 100_000_000  # sane gas figure, precompiles included


def test_evm_bytecode_rejects_corrupted_calldata(chain):
    from pil2_stark_tpu.fflonk import evm

    info, vk, res = chain
    words = _proof_words(vk, res)
    publics = [int(p) % FR for p in res["publics"]]
    for idx in (0, len(words) - 3):
        bad = list(words)
        bad[idx] = (bad[idx] + 1) % FR
        ok, _ = evm.run_verifier(
            vk, info["pilInfo"], info["verifierInfo"], bad, publics
        )
        assert ok is False, f"corrupted word {idx} accepted"
    # wrong public input
    bad_pubs = list(publics)
    bad_pubs[0] = (bad_pubs[0] + 1) % FR
    ok, _ = evm.run_verifier(
        vk, info["pilInfo"], info["verifierInfo"], words, bad_pubs
    )
    assert ok is False


def test_evm_bytecode_range_check_rejects_oversized_word(chain):
    from pil2_stark_tpu.fflonk import evm

    info, vk, res = chain
    words = _proof_words(vk, res)
    publics = [int(p) % FR for p in res["publics"]]
    bad = list(words)
    bad[-1] = FR  # == q, must fail the Fr range check
    ok, gas = evm.run_verifier(
        vk, info["pilInfo"], info["verifierInfo"], bad, publics
    )
    assert ok is False


def test_evm_matches_statement_evaluator(chain):
    """The bytecode path and the statement evaluator agree on accept."""
    from pil2_stark_tpu.fflonk import evm

    info, vk, res = chain
    contract = sol.export_pilfflonk_verifier(
        vk, info["pilInfo"], info["verifierInfo"]
    )
    words = _proof_words(vk, res)
    publics = [int(p) % FR for p in res["publics"]]
    assert SolRun(contract, words, publics).run() is True
    ok, _ = evm.run_verifier(
        vk, info["pilInfo"], info["verifierInfo"], words, publics
    )
    assert ok is True
