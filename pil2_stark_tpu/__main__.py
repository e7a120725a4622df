"""CLI — counterpart of the reference's src/main_*.js entry points.

Subcommands (cf. /root/reference/src/main_genstarkinfo.js, main_prover.js,
main_verifier.js, main_pilverifier.js, main_buildconsttree.js):

  genstarkinfo   PIL + starkstruct → starkinfo/expressionsinfo/verifierinfo
  buildconsttree const pols → const tree file + verification key
  prove          setup artifacts + witness → proof.json / zkin.json / publics
  verify         proof + verkey → accept/reject
  pilverify      debug constraint check of a witness (no commitments)

Example (self-contained demo with the bundled fibonacci model):

  python -m pil2_stark_tpu prove --model fibonacci --tmp /tmp/fib
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _compile_pil(args):
    from .compiler import pil1_parser

    if getattr(args, "pilout", None):
        from .compiler import pil2_frontend

        pilout = pil2_frontend.load_pilout(args.pilout)
        pil = pil2_frontend.select_air(
            pilout, int(args.subproof_id or 0), int(args.air_id or 0)
        )
        return pil, True
    if args.model:
        from .models import fibonacci

        assert args.model == "fibonacci", "bundled models: fibonacci"
        pil = pil1_parser.compile_pil_source(fibonacci.pil_source(args.nbits or 6))
        pil["name"] = "Fibonacci"
    else:
        pil = pil1_parser.compile_pil(args.pil)
        pil["name"] = os.path.splitext(os.path.basename(args.pil))[0]
    return pil, False


def _stark_struct(args, default=None):
    if args.starkstruct:
        with open(args.starkstruct) as f:
            return json.load(f)
    if default is not None:
        return default
    raise SystemExit("--starkstruct required")


def cmd_genstarkinfo(args):
    from .compiler.pilinfo import pil_info
    from .utils import serialization

    pil, pil2 = _compile_pil(args)
    ss = _stark_struct(args)
    out = pil_info(pil, stark=True, stark_struct=ss, pil2=pil2)
    serialization.dump_json(out["pilInfo"], args.starkinfo)
    serialization.dump_json(out["expressionsInfo"], args.expressionsinfo)
    serialization.dump_json(out["verifierInfo"], args.verifierinfo)
    print(f"wrote {args.starkinfo}, {args.expressionsinfo}, {args.verifierinfo}")


def cmd_prove(args):
    from .models import fibonacci
    from .stark import witness, setup, prover
    from .utils import serialization, proof2zkin

    tmp = args.tmp
    os.makedirs(tmp, exist_ok=True)

    if args.model == "fibonacci":
        from .compiler import pil1_parser

        n_bits = args.nbits or 6
        n = 1 << n_bits
        pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
        pil["name"] = "Fibonacci"
        ss = _stark_struct(args, fibonacci.STARK_STRUCT if n_bits == 6 else None)
        const_cols = witness.generate_fixed_cols(pil["references"], n)
        fibonacci.build_constants(n, const_cols.Fibonacci)
        cm_cols = witness.generate_wtns_cols(pil["references"], n)
        out = fibonacci.execute(n, cm_cols.Fibonacci, args.inputs or [1, 2])
        publics = list(args.inputs or [1, 2]) + [out]
        const_buffer = const_cols.buffer
        cm_buffer = cm_cols.buffer
    else:
        raise SystemExit("file-based prove requires --model for now")

    s = setup.stark_setup(const_buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_buffer, s["constTree"],
        (cm_buffer, publics),
    )

    serialization.dump_proof(res["proof"], os.path.join(tmp, "proof.json"))
    serialization.dump_json(
        [str(int(p)) for p in res["publics"]], os.path.join(tmp, "publics.json")
    )
    zkin = proof2zkin.proof2zkin(res["proof"], s["starkInfo"])
    serialization.dump_json(
        json.loads(json.dumps(zkin, default=str)), os.path.join(tmp, "zkin.json")
    )
    serialization.dump_verkey(s["constRoot"], os.path.join(tmp, "verkey.json"))
    serialization.dump_json(s["starkInfo"], os.path.join(tmp, "starkinfo.json"))
    serialization.dump_json(s["verifierInfo"], os.path.join(tmp, "verifierinfo.json"))
    print(f"proof written to {tmp}/proof.json; verified inputs: {publics}")


def cmd_buildconsttree(args):
    """main_buildconsttree.js: const pols -> extended consts + tree file +
    verification key."""
    from .stark import setup
    from .hash import merkle
    from .utils import serialization
    from .ops import ntt as ntt_ops
    import numpy as np

    ss = _stark_struct(args)
    if args.model == "fibonacci":
        from .compiler import pil1_parser
        from .models import fibonacci
        from .stark import witness

        n_bits = args.nbits or ss["nBits"]
        n = 1 << n_bits
        pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
        const_cols = witness.generate_fixed_cols(pil["references"], n)
        fibonacci.build_constants(n, const_cols.Fibonacci)
        const_buffer = const_cols.buffer
    elif args.const_file:
        _, const_buffer, _ = serialization.read_const_file(args.const_file)
    else:
        raise SystemExit("--model or --const-file required")

    ext = ntt_ops.lde_u64(const_buffer, ss["nBits"], ss["nBitsExt"])
    tree = merkle.merkelize(
        ext, const_buffer.shape[1], 1 << ss["nBitsExt"],
        split_linear_hash=ss.get("splitLinearHash", False),
    )
    merkle.write_tree(tree, args.consttree)
    serialization.dump_verkey(tree.root, args.verkey)
    serialization.write_const_file(args.constsfile, const_buffer, ext)
    print(f"wrote {args.consttree}, {args.verkey}, {args.constsfile}")


def cmd_verify(args):
    from .stark import verifier
    from .utils import serialization

    proof = serialization.load_proof(args.proof)
    publics = [int(x) for x in serialization.load_json(args.publics)]
    const_root = serialization.load_verkey(args.verkey)
    stark_info = serialization.load_json(args.starkinfo)
    verifier_info = serialization.load_json(args.verifierinfo)
    ok = verifier.verify(proof, publics, const_root, stark_info, verifier_info)
    print("VALID proof" if ok else "INVALID proof")
    sys.exit(0 if ok else 1)


def cmd_pilverify(args):
    from .compiler.pilinfo import pil_info
    from .stark import witness, prover
    from .models import fibonacci
    from .compiler import pil1_parser

    if args.model != "fibonacci":
        raise SystemExit("--model fibonacci supported")
    n_bits = args.nbits or 6
    n = 1 << n_bits
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
    pil["name"] = "Fibonacci"
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, args.inputs or [1, 2])
    info = pil_info(pil, True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], const_cols.buffer, None,
        (cm_cols.buffer, list(args.inputs or [1, 2]) + [out]), debug=True,
    )
    if errors:
        for e in errors:
            print(e)
        sys.exit(1)
    print("PIL OK!")


def main(argv=None):
    p = argparse.ArgumentParser(prog="pil2_stark_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--pil")
        sp.add_argument("--pilout", help=".pilout protobuf (PIL2)")
        sp.add_argument("--subproof-id", dest="subproof_id")
        sp.add_argument("--air-id", dest="air_id")
        sp.add_argument("--model")
        sp.add_argument("--nbits", type=int)
        sp.add_argument("--starkstruct")
        sp.add_argument("--inputs", type=lambda s: [int(x) for x in s.split(",")])

    sp = sub.add_parser("genstarkinfo")
    common(sp)
    sp.add_argument("--starkinfo", default="starkinfo.json")
    sp.add_argument("--expressionsinfo", default="expressionsinfo.json")
    sp.add_argument("--verifierinfo", default="verifierinfo.json")
    sp.set_defaults(fn=cmd_genstarkinfo)

    sp = sub.add_parser("prove")
    common(sp)
    sp.add_argument("--tmp", default="out")
    sp.set_defaults(fn=cmd_prove)

    sp = sub.add_parser("buildconsttree")
    common(sp)
    sp.add_argument("--const-file", dest="const_file")
    sp.add_argument("--consttree", default="consttree.bin")
    sp.add_argument("--verkey", default="verkey.json")
    sp.add_argument("--constsfile", default="consts.bin")
    sp.set_defaults(fn=cmd_buildconsttree)

    sp = sub.add_parser("verify")
    sp.add_argument("--proof", required=True)
    sp.add_argument("--publics", required=True)
    sp.add_argument("--verkey", required=True)
    sp.add_argument("--starkinfo", required=True)
    sp.add_argument("--verifierinfo", required=True)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("pilverify")
    common(sp)
    sp.set_defaults(fn=cmd_pilverify)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
