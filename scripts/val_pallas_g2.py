"""Validate the Pallas G2 kernels + G2 MSM on the live chip.

Edge-case parity vs ops/g2_jax (validated against the host bigint
curve): generic lanes, P==Q, P==-Q, acc-at-infinity, masked lanes.
Then msm_pallas_g2 vs host naive at 2048 points, and a throughput
number for the madd kernel.
"""
from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from crypto3_fil_proofs_tpu.ops import g2_jax, msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G2_GEN_X,
    G2_GEN_Y,
    R,
    g2_add,
    g2_eq,
    g2_from_affine,
    g2_mul,
    g2_neg,
    g2_to_affine,
    G2_INF,
)
from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.pallas import g2 as pg2
from crypto3_fil_proofs_tpu.ops.pallas.msm import msm_pallas_g2

BLOCK = pg2.G2_BLOCK
rng = random.Random(0xC2)
GEN = g2_from_affine((G2_GEN_X, G2_GEN_Y))


def rand_pts(n):
    return [g2_mul(GEN, rng.randrange(1, R)) for _ in range(n)]


def soa_from_pts(pts):
    """Jacobian host points -> SoA planes [24, N] via g2_jax encode."""
    aff, _ = g2_jax.points_to_device([g2_to_affine(p) if p[2] != (0, 0) else None for p in pts])
    return aff


def test_madd_edges():
    n = BLOCK
    base = rand_pts(8)
    acc_pts, q_pts, valid, want = [], [], [], []
    for i in range(n):
        k = i % 8
        p, q = base[k], base[(i // 8) % 8]
        v = 1
        kind = i % 5
        if kind == 1:
            q = p  # P == Q -> same-flag + dbl fixup
        elif kind == 2:
            q = g2_neg(p)  # P == -Q -> infinity
        elif kind == 3:
            p = G2_INF  # acc at infinity -> lift q
        elif kind == 4:
            v = 0  # masked lane -> keep acc
        acc_pts.append(p)
        q_pts.append(q)
        valid.append(v)
        want.append(g2_add(p, q) if v else p)

    # device acc: Jacobian with z=1 (or 0 for inf)
    accz = [(p[0], p[1], p[2]) for p in acc_pts]
    # encode acc as affine lift: x, y planes + z plane one/zero
    aff_acc, _ = g2_jax.points_to_device(acc_pts)
    from crypto3_fil_proofs_tpu.ops.fr_limbs import fq_ops

    one = jnp.broadcast_to(fq_ops.encode(1), aff_acc[0][0].shape)
    zero = jnp.zeros_like(one)
    zmask = jnp.asarray(
        np.array([0 if p[2] == (0, 0) else 1 for p in acc_pts], np.uint32)
    )[:, None]
    z = (jnp.where(zmask != 0, one, 0), zero)
    acc = tuple(
        (pair[0].T, pair[1].T) for pair in (aff_acc[0], aff_acc[1], z)
    )
    aff_q, _ = g2_jax.points_to_device(q_pts)
    qd = tuple((pair[0].T, pair[1].T) for pair in aff_q)
    vmask = jnp.asarray(np.array(valid, dtype=np.uint32))

    out, same = pg2.madd_nodbl_soa(acc, qd, vmask)
    out = pg2.dbl_soa(out, same)
    got = g2_jax.points_from_device(
        tuple((pair[0].T, pair[1].T) for pair in out)
    )
    bad = [i for i in range(n) if not g2_eq(got[i], want[i])]
    assert not bad, f"madd mismatches: {len(bad)}/{n}, first {bad[:4]}"
    print(f"madd_nodbl+dbl fixup: bit-exact over {n} lanes incl. edges")


def test_msm(n=2048):
    pts = rand_pts(64) * (n // 64)
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    aff, _ = g2_jax.points_to_device(pts)
    sc = np.asarray(msm_mod.scalars_to_device(scalars))
    t0 = time.perf_counter()
    got = msm_pallas_g2(aff, sc, n_buckets=256)
    dt = time.perf_counter() - t0
    acc = G2_INF
    for p, s in zip(pts, scalars):
        acc = g2_add(acc, g2_mul(p, s))
    assert g2_eq(got, acc), "G2 MSM mismatch"
    print(f"msm_pallas_g2 (n={n}, B=256): matches host naive ({dt:.1f}s incl compile)")


def bench_madd(batch=1 << 17, iters=4):
    pts = rand_pts(64) * (batch // 64)
    aff, _ = g2_jax.points_to_device(pts)
    qd = tuple((pair[0].T, pair[1].T) for pair in aff)
    from crypto3_fil_proofs_tpu.ops.pallas.msm import _G2Ops

    acc = _G2Ops.zeros(batch)
    vm = jnp.ones((batch,), jnp.uint32)

    @jax.jit
    def step(acc):
        out, same = pg2.madd_nodbl_soa(acc, qd, vm)
        return out

    acc = step(acc)
    fetch_sync(acc[0][0])
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        acc = step(acc)
        fetch_sync(acc[0][0])
        best = min(best, time.perf_counter() - t0)
    print(f"g2 madd_nodbl: {batch/best/1e6:.2f} M adds/s")


if __name__ == "__main__":
    print(jax.devices())
    test_madd_edges()
    test_msm()
    bench_madd()
