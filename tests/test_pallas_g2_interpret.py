"""Pallas G2 mixed-add kernel edge semantics — interpret mode (CPU CI).

G2 backs the Groth16 B commitment (one G2 MSM per partition proof,
reference core/proof/compound_proof.hpp:89-95 consumption of the
r1cs_gg_ppzsnark prover). One kernel block (G2_BLOCK lanes) with every
edge case mixed in: generic add, P==Q (same-flag + dbl fixup), P==-Q
(infinity), acc at infinity (lift), masked lanes (keep acc). Interpret
mode emulates the kernel with numpy so this runs in the default CPU
suite (~30-60 s) and gates the Fq2 kernel logic that the seal prover's
B2 commitment runs on real TPU. Full-size device runs live in
scripts/val_pallas_g2.py (TPU-only).
"""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from crypto3_fil_proofs_tpu.ops import g2_jax
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G2_GEN_X,
    G2_GEN_Y,
    G2_INF,
    R,
    g2_add,
    g2_eq,
    g2_from_affine,
    g2_mul,
    g2_neg,
)
from crypto3_fil_proofs_tpu.ops.fr_limbs import fq_ops
from crypto3_fil_proofs_tpu.ops.pallas import g2 as pg2


def test_g2_madd_nodbl_edge_lanes(rng_seed):
    rng = random.Random(rng_seed)
    base = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    distinct = [g2_mul(base, rng.randrange(1, R)) for _ in range(8)]
    n = pg2.G2_BLOCK
    acc_pts, q_pts, valid, want = [], [], [], []
    for i in range(n):
        p = distinct[i % 8]
        q = distinct[(i // 8) % 8]
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

    (ax, ay), _ = g2_jax.points_to_device(
        [None if g2_eq(p, G2_INF) else p for p in acc_pts]
    )
    (qx, qy), _ = g2_jax.points_to_device(q_pts)
    one = jnp.broadcast_to(fq_ops.encode(1), (n, 24))
    zmask = jnp.asarray(
        np.array([0 if g2_eq(p, G2_INF) else 1 for p in acc_pts], np.uint32)
    )[:, None]
    az = (jnp.where(zmask != 0, one, 0), jnp.zeros((n, 24), jnp.uint32))
    vm = jnp.asarray(np.array(valid, np.uint32))

    T = lambda pair: (jnp.asarray(pair[0]).T, jnp.asarray(pair[1]).T)
    pt, same = pg2.madd_nodbl_soa(
        (T(ax), T(ay), (az[0].T, az[1].T)), (T(qx), T(qy)), vm
    )
    pt = pg2.dbl_soa(pt, same)
    got = g2_jax.points_from_device(
        tuple((c0.T, c1.T) for (c0, c1) in pt)
    )
    lanes = set(range(0, n, 37)) | set(range(5))
    for i in sorted(lanes):  # every edge kind, sampled across the block
        g = got[i] if got[i][2] != (0, 0) else G2_INF
        assert g2_eq(g, want[i]), f"lane {i} (kind {i % 5})"
