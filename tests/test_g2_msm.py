"""Batched G2 ops + curve-generic Pippenger on G2 vs host arithmetic."""
import random

import pytest

from crypto3_fil_proofs_tpu.ops import g2_jax as g2
from crypto3_fil_proofs_tpu.ops import msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G2_GEN_X,
    G2_GEN_Y,
    R,
    g2_add,
    g2_eq,
    g2_from_affine,
    g2_mul,
)


def _rand_points(count, seed):
    rng = random.Random(seed)
    gen = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    return [g2_mul(gen, rng.randrange(1, R)) for _ in range(count)]


def test_g2_double_add_match_host(rng_seed):
    pts = _rand_points(2, rng_seed)
    aff, _ = g2.points_to_device(pts)
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import fq_ops

    (x, y) = aff
    one = jnp.broadcast_to(fq_ops.encode(1), x[0].shape)
    zero = jnp.zeros_like(one)
    P = (x, y, (one, zero))
    got = g2.points_from_device(g2.double(P))
    for g, p in zip(got, pts):
        assert g2_eq(g, g2_add(p, p))
    # add: P0 + P1
    import jax

    Q = jax.tree_util.tree_map(lambda t: jnp.roll(t, -1, axis=0), P)
    got = g2.points_from_device(g2.add(P, Q))
    assert g2_eq(got[0], g2_add(pts[0], pts[1]))
    # mixed add vs jacobian add
    got = g2.points_from_device(g2.add_mixed(P, aff))
    for g, p in zip(got, pts):
        assert g2_eq(g, g2_add(p, p))  # same point -> doubling path


@pytest.mark.device_heavy
def test_g2_msm_matches_naive(rng_seed):
    rng = random.Random(rng_seed + 1)
    pts = _rand_points(8, rng_seed + 2)
    scalars = [rng.randrange(R) for _ in pts]
    scalars[0] = 0
    scalars[1] = 1
    got = msm_mod.msm_g2(pts, scalars, n_buckets=16)
    want = None
    acc = None
    for p, s in zip(pts, scalars):
        term = g2_mul(p, s)
        acc = term if acc is None else g2_add(acc, term)
    want = acc
    assert g2_eq(got, want)
