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


def test_native_cpu_g2_msm_matches_naive(rng_seed):
    """Native multicore Pippenger G2 (ops/native_msm.msm_g2_cpu) vs host
    naive — the B2-commitment fallback backend must be correct."""
    import random

    import numpy as np

    from crypto3_fil_proofs_tpu.ops import native_msm
    from crypto3_fil_proofs_tpu.ops.bls12_381 import (
        G2_GEN_X,
        G2_GEN_Y,
        R,
        g2_add,
        g2_eq,
        g2_from_affine,
        g2_mul,
        g2_to_affine,
        G2_INF,
    )

    if native_msm.get_lib() is None:
        import pytest

        pytest.skip("native MSM unavailable (no cc)")
    rng = random.Random(rng_seed + 31)
    gen = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    n = 96
    pts = [g2_mul(gen, rng.randrange(1, R)) for _ in range(24)] * (n // 24)
    pts[2] = G2_INF
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = R - 1
    aff = [None if g2_eq(p, G2_INF) else g2_to_affine(p) for p in pts]
    got = native_msm.msm_g2_cpu(aff, scalars)
    want = G2_INF
    for p, s in zip(pts, scalars):
        want = g2_add(want, g2_mul(p, s))
    assert g2_eq(g2_from_affine(None) if got is None else got, want)


def test_msm_g2_native_staged_matches_naive(rng_seed):
    """groth16._msm_g2_native staged-query wrapper vs host naive."""
    import random

    import numpy as np

    from crypto3_fil_proofs_tpu.ops import g2_jax, native_msm
    from crypto3_fil_proofs_tpu.ops.bls12_381 import (
        G2_GEN_X,
        G2_GEN_Y,
        G2_INF,
        R,
        g2_add,
        g2_eq,
        g2_from_affine,
        g2_mul,
    )
    from crypto3_fil_proofs_tpu.zk.groth16 import _msm_g2_native

    if native_msm.get_lib() is None:
        import pytest

        pytest.skip("native MSM unavailable (no cc)")
    rng = random.Random(rng_seed + 37)
    gen = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    n = 64
    pts = [g2_mul(gen, rng.randrange(1, R)) for _ in range(16)] * (n // 16)
    pts[5] = G2_INF
    scalars = [rng.randrange(R) for _ in range(n)]
    aff, valid = g2_jax.points_to_device(pts)
    query = (
        tuple(tuple(np.asarray(c) for c in pair) for pair in aff),
        np.asarray(valid),
    )
    got = _msm_g2_native(query, scalars)
    want = G2_INF
    for p, s in zip(pts, scalars):
        want = g2_add(want, g2_mul(p, s))
    assert g2_eq(got, want)
