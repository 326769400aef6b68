"""Batched G1 curve ops + Pippenger MSM vs host golden arithmetic."""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import g1_jax as g1
from crypto3_fil_proofs_tpu.ops import msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G1_GEN,
    G1_INF,
    R,
    g1_add,
    g1_eq,
    g1_from_affine,
    g1_mul,
    g1_msm_naive,
)


def _rand_points(count, seed):
    rng = random.Random(seed)
    return [g1_mul(g1_from_affine(G1_GEN), rng.randrange(1, R)) for _ in range(count)]


def _eq_host(dev_point, host_point):
    return g1_eq(dev_point, host_point)


def test_double_add_match_host(rng_seed):
    pts = _rand_points(4, rng_seed)
    X, Y, Z = [], [], []
    for p in pts:
        px, py, _ = g1.points_to_device([p])
        X.append(px[0])
        Y.append(py[0])
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import fq_ops

    xs = jnp.stack(X)
    ys = jnp.stack(Y)
    ones = jnp.broadcast_to(fq_ops.encode(1), xs.shape)
    P = (xs, ys, ones)
    # doubling
    got = g1.points_from_device(g1.double(P))
    for g, p in zip(got, pts):
        assert _eq_host(g, g1_add(p, p))
    # pairwise add: P[i] + P[(i+1)%n]
    Q = (jnp.roll(xs, -1, 0), jnp.roll(ys, -1, 0), jnp.roll(ones, -1, 0))
    got = g1.points_from_device(g1.add(P, Q))
    for i, g in enumerate(got):
        assert _eq_host(g, g1_add(pts[i], pts[(i + 1) % len(pts)]))


def test_add_edge_cases(rng_seed):
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import fq_ops

    p = _rand_points(1, rng_seed + 9)[0]
    px, py, _ = g1.points_to_device([p])
    one = jnp.broadcast_to(fq_ops.encode(1), px.shape)
    P = (px, py, one)
    inf = g1.infinity((1,))
    # P + inf = P; inf + P = P; P + P = 2P; P + (-P) = inf
    assert _eq_host(g1.points_from_device(g1.add(P, inf))[0], p)
    assert _eq_host(g1.points_from_device(g1.add(inf, P))[0], p)
    assert _eq_host(g1.points_from_device(g1.add(P, P))[0], g1_add(p, p))
    negy = fq_ops.neg(py)
    negP = (px, negy, one)
    got = g1.points_from_device(g1.add(P, negP))[0]
    assert got[2] == 0  # infinity
    # mixed add edge cases
    got = g1.points_from_device(g1.add_mixed(inf, (px, py)))[0]
    assert _eq_host(got, p)
    got = g1.points_from_device(g1.add_mixed(P, (px, py)))[0]
    assert _eq_host(got, g1_add(p, p))
    got = g1.points_from_device(g1.add_mixed(P, (px, negy)))[0]
    assert got[2] == 0
    # masked-out q keeps p
    got = g1.points_from_device(
        g1.add_mixed(P, (px, py), jnp.asarray([False]))
    )[0]
    assert _eq_host(got, p)


# All MSM tests share ONE device shape (N=32, 16 buckets) so the large
# XLA program compiles once (persistent cache shares it across runs).
_MSM_N = 32
_MSM_BUCKETS = 16


def test_msm_matches_naive(rng_seed):
    rng = random.Random(rng_seed)
    pts = _rand_points(_MSM_N, rng_seed + 1)
    scalars = [rng.randrange(R) for _ in pts]
    # edge scalars + duplicated points (the bench tiling case)
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    pts[5] = pts[4]
    pts[6] = pts[4]
    got = msm_mod.msm(pts, scalars, n_buckets=_MSM_BUCKETS)
    want = g1_msm_naive(pts, scalars)
    assert g1_eq(got, want)


def test_msm_all_zero_scalars(rng_seed):
    pts = _rand_points(_MSM_N, rng_seed + 2)
    got = msm_mod.msm(pts, [0] * _MSM_N, n_buckets=_MSM_BUCKETS)
    assert got[2] == 0  # infinity


def test_native_cpu_msm_matches_naive(rng_seed):
    """Native multicore Pippenger (ops/native_msm) vs host naive — the
    bench baseline and the prove() fallback backend must be correct."""
    from crypto3_fil_proofs_tpu.ops import native_msm

    if native_msm.get_lib() is None:
        pytest.skip("native MSM unavailable (no cc)")
    rng = random.Random(rng_seed + 7)
    n = 512
    pts = _rand_points(64, rng_seed + 7) * (n // 64)
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = R - 1
    from crypto3_fil_proofs_tpu.ops.bls12_381 import g1_to_affine

    aff = [g1_to_affine(p) for p in pts]
    got = native_msm.msm_g1_cpu(aff, scalars)
    want = g1_msm_naive(pts, scalars)
    assert g1_eq(got, want)


def test_msm_g1_native_staged_matches_naive(rng_seed):
    """groth16._msm_g1_native (staged-query wrapper: Montgomery decode,
    infinity masking, byte packing) vs host naive."""
    from crypto3_fil_proofs_tpu.ops import native_msm
    from crypto3_fil_proofs_tpu.zk.groth16 import _msm_g1_native

    if native_msm.get_lib() is None:
        pytest.skip("native MSM unavailable (no cc)")
    rng = random.Random(rng_seed + 11)
    n = 256
    pts = _rand_points(32, rng_seed + 11) * (n // 32)
    pts[3] = G1_INF  # exercise the valid-mask path
    scalars = [rng.randrange(R) for _ in range(n)]
    query = tuple(np.asarray(t) for t in g1.points_to_device(pts))
    got = _msm_g1_native(query, scalars)
    want = g1_msm_naive(
        [p for p, s in zip(pts, scalars)],
        scalars,
    )
    assert g1_eq(got, want)


@pytest.mark.parametrize("c", [4, 8, 16, 20, 21, 22])
def test_reslice_digits_any_c(rng_seed, c):
    """Window extraction for arbitrary c must match big-int windowing
    (limb-straddling assembly; used by the generalized-window Pallas
    MSM, reference compound_proof.hpp prove -> bucket method)."""
    rng = random.Random(rng_seed + c)
    scalars = [rng.randrange(R) for _ in range(64)] + [0, 1, R - 1]
    dev = msm_mod.scalars_to_device(scalars)
    digits = np.asarray(msm_mod._reslice_digits(dev, 1 << c))
    W = digits.shape[0]
    assert W * c >= 255
    for i, s in enumerate(scalars):
        for w in range(W):
            assert digits[w, i] == (s >> (w * c)) & ((1 << c) - 1), (
                c, i, w,
            )
