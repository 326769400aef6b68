"""Multi-chip sharded kernels on the 8-virtual-device CPU mesh.

Validates that sharded results are bit-identical to single-device ones
— the multi-host test our reference lacks (SURVEY §4: "same proof bytes
at 1 chip vs N hosts").
"""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.parallel import sharded
from crypto3_fil_proofs_tpu.ops import g1_jax
from crypto3_fil_proofs_tpu.ops import msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G1_GEN,
    R,
    g1_eq,
    g1_from_affine,
    g1_mul,
    g1_msm_naive,
)


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(8)


def test_sharded_tree_matches_local(mesh, rng_seed):
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import FR
    from crypto3_fil_proofs_tpu.ops.poseidon_jax import (
        hash_level_mont,
        poseidon_hash_mont,
    )

    rng = np.random.default_rng(rng_seed)
    leaves = jnp.asarray(
        rng.integers(0, 1 << 16, size=(8 * 64, FR.n), dtype=np.uint32)
    )
    roots, top = sharded.build_tree_sharded(leaves, 8, mesh)
    # single-device reference: same sub-tree split + arity-2 fold
    want_roots = []
    for i in range(8):
        lvl = leaves[i * 64 : (i + 1) * 64]
        while lvl.shape[0] > 1:
            lvl = hash_level_mont(lvl, 8)
        want_roots.append(np.asarray(lvl[0]))
    assert np.array_equal(np.asarray(roots), np.stack(want_roots))
    fold = jnp.asarray(np.stack(want_roots))
    while fold.shape[0] > 1:
        fold = poseidon_hash_mont(fold.reshape(fold.shape[0] // 2, 2, -1), 2)
    assert np.array_equal(np.asarray(top), np.asarray(fold[0]))


def test_sharded_msm_matches_naive(mesh, rng_seed):
    rng = random.Random(rng_seed)
    n = 32  # 4 points per device
    pts = [g1_mul(g1_from_affine(G1_GEN), rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    px, py, _ = g1_jax.points_to_device(pts)
    sc = msm_mod.scalars_to_device(scalars)
    out = sharded.msm_sharded((px, py), sc, mesh, n_buckets=16)
    got = g1_jax.points_from_device(
        tuple(np.asarray(t)[None] for t in out)
    )[0]
    assert g1_eq(got, g1_msm_naive(pts, scalars))


def test_sharded_ntt_matches_single_chip(mesh, rng_seed):
    """Four-step all_to_all NTT (SURVEY P6) is bit-identical to the
    single-chip transform, forward and inverse, at 2^12 on 8 devices."""
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops.fr_limbs import FR, fr_ops
    from crypto3_fil_proofs_tpu.ops import ntt as ntt_mod

    log_n = 12
    rng = np.random.default_rng(rng_seed)
    raw = rng.integers(0, 1 << 16, size=(1 << log_n, FR.n), dtype=np.uint32)
    raw[:, 15] &= 0x3FFF
    a = jnp.asarray(raw)
    want = ntt_mod.ntt(a, log_n)
    got = sharded.ntt_sharded(a, log_n, mesh)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    # inverse roundtrip through the sharded path
    back = sharded.ntt_sharded(got, log_n, mesh, inverse=True)
    assert np.array_equal(np.asarray(back), np.asarray(a))
