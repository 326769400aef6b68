"""Bucket-aggregation algebra of the Pallas MSM, in the default gate.

The aggregation stages in ops/pallas/msm.py are generic over a curve
adapter (zeros/add/dbl/zero_z/block) and only use abelian-group
identities, so they can be verified exactly on CPU with an integer
mock group (lanewise addition) — no TPU kernels involved. This pins
sum_b b*S_b for both the flat suffix-scan (_aggregate_soa) and the
hi/lo split (_aggregate_split) against a direct numpy weighted sum,
covering even/odd window-size splits and the padding contracts
(reference semantics: core/proof/compound_proof.hpp prove -> Pippenger
bucket method).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops.pallas.msm import (
    _aggregate_soa,
    _aggregate_split,
    _tmap,
)

class _IntOps:
    """Mock curve adapter: a 'point' is one integer per lane, the group
    law is lanewise addition. zero_z(v, keep) models forcing lanes to
    the identity. Planes keep the [N_LIMBS, m] shape contract (axis 0
    is opaque to the aggregation code)."""

    block = 8
    name = "int"

    @staticmethod
    def add(a, b):
        return _tmap(lambda x, y: x + y, a, b)

    @staticmethod
    def dbl(p, mask):
        return _tmap(lambda x: jnp.where(mask[None, :] != 0, x * 2, x), p)

    @staticmethod
    def zero_z(v, keep):
        return _tmap(lambda x: jnp.where(keep[None, :], x, 0), v)


@pytest.mark.parametrize("W,B", [(2, 16), (3, 64), (16, 128), (13, 256)])
def test_aggregate_flat_and_split_match_direct(W, B):
    rng = np.random.default_rng(W * 1000 + B)
    # x64 is disabled under jax, so lanes are int32: keep values small
    # enough that sum_b b*S_b < 2^31 at the largest (W, B)
    lanes = rng.integers(0, 1 << 10, size=(2, W * B)).astype(np.int32)
    acc = jnp.asarray(lanes)

    want = (
        lanes.reshape(2, W, B).astype(np.int64)
        * np.arange(B)[None, None, :]
    ).sum(axis=2).astype(np.int32)

    flat = np.asarray(_aggregate_soa(_IntOps, acc, W, B))
    split = np.asarray(_aggregate_split(_IntOps, acc, W, B))
    np.testing.assert_array_equal(flat, want)
    np.testing.assert_array_equal(split, want)


def test_aggregate_split_odd_c():
    # odd log2(B): Bhi != Blo (the c=21-style asymmetric split)
    W, B = 3, 32
    rng = np.random.default_rng(7)
    lanes = rng.integers(0, 1 << 10, size=(1, W * B)).astype(np.int32)
    acc = jnp.asarray(lanes)
    want = (
        lanes.reshape(1, W, B).astype(np.int64)
        * np.arange(B)[None, None, :]
    ).sum(axis=2).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(_aggregate_split(_IntOps, acc, W, B)), want
    )
