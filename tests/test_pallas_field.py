"""Pallas SoA field kernels vs the XLA limb kernels (bit-exact).

On CPU CI the kernels run in pallas interpret mode; on TPU they compile
through Mosaic (measured 2.6G montmuls/s at ROWS=32 — HBM-roofline-
bound — vs 42M/s for the XLA packed kernel).
"""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from crypto3_fil_proofs_tpu.ops.fr_limbs import FQ, FR, fq_ops, fr_ops
from crypto3_fil_proofs_tpu.ops.pallas.field import (
    fq_montmul_soa,
    fr_montmul_soa,
    pack_to_soa,
    soa_to_packed,
)


@pytest.mark.parametrize(
    "field,ops,kern",
    [(FQ, fq_ops, fq_montmul_soa), (FR, fr_ops, fr_montmul_soa)],
    ids=["fq", "fr"],
)
def test_pallas_montmul_matches_xla(field, ops, kern, rng_seed):
    rng = random.Random(rng_seed)
    N = 64
    a = jnp.asarray(field.to_limbs([rng.randrange(field.modulus) for _ in range(N)]))
    b = jnp.asarray(field.to_limbs([rng.randrange(field.modulus) for _ in range(N)]))
    want = np.asarray(ops.mont_mul(a, b))
    sa, _ = pack_to_soa(a)
    sb, _ = pack_to_soa(b)
    got = np.asarray(soa_to_packed(kern(sa, sb), N))
    assert np.array_equal(got, want)


def test_pallas_montmul_edge_values(rng_seed):
    """0, 1, p-1 products stay bit-exact through the pallas path."""
    vals_a = [0, 1, FQ.modulus - 1, FQ.modulus - 1]
    vals_b = [FQ.modulus - 1, FQ.modulus - 1, FQ.modulus - 1, 1]
    a = jnp.asarray(FQ.to_limbs(vals_a))
    b = jnp.asarray(FQ.to_limbs(vals_b))
    want = np.asarray(fq_ops.mont_mul(a, b))
    sa, _ = pack_to_soa(a)
    sb, _ = pack_to_soa(b)
    got = np.asarray(soa_to_packed(fq_montmul_soa(sa, sb), 4))
    assert np.array_equal(got, want)
