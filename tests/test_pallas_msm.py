"""Pallas-kernel Pippenger MSM vs host naive MSM.

TPU-only: the fused point kernels run through Mosaic; interpret mode
(CPU CI) would take minutes per mixed-add pass, so these tests skip
off-TPU. Run manually with the axon tunnel up, or on any TPU host:
`pytest tests/test_pallas_msm.py -m ''`. bench.py exercises the same
path for the driver on real hardware.
"""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() == "cpu":
    pytest.skip(
        "pallas MSM kernels need a TPU (interpret mode is minutes/add)",
        allow_module_level=True,
    )

from crypto3_fil_proofs_tpu.ops import g1_jax, msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G1_GEN,
    R,
    g1_eq,
    g1_from_affine,
    g1_mul,
    g1_msm_naive,
)
from crypto3_fil_proofs_tpu.ops.pallas.msm import msm_pallas


def test_msm_pallas_matches_naive(rng_seed):
    rng = random.Random(rng_seed)
    n = 4096
    base = g1_from_affine(G1_GEN)
    pts = [g1_mul(base, rng.randrange(1, R)) for _ in range(256)] * (n // 256)
    scalars = [rng.randrange(R) for _ in range(n)]
    px, py, _ = g1_jax.points_to_device(pts)
    sc = np.asarray(msm_mod.scalars_to_device(scalars))
    got = msm_pallas((np.asarray(px), np.asarray(py)), sc, n_buckets=256)
    want = g1_msm_naive(pts, scalars)
    assert g1_eq(got, want)


def test_msm_pallas_zero_and_edge_scalars(rng_seed):
    rng = random.Random(rng_seed + 1)
    n = 2048
    base = g1_from_affine(G1_GEN)
    pts = [g1_mul(base, rng.randrange(1, R)) for _ in range(128)] * (n // 128)
    scalars = [0] * n
    scalars[0] = 1
    scalars[1] = R - 1
    scalars[5] = (1 << 255) % R
    px, py, _ = g1_jax.points_to_device(pts)
    sc = np.asarray(msm_mod.scalars_to_device(scalars))
    got = msm_pallas((np.asarray(px), np.asarray(py)), sc, n_buckets=256)
    want = g1_msm_naive(pts, scalars)
    assert g1_eq(got, want)
