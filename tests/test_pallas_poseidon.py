"""Pallas whole-permutation Poseidon kernel vs the host permutation.

TPU-only by default: interpret mode (CPU CI) takes ~8 min for one
arity-8 batch (65 rounds of 16-limb CIOS inside the emulated kernel),
so off-TPU these skip. Run manually with the axon tunnel up:
`pytest tests/test_pallas_poseidon.py`. The host permutation these
compare against is itself pinned by tests/test_poseidon.py (arity
2/8/11 on-device bit-exactness) and the published zerocomm anchors
(tests/test_golden.py).
"""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() == "cpu":
    pytest.skip(
        "pallas poseidon kernel needs a TPU (interpret mode ~8 min/batch)",
        allow_module_level=True,
    )

import jax.numpy as jnp

from crypto3_fil_proofs_tpu.ops.fr_limbs import FR
from crypto3_fil_proofs_tpu.ops.pallas.poseidon import hash_level_packed
from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash


@pytest.mark.parametrize("arity", [2, 8])
def test_pallas_poseidon_matches_host(arity, rng_seed):
    rng = random.Random(rng_seed + arity)
    batch = 64
    n = batch * arity
    vals = [rng.randrange(FR.modulus) for _ in range(n)]
    mont = [(v * FR.mont_r) % FR.modulus for v in vals]
    nodes = jnp.asarray(FR.to_limbs(mont))
    out = np.asarray(hash_level_packed(nodes, arity))
    r_inv = pow(FR.mont_r, -1, FR.modulus)
    got = [(int(x) * r_inv) % FR.modulus for x in FR.from_limbs(out)]
    want = [
        poseidon_hash(vals[i * arity : (i + 1) * arity], arity)
        for i in range(batch)
    ]
    assert got == want


def test_pallas_poseidon_edge_values(rng_seed):
    """0 and p-1 preimage elements stay bit-exact."""
    arity = 8
    vals = [0, FR.modulus - 1] * 4
    mont = [(v * FR.mont_r) % FR.modulus for v in vals]
    nodes = jnp.asarray(FR.to_limbs(mont))
    out = np.asarray(hash_level_packed(nodes, arity))
    r_inv = pow(FR.mont_r, -1, FR.modulus)
    got = (int(FR.from_limbs(out)[0]) * r_inv) % FR.modulus
    assert got == poseidon_hash(vals, arity)
