"""Batched JAX Poseidon vs host golden reference (bit-exact)."""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import poseidon_jax as pj
from crypto3_fil_proofs_tpu.ops.bls12_381 import R
from crypto3_fil_proofs_tpu.ops.fr_limbs import fr_ops
from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash
from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend


@pytest.mark.parametrize("arity", [2, 8, 11])
def test_poseidon_jax_matches_host(arity, rng_seed):
    rng = random.Random(rng_seed + arity)
    batch = 5
    pre = [[rng.randrange(R) for _ in range(arity)] for _ in range(batch)]
    mont = fr_ops.encode([v for row in pre for v in row]).reshape(
        batch, arity, -1
    )
    got = fr_ops.decode(pj.poseidon_hash_mont(mont, arity))
    want = [poseidon_hash(row, arity) for row in pre]
    assert got == want


def test_jax_backend_matches_host_backend(rng_seed):
    rng = np.random.default_rng(rng_seed)
    # random valid Fr elements as LE bytes (mask top bits)
    nodes = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    nodes[:, 31] &= 0x3F
    host = get_backend("poseidon").hash_level(nodes, 8)
    tpu = get_backend("poseidon-jax").hash_level(nodes, 8)
    assert np.array_equal(host, tpu)


@pytest.mark.skipif(
    __import__("os").environ.get("FIL_PROOFS_TEST_MXU") != "1",
    reason="XLA-CPU compiles the MXU permute very slowly (~30 min); "
    "run explicitly with FIL_PROOFS_TEST_MXU=1",
)
def test_mxu_permute_matches_host(rng_seed):
    """The TPU (MXU byte-plane mix) permutation path, forced on CPU,
    must be bit-exact with the host reference."""
    rng = random.Random(rng_seed + 99)
    arity = 2
    pre = [[rng.randrange(R) for _ in range(arity)] for _ in range(3)]
    mont = fr_ops.encode([v for row in pre for v in row]).reshape(3, arity, -1)
    got = fr_ops.decode(pj._poseidon_hash_mont(mont, arity, True))
    assert got == [poseidon_hash(row, arity) for row in pre]


def test_hash_single(rng_seed):
    rng = np.random.default_rng(rng_seed + 7)
    children = [bytes(rng.integers(0, 64, size=32, dtype=np.uint8)) for _ in range(2)]
    host = get_backend("poseidon").hash_single(children)
    tpu = get_backend("poseidon-jax").hash_single(children)
    assert host == tpu
