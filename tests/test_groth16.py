"""Groth16 end-to-end: setup/prove/verify on small circuits.

Mirrors the reference compound ladder's SNARK bottom layer
(core/proof/compound_proof.hpp prove/verify; 192-byte serialization
per constants.hpp:93 SINGLE_PARTITION_PROOF_LEN).
"""
import random

import pytest

from crypto3_fil_proofs_tpu.ops.bls12_381 import R
from crypto3_fil_proofs_tpu.zk import groth16
from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem, LinearCombination, lc_one
from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum


def _cubic_circuit(x: int) -> ConstraintSystem:
    """Prove knowledge of x with x^3 + x + 5 == out (public)."""
    cs = ConstraintSystem()
    xn = AllocatedNum.alloc(cs, x)
    x2 = xn.square(cs)
    x3 = x2.mul(cs, xn)
    out_val = (x3.value + xn.value + 5) % R
    out = AllocatedNum.alloc_input(cs, out_val)
    cs.enforce(
        x3.lc() + xn.lc() + LinearCombination.constant(5),
        lc_one(),
        out.lc(),
        "out",
    )
    return cs


@pytest.fixture(autouse=True)
def _purge_xla_per_test():
    """This module compiles the largest XLA:CPU programs in the suite
    (prove = NTT chain + 5 MSMs); with the whole suite's executables
    already resident, allocation failure inside backend_compile
    segfaults the process (r4: full-suite run died here silently).
    The per-module purge in conftest runs too late — clear per test."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="module")
def cubic_keypair():
    cs = _cubic_circuit(3)
    return groth16.setup(cs, seed=b"test-cubic"), cs


def test_groth16_roundtrip(cubic_keypair):
    pk, cs = cubic_keypair
    assert cs.is_satisfied()
    proof = groth16.prove(pk, cs)
    out_public = cs.values[cs.is_input.index(True, 1)]
    assert groth16.verify(pk.vk, proof, [out_public])
    # wrong public input rejects
    assert not groth16.verify(pk.vk, proof, [(out_public + 1) % R])


def test_groth16_proof_bytes_roundtrip_and_determinism(cubic_keypair):
    pk, cs = cubic_keypair
    p1 = groth16.prove(pk, cs, randomness=b"fixed")
    p2 = groth16.prove(pk, cs, randomness=b"fixed")
    b1, b2 = p1.to_bytes(), p2.to_bytes()
    assert len(b1) == 192
    assert b1 == b2  # fixed randomness -> byte-identical proof
    restored = groth16.Proof.from_bytes(b1)
    out_public = cs.values[cs.is_input.index(True, 1)]
    assert groth16.verify(pk.vk, restored, [out_public])
    # different blinding still verifies, different bytes
    p3 = groth16.prove(pk, cs, randomness=b"other")
    assert p3.to_bytes() != b1
    assert groth16.verify(pk.vk, p3, [out_public])


def test_groth16_wrong_witness_fails(cubic_keypair):
    pk, _ = cubic_keypair
    bad_cs = _cubic_circuit(4)  # different witness -> different public out
    proof = groth16.prove(pk, bad_cs)
    # verifying against the x=3 public output must fail
    good_out = (3**3 + 3 + 5) % R
    assert not groth16.verify(pk.vk, proof, [good_out])


def test_groth16_poseidon_preimage():
    """Prove knowledge of a Poseidon-2 preimage (hash public)."""
    from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash
    from crypto3_fil_proofs_tpu.zk.gadgets.poseidon import poseidon_hash_circuit

    rng = random.Random(7)
    pre = [rng.randrange(R), rng.randrange(R)]
    cs = ConstraintSystem()
    nums = [AllocatedNum.alloc(cs, v) for v in pre]
    digest = poseidon_hash_circuit(cs, nums, 2)
    digest.inputize(cs)
    assert cs.is_satisfied()
    pk = groth16.setup(cs, seed=b"test-poseidon")
    proof = groth16.prove(pk, cs)
    assert groth16.verify(pk.vk, proof, [poseidon_hash(pre, 2)])
    assert not groth16.verify(pk.vk, proof, [(poseidon_hash(pre, 2) + 1) % R])


def test_prove_many_partition_parallel_matches_serial(cubic_keypair):
    """prove_many (SURVEY P4 partition-parallel, one device per
    partition on the 8-dev mesh) is byte-identical to the serial loop
    (reference compound_proof.hpp:85-137 partition semantics)."""
    pk, _ = cubic_keypair
    cs_list = [_cubic_circuit(x) for x in (3, 4, 5)]
    serial = [
        groth16.prove(pk, cs, randomness=b"par-test" + bytes([k]))
        for k, cs in enumerate(cs_list)
    ]
    parallel = groth16.prove_many(pk, cs_list, randomness=b"par-test")
    assert [p.to_bytes() for p in parallel] == [p.to_bytes() for p in serial]
    for k, (cs, proof) in enumerate(zip(cs_list, parallel)):
        out_public = cs.values[cs.is_input.index(True, 1)]
        assert groth16.verify(pk.vk, proof, [out_public])


def test_device_normalize_batch_matches_host_staging(rng_seed):
    """g1/g2_jax.normalize_batch (device batch-inverse scans, the CRS
    staging path) is bit-identical to host points_to_device staging of
    the same Jacobian points, including infinity lanes."""
    import numpy as np
    import jax.numpy as jnp

    from crypto3_fil_proofs_tpu.ops import g1_jax, g2_jax
    from crypto3_fil_proofs_tpu.ops.bls12_381 import (
        G1_GEN,
        G2_GEN_X,
        G2_GEN_Y,
        g1_from_affine,
        g1_mul,
        g2_from_affine,
        g2_mul,
    )

    rng = random.Random(rng_seed)
    g1 = g1_from_affine(G1_GEN)
    pts = [g1_mul(g1, rng.randrange(1, R)) for _ in range(6)]
    pts.insert(2, (1, 1, 0))  # infinity lane
    X = jnp.stack([groth16.fq_ops.encode([p[0]])[0] for p in pts])
    Y = jnp.stack([groth16.fq_ops.encode([p[1]])[0] for p in pts])
    Z = jnp.stack([groth16.fq_ops.encode([p[2]])[0] for p in pts])
    x, y, v = g1_jax.normalize_batch(X, Y, Z)
    hx, hy, hv = g1_jax.points_to_device(pts)
    assert np.array_equal(np.asarray(x), np.asarray(hx))
    assert np.array_equal(np.asarray(y), np.asarray(hy))
    assert np.array_equal(np.asarray(v), np.asarray(hv))

    g2 = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    pts2 = [g2_mul(g2, rng.randrange(1, R)) for _ in range(4)]
    pts2.insert(1, (((1, 0)), ((1, 0)), ((0, 0))))  # infinity
    enc = lambda vals: jnp.stack(
        [groth16.fq_ops.encode([val])[0] for val in vals]
    )
    X2 = (enc([p[0][0] for p in pts2]), enc([p[0][1] for p in pts2]))
    Y2 = (enc([p[1][0] for p in pts2]), enc([p[1][1] for p in pts2]))
    Z2 = (enc([p[2][0] for p in pts2]), enc([p[2][1] for p in pts2]))
    (ax, ay), av = g2_jax.normalize_batch(X2, Y2, Z2)
    haff, hv2 = g2_jax.points_to_device(pts2)
    for got, want in zip((*ax, *ay), (*haff[0], *haff[1])):
        assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(av), np.asarray(hv2))
