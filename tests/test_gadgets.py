"""Circuit gadget tests: satisfaction + golden-value parity with vanilla."""
import hashlib
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops.bls12_381 import R
from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash
from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem, LinearCombination, lc_one
from crypto3_fil_proofs_tpu.zk.gadgets.boolean import AllocatedBit, Boolean
from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum, pick
from crypto3_fil_proofs_tpu.zk.gadgets.uint32 import UInt32
from crypto3_fil_proofs_tpu.zk.gadgets import sha256 as sha_gadget
from crypto3_fil_proofs_tpu.zk.gadgets.poseidon import poseidon_hash_circuit
from crypto3_fil_proofs_tpu.zk.gadgets.insertion import insert
from crypto3_fil_proofs_tpu.zk.gadgets.por import por_circuit, sha256_node_circuit


def test_boolean_ops():
    cs = ConstraintSystem()
    for av in (0, 1):
        for bv in (0, 1):
            a, b = Boolean.alloc(cs, av), Boolean.alloc(cs, bv)
            assert Boolean.xor(cs, a, b).value == av ^ bv
            assert Boolean.and_(cs, a, b).value == av & bv
            assert Boolean.and_(cs, a.not_(), b).value == (1 - av) & bv
            assert Boolean.xor(cs, a.not_(), b).value == (1 - av) ^ bv
    assert cs.is_satisfied()


def test_num_ops(rng_seed):
    rng = random.Random(rng_seed)
    cs = ConstraintSystem()
    a = AllocatedNum.alloc(cs, rng.randrange(R))
    b = AllocatedNum.alloc(cs, rng.randrange(R))
    assert a.mul(cs, b).value == a.value * b.value % R
    assert a.add(cs, b).value == (a.value + b.value) % R
    bits = a.to_bits_le(cs)
    assert AllocatedNum.from_bits_le(cs, bits).value == a.value
    cond = Boolean.alloc(cs, 1)
    assert pick(cs, cond, a, b).value == a.value
    assert cs.is_satisfied()
    # tampered witness breaks satisfaction
    cs2 = ConstraintSystem()
    x = AllocatedNum.alloc(cs2, 5)
    y = x.mul(cs2, x)
    cs2.values[y.var] = 24  # wrong
    assert not cs2.is_satisfied()


def test_uint32_addmany():
    cs = ConstraintSystem()
    vals = [0xFFFFFFFF, 0x12345678, 0x9ABCDEF0]
    ops = [UInt32.alloc(cs, v) for v in vals]
    out = UInt32.addmany(cs, ops)
    assert out.value == sum(vals) & 0xFFFFFFFF
    assert cs.is_satisfied()


def test_sha256_circuit_matches_hashlib(rng_seed):
    rng = random.Random(rng_seed)
    data = bytes(rng.randrange(256) for _ in range(64))
    cs = ConstraintSystem()
    bits = sha_gadget.bytes_to_bits_be(cs, data)
    digest_bits = sha_gadget.sha256(cs, bits)
    got = bytes(
        sum(digest_bits[i * 8 + (7 - j)].value << j for j in range(8))
        for i in range(32)
    )
    assert got == hashlib.sha256(data).digest()
    assert cs.is_satisfied()


def test_sha256_block_no_padding_matches_vanilla_node(rng_seed):
    """64-byte two-child node hash must equal the vanilla tree_d hasher."""
    from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend

    rng = np.random.default_rng(rng_seed)
    left = bytes(rng.integers(0, 64, size=32, dtype=np.uint8))
    right = bytes(rng.integers(0, 64, size=32, dtype=np.uint8))
    want = get_backend("sha256").hash_single([left, right])

    cs = ConstraintSystem()
    ln = AllocatedNum.alloc(cs, int.from_bytes(left, "little"))
    rn = AllocatedNum.alloc(cs, int.from_bytes(right, "little"))
    out = sha256_node_circuit(cs, [ln, rn])
    assert out.value == int.from_bytes(want, "little")
    assert cs.is_satisfied()


@pytest.mark.parametrize("arity", [2, 8])
def test_poseidon_circuit_matches_host(arity, rng_seed):
    rng = random.Random(rng_seed + arity)
    preimage = [rng.randrange(R) for _ in range(arity)]
    cs = ConstraintSystem()
    nums = [AllocatedNum.alloc(cs, v) for v in preimage]
    out = poseidon_hash_circuit(cs, nums, arity)
    assert out.value == poseidon_hash(preimage, arity)
    assert cs.is_satisfied()


@pytest.mark.parametrize("arity", [2, 4, 8])
def test_insertion(arity, rng_seed):
    rng = random.Random(rng_seed + arity)
    for index in range(arity):
        cs = ConstraintSystem()
        el = AllocatedNum.alloc(cs, rng.randrange(R))
        sibs = [AllocatedNum.alloc(cs, rng.randrange(R)) for _ in range(arity - 1)]
        n_bits = (arity - 1).bit_length()
        bits = [Boolean.alloc(cs, (index >> i) & 1) for i in range(n_bits)]
        out = insert(cs, el, bits, sibs)
        want = [s.value for s in sibs]
        want.insert(index, el.value)
        assert [o.value for o in out] == want
        assert cs.is_satisfied()


@pytest.mark.parametrize("backend,arity", [("poseidon", 8), ("sha256", 2)])
def test_por_circuit_validates_vanilla_proof(backend, arity, rng_seed, tmp_path):
    from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree

    rng = np.random.default_rng(rng_seed)
    leafs = arity ** 2
    data = rng.integers(0, 64, size=(leafs, 32), dtype=np.uint8).astype(np.uint8)
    tree = MerkleTree.build(data, arity, backend)
    challenge = int(rng.integers(leafs))
    proof = tree.gen_proof(challenge)
    assert proof.validate()

    cs = ConstraintSystem()
    leaf = AllocatedNum.alloc(cs, int.from_bytes(proof.leaf, "little"))
    root = AllocatedNum.alloc(cs, int.from_bytes(proof.root, "little"))
    bits = por_circuit(cs, leaf, proof.as_options(), root, hasher=backend)
    assert cs.is_satisfied()
    # position bits reconstruct the challenge
    got = sum(b.value << i for i, b in enumerate(bits))
    assert got == challenge
    # tampered root fails
    cs2 = ConstraintSystem()
    leaf2 = AllocatedNum.alloc(cs2, int.from_bytes(proof.leaf, "little"))
    bad_root = AllocatedNum.alloc(
        cs2, (int.from_bytes(proof.root, "little") + 1) % R
    )
    por_circuit(cs2, leaf2, proof.as_options(), bad_root, hasher=backend)
    assert not cs2.is_satisfied()
