"""Template-tiled emission (zk/gadgets/tiled.py) vs the scalar gadgets.

The tiled path must be semantically identical to the scalar gadgets it
captures: same constraint count, satisfied by the vectorized witness
replay, same digests. fr_vec (the host limb kernels under FieldBlock
evaluation) is pinned against python-int math.
"""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import fr_vec as fv
from crypto3_fil_proofs_tpu.ops.bls12_381 import R
from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash
from crypto3_fil_proofs_tpu.zk.gadgets import tiled
from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum
from crypto3_fil_proofs_tpu.zk.gadgets.poseidon import poseidon_hash_circuit
from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem


def test_fr_vec_matches_int_math(rng_seed):
    rng = random.Random(rng_seed)
    xs = [rng.randrange(R) for _ in range(257)] + [0, 1, R - 1]
    ys = [rng.randrange(R) for _ in range(257)] + [R - 1, 0, R - 1]
    a, b = fv.to_v(xs), fv.to_v(ys)
    assert fv.from_v(fv.mul_mod(a, b)) == [
        x * y % R for x, y in zip(xs, ys)
    ]
    assert fv.from_v(fv.add_mod(a, b)) == [
        (x + y) % R for x, y in zip(xs, ys)
    ]
    rinv = pow(fv.FR.mont_r, -1, R)
    assert fv.from_v(fv.mont_mul(a, b)) == [
        x * y * rinv % R for x, y in zip(xs, ys)
    ]
    indptr = np.array([0, 1, 5, 5, len(xs)], np.int64)
    assert fv.from_v(fv.sum_mod_csr(a, indptr)) == [
        xs[0],
        sum(xs[1:5]) % R,
        0,
        sum(xs[5:]) % R,
    ]


@pytest.mark.parametrize("arity", [2, 8, 11])
def test_tiled_poseidon_matches_scalar(arity, rng_seed):
    rng = random.Random(rng_seed + arity)
    K = 9
    pre = [[rng.randrange(R) for _ in range(arity)] for _ in range(K)]
    cs1 = ConstraintSystem()
    for row in pre:
        poseidon_hash_circuit(
            cs1, [AllocatedNum.alloc(cs1, v) for v in row], arity
        )
    cs2 = ConstraintSystem()
    iv = np.empty((K, arity), np.int64)
    for k in range(K):
        for i in range(arity):
            iv[k, i] = cs2.alloc(pre[k][i])
    vals_v = fv.to_v([v for row in pre for v in row]).reshape(K, arity, 16)
    dvars, dvals = tiled.poseidon_circuit_batch(cs2, iv, vals_v, arity)
    assert cs2.num_constraints == cs1.num_constraints
    assert fv.from_v(dvals) == [poseidon_hash(p, arity) for p in pre]
    assert [cs2.values[v] for v in dvars.tolist()] == fv.from_v(dvals)
    assert cs2.which_unsatisfied() is None


def test_tiled_poseidon_tamper_detected(rng_seed):
    rng = random.Random(rng_seed)
    K, arity = 4, 8
    pre = [[rng.randrange(R) for _ in range(arity)] for _ in range(K)]
    cs = ConstraintSystem()
    iv = np.empty((K, arity), np.int64)
    for k in range(K):
        for i in range(arity):
            iv[k, i] = cs.alloc(pre[k][i])
    vals_v = fv.to_v([v for row in pre for v in row]).reshape(K, arity, 16)
    dvars, _ = tiled.poseidon_circuit_batch(cs, iv, vals_v, arity)
    cs.values[int(dvars[2])] = (cs.values[int(dvars[2])] + 1) % R
    assert cs.which_unsatisfied() is not None


def test_tiled_por_matches_scalar(rng_seed):
    from crypto3_fil_proofs_tpu.core.merkle import MerkleTree
    from crypto3_fil_proofs_tpu.zk.gadgets.por import (
        pack_position_bits_into_inputs,
        packed_position_input_values,
        por_circuit,
    )

    rng = random.Random(rng_seed)
    leaves = np.zeros((64, 32), np.uint8)
    for i in range(64):
        leaves[i] = np.frombuffer(
            rng.randrange(R).to_bytes(32, "little"), np.uint8
        )
    tree = MerkleTree.build(leaves, 8, "poseidon")
    root_int = int.from_bytes(tree.root(), "little")
    K = 5
    chals = [rng.randrange(64) for _ in range(K)]
    proofs = [tree.gen_proof(c) for c in chals]
    arities = tuple(len(s) + 1 for s, _ in proofs[0].as_options())
    total_bits = sum(
        (len(s)).bit_length() for s, _ in proofs[0].as_options()
    )

    cs1 = ConstraintSystem()
    for p in proofs:
        root = AllocatedNum.alloc(cs1, root_int)
        leaf = AllocatedNum.alloc(cs1, int.from_bytes(p.leaf, "little"))
        bits = por_circuit(cs1, leaf, p.as_options(), root)
        pack_position_bits_into_inputs(cs1, bits)
    assert cs1.is_satisfied()

    cs2 = ConstraintSystem()
    root_vars = np.array(
        [cs2.alloc(root_int) for _ in range(K)], np.int64
    )
    packed_vars = np.empty((K, 1), np.int64)
    for k, c in enumerate(chals):
        packed_vars[k, 0] = cs2.alloc_input(
            packed_position_input_values(c, total_bits)[0]
        )
    leaf_v = tiled.bytes_rows_to_v([p.leaf for p in proofs])
    levels = []
    for lvl in range(len(arities)):
        sibs = tiled.bytes_rows_to_v(
            [s for p in proofs for s in p.as_options()[lvl][0]]
        ).reshape(K, arities[lvl] - 1, 16)
        idx = np.asarray(
            [p.as_options()[lvl][1] for p in proofs], np.int64
        )
        levels.append((sibs, idx))
    tiled.por_circuit_batch(cs2, root_vars, packed_vars, arities, leaf_v, levels)
    assert cs2.num_constraints == cs1.num_constraints
    assert cs2.which_unsatisfied() is None
    # wrong root breaks it
    cs2.values[int(root_vars[0])] = (root_int + 1) % R
    assert cs2.which_unsatisfied() is not None


def test_jax_witness_matches_numpy_replay(rng_seed):
    rng = random.Random(rng_seed)
    for arity, K in ((2, 5), (8, 5), (2, 70)):
        # K=70 crosses the production dispatch threshold (>=64 -> jax);
        # compare the oracle directly so the check never goes vacuous
        pre = fv.to_v(
            [rng.randrange(R) for _ in range(K * arity)]
        ).reshape(K, arity, 16)
        want = tiled._poseidon_witness_numpy(pre, arity)
        got = tiled.poseidon_witness_jax(pre, arity)
        assert got.shape == want.shape
        assert (got == want).all()
        via_dispatch = tiled.poseidon_witness_v(pre, arity)
        assert (via_dispatch == want).all()


def test_blank_tiled_partition_counts_match_scalar_sector():
    """Blank (witness-free) tiled partition emits exactly the scalar
    per-sector constraint count, at >1M c/s."""
    import time

    from crypto3_fil_proofs_tpu.models.post.fallback import circuit as fc
    from crypto3_fil_proofs_tpu.models.post.fallback.compound import (
        blank_partition_proof,
    )
    from crypto3_fil_proofs_tpu.models.post.fallback.vanilla import (
        PublicInputs,
        PublicParams,
        PublicSector,
    )

    pp = PublicParams(
        sector_size=32 * 2**30, challenge_count=10, sector_count=40
    )
    proof = blank_partition_proof(pp, (8, 8, 2))
    blank_inputs = PublicInputs(
        randomness=b"\x00" * 32,
        prover_id=b"\x00" * 32,
        sectors=[PublicSector(id=0, comm_r=b"\x00" * 32)] * pp.sector_count,
    )
    t0 = time.time()
    cs = fc.circuit_from_vanilla(pp, blank_inputs, proof, 0, blank=True)
    dt = time.time() - t0
    assert cs.num_constraints == 45369 * 40  # 45,369/sector (scalar parity)
    assert cs.num_constraints / dt > 1e6, f"only {cs.num_constraints/dt:.0f} c/s"
