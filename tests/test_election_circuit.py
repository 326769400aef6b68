"""Election PoSt circuit: satisfaction + input parity + tamper."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree
from crypto3_fil_proofs_tpu.models.post.election import vanilla as election
from crypto3_fil_proofs_tpu.models.post.election import circuit as ecirc
from crypto3_fil_proofs_tpu.ops.poseidon import hash2

SECTOR = 2048
LEAVES = SECTOR // 32


def test_election_circuit(rng_seed):
    pp = election.ElectionPoSt.setup(
        election.SetupParams(sector_size=SECTOR, challenge_count=2, challenged_nodes=1)
    )
    rng = np.random.default_rng(rng_seed)
    leaves = rng.integers(0, 64, size=(LEAVES, 32), dtype=np.uint8)
    tree = MerkleTree.build(leaves, 8, "poseidon")
    comm_c = bytes([5] * 32)
    randomness = bytes([7] * 31 + [0])
    prover_id = bytes([3] * 31 + [0])
    comm_r = hash2(
        int.from_bytes(comm_c, "little"), int.from_bytes(tree.root(), "little")
    ).to_bytes(32, "little")
    cand = election.generate_candidate(pp, tree, prover_id, 11, randomness, 0)
    pub = election.PublicInputs(
        randomness=randomness,
        sector_id=11,
        prover_id=prover_id,
        comm_r=comm_r,
        partial_ticket=cand.partial_ticket,
        sector_challenge_index=0,
    )
    priv = election.PrivateInputs(tree=tree, comm_c=comm_c, comm_r_last=tree.root())
    proof = election.ElectionPoSt.prove(pp, pub, priv)
    assert election.ElectionPoSt.verify(pp, pub, proof)

    cs = ecirc.circuit_from_vanilla(pp, pub, proof)
    assert cs.which_unsatisfied() is None
    want = ecirc.generate_public_inputs(pp, pub)
    got = [v for v, i in zip(cs.values, cs.is_input) if i][1:]
    assert got == want

    # blank circuit has the same shape (input count) as a real one
    compound = ecirc.ElectionPoStCompound(shape=(8, 0, 0))
    blank = compound.blank_circuit(pp)
    assert blank.num_inputs == cs.num_inputs
    assert blank.num_constraints == cs.num_constraints

    # tampered comm_c breaks the comm_r binding
    import copy

    bad = copy.deepcopy(proof)
    bad.comm_c = bytes([6] * 32)
    cs2 = ecirc.circuit_from_vanilla(pp, pub, bad)
    assert cs2.which_unsatisfied() is not None
