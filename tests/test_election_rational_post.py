"""Election + Rational PoSt vanilla roundtrips
(reference tests: post/election/vanilla.cpp, post/rational/vanilla.cpp)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree
from crypto3_fil_proofs_tpu.models.post.election import vanilla as election
from crypto3_fil_proofs_tpu.models.post.rational import vanilla as rational
from crypto3_fil_proofs_tpu.ops.poseidon import hash2

SECTOR = 2048  # 64 leaves = 8^2, a whole oct tree
LEAVES = SECTOR // 32


def _make_tree(seed):
    rng = np.random.default_rng(seed)
    leaves = rng.integers(0, 64, size=(LEAVES, 32), dtype=np.uint8)
    return MerkleTree.build(leaves, 8, "poseidon")


def _comm_r(comm_c: bytes, root: bytes) -> bytes:
    return hash2(
        int.from_bytes(comm_c, "little"), int.from_bytes(root, "little")
    ).to_bytes(32, "little")


def test_election_post_roundtrip(rng_seed):
    pp = election.ElectionPoSt.setup(
        election.SetupParams(sector_size=SECTOR, challenge_count=4, challenged_nodes=1)
    )
    tree = _make_tree(rng_seed)
    comm_c = bytes([5] * 32)
    randomness = bytes([7] * 32)
    prover_id = bytes([3] * 32)
    sectors = [0, 11, 42]
    challenged = election.generate_sector_challenges(randomness, 2, sectors)
    assert all(s in sectors for s in challenged)

    cand = election.generate_candidate(pp, tree, prover_id, 11, randomness, 0)
    pub = election.PublicInputs(
        randomness=randomness,
        sector_id=11,
        prover_id=prover_id,
        comm_r=_comm_r(comm_c, tree.root()),
        partial_ticket=cand.partial_ticket,
        sector_challenge_index=0,
    )
    priv = election.PrivateInputs(tree=tree, comm_c=comm_c, comm_r_last=tree.root())
    proof = election.ElectionPoSt.prove(pp, pub, priv)
    assert proof.ticket == cand.ticket
    assert election.ElectionPoSt.verify(pp, pub, proof)
    # wrong partial ticket rejects
    bad = election.PublicInputs(
        **{**pub.__dict__, "partial_ticket": bytes(32)}
    )
    assert not election.ElectionPoSt.verify(pp, bad, proof)


def test_rational_post_roundtrip(rng_seed):
    pp = rational.RationalPoSt.setup(
        rational.SetupParams(sector_size=SECTOR, challenges_count=4)
    )
    trees = {1: _make_tree(rng_seed + 1), 5: _make_tree(rng_seed + 5)}
    comm_c = {1: bytes([1] * 32), 5: bytes([5] * 32)}
    comm_rs = {s: _comm_r(comm_c[s], t.root()) for s, t in trees.items()}
    seed = bytes([9] * 32)
    challenges = rational.derive_challenges(4, SECTOR, [1, 5], seed, faults=set())
    pub = rational.PublicInputs(challenges=challenges, faults=set(), comm_rs=comm_rs)
    priv = rational.PrivateInputs(
        trees=trees,
        comm_c=comm_c,
        comm_r_last={s: t.root() for s, t in trees.items()},
    )
    proof = rational.RationalPoSt.prove(pp, pub, priv)
    assert rational.RationalPoSt.verify(pp, pub, proof)
    # faulty challenged sector rejects
    challenged_sectors = {c.sector for c in challenges}
    bad_pub = rational.PublicInputs(
        challenges=challenges, faults={next(iter(challenged_sectors))}, comm_rs=comm_rs
    )
    assert not rational.RationalPoSt.verify(pp, bad_pub, proof)
    # challenges avoid faults at derivation
    ch2 = rational.derive_challenges(8, SECTOR, [1, 5], seed, faults={1})
    assert all(c.sector == 5 for c in ch2)
