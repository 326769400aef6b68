"""Fallback PoSt vanilla tests (reference analog:
libs/storage/test/post/fallback/vanilla.cpp)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.merkle import MerkleTree
from crypto3_fil_proofs_tpu.models.post.fallback.vanilla import (
    ChallengeRequirements,
    FallbackPoSt,
    PrivateInputs,
    PrivateSector,
    PublicInputs,
    PublicParams,
    PublicSector,
    SetupParams,
    generate_leaf_challenge,
    generate_sector_challenges,
)
from crypto3_fil_proofs_tpu.ops.poseidon import hash2

SECTOR = 2048
LEAVES = SECTOR // 32


def make_sector(sector_id: int, seed: int):
    rng = np.random.default_rng(seed)
    leaves = rng.integers(0, 256, size=(LEAVES, 32), dtype=np.uint8)
    leaves[:, 31] &= 0x3F
    tree = MerkleTree.build(leaves, 8, "poseidon")
    comm_r_last = tree.root()
    comm_c = bytes([seed % 64] * 32)
    comm_r = hash2(
        int.from_bytes(comm_c, "little"), int.from_bytes(comm_r_last, "little")
    ).to_bytes(32, "little")
    return (
        PublicSector(id=sector_id, comm_r=comm_r),
        PrivateSector(tree=tree, comm_c=comm_c, comm_r_last=comm_r_last),
    )


@pytest.fixture(scope="module")
def post_setup():
    pp = FallbackPoSt.setup(SetupParams(SECTOR, challenge_count=10, sector_count=2))
    sectors = [make_sector(i, i + 1) for i in range(4)]
    pubs = [s[0] for s in sectors]
    privs = [s[1] for s in sectors]
    return pp, pubs, privs


def test_prove_verify_multi_partition(post_setup):
    pp, pubs, privs = post_setup
    pub_inputs = PublicInputs(
        randomness=bytes([5] * 32), prover_id=bytes([6] * 32), sectors=pubs
    )
    priv_inputs = PrivateInputs(sectors=privs)
    proofs = FallbackPoSt.prove_all_partitions(pp, pub_inputs, priv_inputs, 2)
    assert len(proofs) == 2
    assert all(len(p.sectors) == 2 for p in proofs)
    assert FallbackPoSt.verify_all_partitions(pp, pub_inputs, proofs)


def test_partition_padding(post_setup):
    pp, pubs, privs = post_setup
    # 3 sectors, 2 per partition -> second partition padded by duplication
    pub_inputs = PublicInputs(bytes([5] * 32), bytes([6] * 32), pubs[:3])
    priv_inputs = PrivateInputs(privs[:3])
    proofs = FallbackPoSt.prove_all_partitions(pp, pub_inputs, priv_inputs, 2)
    assert len(proofs[1].sectors) == 2
    assert proofs[1].sectors[0] is proofs[1].sectors[1]
    assert FallbackPoSt.verify_all_partitions(pp, pub_inputs, proofs)


def test_verify_rejects_wrong_comm_r(post_setup):
    pp, pubs, privs = post_setup
    bad_pubs = [PublicSector(s.id, bytes(32)) for s in pubs]
    pub_inputs = PublicInputs(bytes([5] * 32), bytes([6] * 32), pubs)
    bad_inputs = PublicInputs(bytes([5] * 32), bytes([6] * 32), bad_pubs)
    proofs = FallbackPoSt.prove_all_partitions(pp, pub_inputs, PrivateInputs(privs), 2)
    assert not FallbackPoSt.verify_all_partitions(pp, bad_inputs, proofs)
    # wrong randomness changes challenges
    other = PublicInputs(bytes([9] * 32), bytes([6] * 32), pubs)
    assert not FallbackPoSt.verify_all_partitions(pp, other, proofs)


def test_challenge_distribution():
    pp = PublicParams(SECTOR, 10, 2)
    chals = [
        generate_leaf_challenge(pp, bytes([1] * 32), 7, i) for i in range(200)
    ]
    assert all(0 <= c < LEAVES for c in chals)
    assert len(set(chals)) > 30  # spread out
    sector_chals = generate_sector_challenges(bytes([1] * 32), 66, 100, bytes([2] * 32))
    assert len(sector_chals) == 66
    assert all(0 <= c < 100 for c in sector_chals)


def test_requirements():
    pp = PublicParams(SECTOR, 10, 2)
    assert FallbackPoSt.satisfies_requirements(pp, ChallengeRequirements(20), 1)
    assert not FallbackPoSt.satisfies_requirements(pp, ChallengeRequirements(21), 1)
