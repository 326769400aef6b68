"""PoSt API end-to-end WITH Groth16 (tiny configs, 2KiB sectors).

Covers the full compound stack: vanilla fallback PoSt -> circuit ->
Groth16 prove -> 192 B/partition proof -> verify (reference flow:
api/post.hpp generate/verify_{winning,window}_post).
"""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.api import post as api_post
from crypto3_fil_proofs_tpu.constants import NODE_SIZE, SECTOR_SHAPES
from crypto3_fil_proofs_tpu.core import cache_key
from crypto3_fil_proofs_tpu.core.merkle.storage import StoreConfig
from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree
from crypto3_fil_proofs_tpu.ops.poseidon import hash2
from crypto3_fil_proofs_tpu.types import (
    PoStConfig,
    PoStType,
    PrivateReplicaInfo,
    PublicReplicaInfo,
)

SECTOR_SIZE = 2048
RANDOMNESS = bytes([44] * 31 + [0])
PROVER_ID = bytes([66] * 31 + [0])


def _fake_sealed_sector(tmp_path, name: str, seed: int):
    """Build a sector cache dir with tree-r-last + p_aux (as PC2 leaves)."""
    cache = tmp_path / name
    cache.mkdir()
    rng = np.random.default_rng(seed)
    leaves = rng.integers(0, 64, size=(SECTOR_SIZE // NODE_SIZE, 32), dtype=np.uint8)
    cfg = StoreConfig(str(cache), cache_key.COMM_R_LAST_TREE)
    tree = MerkleTree.build(leaves, SECTOR_SHAPES[SECTOR_SIZE][0], "poseidon", cfg)
    comm_c = bytes([seed % 64] * 32)
    comm_r_last = tree.root()
    with open(cache / cache_key.PAUX, "wb") as f:
        f.write(comm_c + comm_r_last)
    comm_r = hash2(
        int.from_bytes(comm_c, "little"), int.from_bytes(comm_r_last, "little")
    ).to_bytes(32, "little")
    return str(cache), comm_r


def test_winning_post_roundtrip(tmp_path):
    config = PoStConfig(
        sector_size=SECTOR_SIZE,
        challenge_count=2,
        sector_count=1,
        typ=PoStType.WINNING,
    )
    cache, comm_r = _fake_sealed_sector(tmp_path, "s1", 7)
    replicas = {
        3: PrivateReplicaInfo(replica_path="", comm_r=comm_r, cache_dir=cache)
    }
    proof = api_post.generate_winning_post(config, RANDOMNESS, replicas, PROVER_ID)
    assert len(proof) == 192
    pub = {3: PublicReplicaInfo(comm_r=comm_r)}
    assert api_post.verify_winning_post(config, RANDOMNESS, pub, PROVER_ID, proof)
    # wrong randomness fails
    assert not api_post.verify_winning_post(
        config, bytes(32), pub, PROVER_ID, proof
    )
    # tampered proof fails
    bad = bytes([proof[0] ^ 1]) + proof[1:]
    assert not api_post.verify_winning_post(
        config, RANDOMNESS, pub, PROVER_ID, bad
    )


def test_winning_post_sector_challenge():
    config = PoStConfig(
        sector_size=SECTOR_SIZE, challenge_count=2, sector_count=2,
        typ=PoStType.WINNING,
    )
    ch = api_post.generate_winning_post_sector_challenge(
        config, RANDOMNESS, 10, PROVER_ID
    )
    assert len(ch) == 2 and all(0 <= c < 10 for c in ch)


def test_window_post_roundtrip(tmp_path):
    config = PoStConfig(
        sector_size=SECTOR_SIZE,
        challenge_count=2,
        sector_count=2,
        typ=PoStType.WINDOW,
    )
    c1, r1 = _fake_sealed_sector(tmp_path, "w1", 11)
    c2, r2 = _fake_sealed_sector(tmp_path, "w2", 23)
    c3, r3 = _fake_sealed_sector(tmp_path, "w3", 31)
    replicas = {
        1: PrivateReplicaInfo(replica_path="", comm_r=r1, cache_dir=c1),
        2: PrivateReplicaInfo(replica_path="", comm_r=r2, cache_dir=c2),
        8: PrivateReplicaInfo(replica_path="", comm_r=r3, cache_dir=c3),
    }
    # 3 sectors, 2 per partition -> 2 partitions (last padded)
    assert api_post.get_partitions_for_window_post(3, config) == 2
    proof = api_post.generate_window_post(config, RANDOMNESS, replicas, PROVER_ID)
    assert len(proof) == 2 * 192
    pub = {
        1: PublicReplicaInfo(comm_r=r1),
        2: PublicReplicaInfo(comm_r=r2),
        8: PublicReplicaInfo(comm_r=r3),
    }
    assert api_post.verify_window_post(config, RANDOMNESS, pub, PROVER_ID, proof)
    # dropping a sector from the public set fails
    assert not api_post.verify_window_post(
        config, RANDOMNESS, {1: PublicReplicaInfo(comm_r=r1)}, PROVER_ID, proof
    )
