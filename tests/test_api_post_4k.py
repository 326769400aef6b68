"""Winning PoSt through Groth16 at the 4KiB sector class.

4KiB is the smallest registered class with a COMPOUND tree shape
((8,2,0): two oct base sub-trees under an arity-2 top — reference
constants.hpp:116-125 SectorShape4KiB), so this exercises the sub-tree
circuit path (SubProof inclusion + sub-path packing) end-to-end through
CRS setup, proving, and verification — the 2KiB tests only cover the
single-base-tree shape.
"""
import numpy as np

from crypto3_fil_proofs_tpu.api import post as api_post
from crypto3_fil_proofs_tpu.constants import NODE_SIZE, SECTOR_SHAPES
from crypto3_fil_proofs_tpu.core import cache_key
from crypto3_fil_proofs_tpu.core.merkle.builders import create_tree, split_config
from crypto3_fil_proofs_tpu.core.merkle.storage import StoreConfig
from crypto3_fil_proofs_tpu.ops.poseidon import hash2
from crypto3_fil_proofs_tpu.types import (
    PoStConfig,
    PoStType,
    PrivateReplicaInfo,
    PublicReplicaInfo,
)

SECTOR_SIZE = 4096
RANDOMNESS = bytes([21] * 31 + [0])
PROVER_ID = bytes([8] * 31 + [0])


def _fake_sealed_sector_4k(tmp_path, name: str, seed: int):
    """Sector cache with a (8,2,0) compound tree_r_last + p_aux."""
    cache = tmp_path / name
    cache.mkdir()
    shape = SECTOR_SHAPES[SECTOR_SIZE]
    assert shape == (8, 2, 0)
    rng = np.random.default_rng(seed)
    leaves = rng.integers(
        0, 64, size=(SECTOR_SIZE // NODE_SIZE, 32), dtype=np.uint8
    )
    cfgs = split_config(
        StoreConfig(str(cache), cache_key.COMM_R_LAST_TREE), shape[1]
    )
    tree = create_tree(leaves, shape[0], shape[1], shape[2], "poseidon", cfgs)
    comm_c = bytes([seed % 64] * 32)
    comm_r_last = tree.root()
    with open(cache / cache_key.PAUX, "wb") as f:
        f.write(comm_c + comm_r_last)
    comm_r = hash2(
        int.from_bytes(comm_c, "little"), int.from_bytes(comm_r_last, "little")
    ).to_bytes(32, "little")
    return str(cache), comm_r


def test_winning_post_roundtrip_4k_compound_shape(tmp_path):
    config = PoStConfig(
        sector_size=SECTOR_SIZE,
        challenge_count=2,
        sector_count=1,
        typ=PoStType.WINNING,
    )
    cache, comm_r = _fake_sealed_sector_4k(tmp_path, "s4k", 13)
    replicas = {
        9: PrivateReplicaInfo(replica_path="", comm_r=comm_r, cache_dir=cache)
    }
    proof = api_post.generate_winning_post(
        config, RANDOMNESS, replicas, PROVER_ID
    )
    assert len(proof) == 192
    pub = {9: PublicReplicaInfo(comm_r=comm_r)}
    assert api_post.verify_winning_post(
        config, RANDOMNESS, pub, PROVER_ID, proof
    )
    assert not api_post.verify_winning_post(
        config, bytes(32), pub, PROVER_ID, proof
    )
    bad = bytes([proof[0] ^ 1]) + proof[1:]
    assert not api_post.verify_winning_post(
        config, RANDOMNESS, pub, PROVER_ID, bad
    )
