"""PoSt API: Winning/Window PoSt generation + verification.

Re-implements reference libs/filecoin api/post.hpp:
- generate_winning_post (:179-231), verify_winning_post (:259-304)
- generate_winning_post_sector_challenge (:238-253)
- generate_window_post (:306-349), verify_window_post (:352-398)
- get_partitions_for_window_post (:400-; src/api/post.cpp:12-20)
The replica trees are reopened from each PrivateReplicaInfo's cache
(tree-r-last store files + the replica file), mirroring the
PrivateReplicaInfo::merkle_tree -> create_lc_tree path
(api/post.hpp:325-326, builders.hpp:79-102).
"""
from __future__ import annotations

import math
import os

from ..constants import NODE_SIZE, SECTOR_SHAPES
from ..core import cache_key
from ..core.compound import CompoundProof, MultiProof
from ..core.merkle.builders import get_base_tree_count, split_config
from ..core.merkle.storage import DiskStore, StoreConfig
from ..core.merkle.tree import CompoundMerkleTree, MerkleTree
from ..models.post.fallback import vanilla as fallback
from ..models.post.fallback.compound import FallbackPoStCompound
from ..parameters import (
    window_post_public_params,
    winning_post_public_params,
)
from ..types import PoStConfig, PoStType, PrivateReplicaInfo, PublicReplicaInfo


def _replica_tree(config: PoStConfig, replica: PrivateReplicaInfo):
    """Reopen the sector's tree_r_last from its cache dir."""
    shape = SECTOR_SHAPES[config.sector_size]
    leafs = config.sector_size // NODE_SIZE
    count = get_base_tree_count(shape[1], shape[2])
    cfgs = split_config(
        StoreConfig(replica.cache_dir, cache_key.COMM_R_LAST_TREE), count
    )
    leafs_per = leafs // count
    trees = []
    for cfg in cfgs:
        store = DiskStore(cfg, create=False)
        trees.append(MerkleTree.from_store(store, leafs_per, shape[0], "poseidon"))
    if count == 1:
        return trees[0]
    return CompoundMerkleTree(trees, shape[1], shape[2])


def _load_p_aux(replica: PrivateReplicaInfo) -> tuple[bytes, bytes]:
    with open(os.path.join(replica.cache_dir, cache_key.PAUX), "rb") as f:
        raw = f.read()
    return raw[:32], raw[32:64]


def _post_prove(
    config: PoStConfig,
    pub_params: fallback.PublicParams,
    randomness: bytes,
    prover_id: bytes,
    replicas: dict[int, PrivateReplicaInfo],
    partitions: int,
) -> bytes:
    pub_sectors, priv_sectors = [], []
    for sector_id, replica in sorted(replicas.items()):
        comm_c, comm_r_last = _load_p_aux(replica)
        tree = _replica_tree(config, replica)
        pub_sectors.append(fallback.PublicSector(id=sector_id, comm_r=replica.comm_r))
        priv_sectors.append(
            fallback.PrivateSector(tree=tree, comm_c=comm_c, comm_r_last=comm_r_last)
        )
    pub_inputs = fallback.PublicInputs(
        randomness=randomness, prover_id=prover_id, sectors=pub_sectors, k=None
    )
    priv_inputs = fallback.PrivateInputs(sectors=priv_sectors)
    vanilla = fallback.FallbackPoSt.prove_all_partitions(
        pub_params, pub_inputs, priv_inputs, partitions
    )
    assert fallback.FallbackPoSt.verify_all_partitions(
        pub_params, pub_inputs, vanilla
    ), "generated vanilla PoSt proofs do not verify"

    from ..caches import get_post_params

    shape = SECTOR_SHAPES[config.sector_size]
    compound = CompoundProof(FallbackPoStCompound(shape=shape))
    pk = get_post_params(config, pub_params, compound)
    multi = compound.prove(pub_params, pub_inputs, vanilla, pk)
    return multi.to_bytes()


def _post_verify(
    config: PoStConfig,
    pub_params: fallback.PublicParams,
    randomness: bytes,
    prover_id: bytes,
    replicas: dict[int, PublicReplicaInfo],
    proof_bytes: bytes,
    partitions: int,
) -> bool:
    pub_sectors = [
        fallback.PublicSector(id=sid, comm_r=info.comm_r)
        for sid, info in sorted(replicas.items())
    ]
    pub_inputs = fallback.PublicInputs(
        randomness=randomness, prover_id=prover_id, sectors=pub_sectors, k=None
    )
    from ..caches import get_post_verifying_key

    shape = SECTOR_SHAPES[config.sector_size]
    compound = CompoundProof(FallbackPoStCompound(shape=shape))
    vk = get_post_verifying_key(config, pub_params, compound)
    try:
        multi = MultiProof.from_bytes(proof_bytes, partitions)
    except (AssertionError, ValueError):
        return False
    return compound.verify(pub_params, pub_inputs, multi, vk)


# -- winning ---------------------------------------------------------------


def generate_winning_post(
    config: PoStConfig,
    randomness: bytes,
    replicas: dict[int, PrivateReplicaInfo],
    prover_id: bytes,
) -> bytes:
    assert config.typ == PoStType.WINNING
    pub_params = winning_post_public_params(config)
    return _post_prove(config, pub_params, randomness, prover_id, replicas, 1)


def verify_winning_post(
    config: PoStConfig,
    randomness: bytes,
    replicas: dict[int, PublicReplicaInfo],
    prover_id: bytes,
    proof_bytes: bytes,
) -> bool:
    assert config.typ == PoStType.WINNING
    pub_params = winning_post_public_params(config)
    return _post_verify(
        config, pub_params, randomness, prover_id, replicas, proof_bytes, 1
    )


def generate_winning_post_sector_challenge(
    config: PoStConfig, randomness: bytes, sector_set_len: int, prover_id: bytes
) -> list[int]:
    """(reference api/post.hpp:238-253)"""
    return fallback.generate_sector_challenges(
        randomness, config.sector_count, sector_set_len, prover_id
    )


# -- window ----------------------------------------------------------------


def get_partitions_for_window_post(
    total_sector_count: int, config: PoStConfig
) -> int:
    """(reference src/api/post.cpp:12-20)"""
    return max(1, math.ceil(total_sector_count / config.sector_count))


def generate_window_post(
    config: PoStConfig,
    randomness: bytes,
    replicas: dict[int, PrivateReplicaInfo],
    prover_id: bytes,
) -> bytes:
    assert config.typ == PoStType.WINDOW
    pub_params = window_post_public_params(config)
    partitions = get_partitions_for_window_post(len(replicas), config)
    return _post_prove(
        config, pub_params, randomness, prover_id, replicas, partitions
    )


def verify_window_post(
    config: PoStConfig,
    randomness: bytes,
    replicas: dict[int, PublicReplicaInfo],
    prover_id: bytes,
    proof_bytes: bytes,
) -> bool:
    assert config.typ == PoStType.WINDOW
    pub_params = window_post_public_params(config)
    partitions = get_partitions_for_window_post(len(replicas), config)
    return _post_verify(
        config, pub_params, randomness, prover_id, replicas, proof_bytes, partitions
    )
