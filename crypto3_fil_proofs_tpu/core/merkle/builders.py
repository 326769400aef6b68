"""Tree-shape factory layer (reference: core/merkle/builders.hpp:40-287).

Creates base/compound trees from data, splits store configs per sub-tree,
and reopens LevelCache trees against a replica file for PoSt.
"""
from __future__ import annotations

import numpy as np

from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend

from .storage import (
    NODE_SIZE,
    DiskStore,
    ExternalReader,
    LevelCacheStore,
    ReplicaConfig,
    StoreConfig,
    get_merkle_tree_cache_size,
    get_merkle_tree_len,
)
from .tree import CompoundMerkleTree, MerkleTree


def get_base_tree_count(sub_arity: int, top_arity: int) -> int:
    """Number of base trees for a compound shape
    (reference: builders.hpp get_base_tree_count)."""
    if top_arity:
        return top_arity * sub_arity
    if sub_arity:
        return sub_arity
    return 1


def split_config(config: StoreConfig, count: int) -> list[StoreConfig]:
    """Per-sub-tree configs `<id>-<i>` (reference: builders.hpp split_config)."""
    if count == 1:
        return [config]
    return [
        StoreConfig(config.path, f"{config.id}-{i}", 0, config.rows_to_discard)
        for i in range(count)
    ]


def split_config_and_replica(
    config: StoreConfig, replica_path: str, leafs: int, count: int
) -> tuple[list[StoreConfig], ReplicaConfig]:
    """Sub-tree configs plus replica byte offsets
    (reference: builders.hpp:253-272)."""
    configs = split_config(config, count)
    leafs_per = leafs // count
    offsets = [i * leafs_per * NODE_SIZE for i in range(count)]
    return configs, ReplicaConfig(replica_path, offsets)


def create_base_merkle_tree(
    data: np.ndarray,
    arity: int,
    backend: str = "poseidon",
    config: StoreConfig | None = None,
) -> MerkleTree:
    """Single base tree from (N, 32) leaf data
    (reference: builders.hpp create_base_merkle_tree)."""
    return MerkleTree.build(data, arity, backend, config)


def create_tree(
    data: np.ndarray,
    base_arity: int,
    sub_arity: int = 0,
    top_arity: int = 0,
    backend: str = "poseidon",
    configs: list[StoreConfig] | None = None,
) -> CompoundMerkleTree | MerkleTree:
    """Compound tree from leaf data split equally across base trees
    (reference: builders.hpp create_tree / create_disk_tree)."""
    count = get_base_tree_count(sub_arity, top_arity)
    if count == 1:
        if configs:
            return MerkleTree.build(data, base_arity, backend, configs[0])
        return MerkleTree.build(data, base_arity, backend)
    leafs_per = data.shape[0] // count
    trees = []
    for i in range(count):
        cfg = configs[i] if configs else None
        trees.append(
            MerkleTree.build(
                data[i * leafs_per : (i + 1) * leafs_per], base_arity, backend, cfg
            )
        )
    return CompoundMerkleTree(trees, sub_arity, top_arity)


def create_lc_tree(
    leafs_total: int,
    base_arity: int,
    sub_arity: int,
    top_arity: int,
    configs: list[StoreConfig],
    replica: ReplicaConfig,
    backend: str = "poseidon",
) -> CompoundMerkleTree | MerkleTree:
    """Reopen a LevelCache tree: leaves from the replica file, cached top
    rows from each sub-tree's store file (reference: builders.hpp:79-102
    create_lc_tree + LevelCacheStore external-reader wiring).

    The store files referenced by `configs` must contain the cached top
    region; `compact()` (below) produces them from full DiskStore trees.
    """
    count = get_base_tree_count(sub_arity, top_arity)
    leafs_per = leafs_total // count
    trees = []
    for i in range(count):
        cfg = configs[i]
        rtd = cfg.rows_to_discard
        cache_len = get_merkle_tree_cache_size(leafs_per, base_arity, rtd)
        cache = np.fromfile(cfg.data_path(), dtype=np.uint8)
        cache = cache.reshape(-1, NODE_SIZE)
        if cache.shape[0] != cache_len:
            # tolerate a full (uncompacted) tree file: take the top rows
            full_len = get_merkle_tree_len(leafs_per, base_arity)
            if cache.shape[0] == full_len:
                cache = cache[full_len - cache_len :]
            else:
                raise ValueError(
                    f"store {cfg.data_path()} has {cache.shape[0]} nodes; "
                    f"expected cache {cache_len} or full {full_len}"
                )
        reader = ExternalReader(replica.path, replica.offsets[i])
        store = LevelCacheStore(leafs_per, base_arity, rtd, cache, reader)
        trees.append(MerkleTree.from_store(store, leafs_per, base_arity, backend))
    if count == 1 and not sub_arity:
        return trees[0]
    return CompoundMerkleTree(trees, sub_arity, top_arity)


def compact(config: StoreConfig, leafs: int, arity: int) -> None:
    """Truncate a full DiskStore tree file to LevelCache form: drop all
    rows below the cached top region except leaves are expected to live in
    the replica file (reference: storage/disk.hpp:174-237 compact)."""
    full_len = get_merkle_tree_len(leafs, arity)
    cache_len = get_merkle_tree_cache_size(leafs, arity, config.rows_to_discard)
    path = config.data_path()
    arr = np.fromfile(path, dtype=np.uint8).reshape(-1, NODE_SIZE)
    if arr.shape[0] != full_len:
        raise ValueError(f"{path}: expected full tree of {full_len} nodes")
    arr[full_len - cache_len :].tofile(path)
