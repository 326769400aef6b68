"""Merkle engine tests: build, proofs, compound shapes, LevelCache."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.merkle import (
    CompoundMerkleTree,
    DiskStore,
    MerkleTree,
    ReplicaConfig,
    StoreConfig,
    compact,
    create_lc_tree,
    create_tree,
    get_base_tree_count,
    get_merkle_tree_cache_size,
    get_merkle_tree_leafs,
    get_merkle_tree_len,
    get_merkle_tree_row_count,
    split_config_and_replica,
)
from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend


def random_leaves(n, seed=0):
    rng = np.random.default_rng(seed)
    leaves = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    leaves[:, 31] &= 0x3F  # valid Fr elements
    return leaves


def test_tree_math():
    assert get_merkle_tree_row_count(64, 8) == 3
    assert get_merkle_tree_len(64, 8) == 64 + 8 + 1
    assert get_merkle_tree_leafs(73, 8) == 64
    assert get_merkle_tree_cache_size(64, 8, 1) == 1
    assert get_merkle_tree_len(64, 2) == 127
    assert get_base_tree_count(8, 2) == 16
    assert get_base_tree_count(2, 0) == 2
    assert get_base_tree_count(0, 0) == 1


@pytest.mark.parametrize("arity,backend", [(2, "sha256"), (2, "poseidon"), (8, "poseidon")])
def test_build_and_prove(arity, backend):
    leaves = random_leaves(64, seed=arity)
    tree = MerkleTree.build(leaves, arity, backend)
    root = tree.root()
    assert len(root) == 32
    for challenge in [0, 1, 31, 63]:
        proof = tree.gen_proof(challenge)
        assert proof.root == root
        assert proof.leaf == leaves[challenge].tobytes()
        assert proof.validate()
        assert proof.proves_challenge(challenge)
        assert not proof.proves_challenge((challenge + 1) % 64)
    # tamper
    proof = tree.gen_proof(5)
    proof.leaf = bytes(32)
    assert not proof.validate() or leaves[5].tobytes() == bytes(32)


def test_root_matches_manual_poseidon():
    from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash

    leaves = random_leaves(8, seed=7)
    tree = MerkleTree.build(leaves, 8, "poseidon")
    ints = [int.from_bytes(leaves[i].tobytes(), "little") for i in range(8)]
    expect = poseidon_hash(ints, 8).to_bytes(32, "little")
    assert tree.root() == expect


def test_compound_tree_shapes():
    # shape (8, 2, 0): 2 base trees of 64 leaves (4KiB sector shape)
    leaves = random_leaves(128, seed=3)
    tree = create_tree(leaves, 8, 2, 0)
    assert isinstance(tree, CompoundMerkleTree)
    assert tree.leafs == 128
    for ch in [0, 33, 127]:
        p = tree.gen_proof(ch)
        assert p.validate()
        assert p.proves_challenge(ch)
    # shape (8, 8, 2): 16 base trees of 64 leaves over 1024 total
    leaves = random_leaves(1024, seed=4)
    tree2 = create_tree(leaves, 8, 8, 2)
    p = tree2.gen_proof(777)
    assert p.validate()
    assert p.proves_challenge(777)
    # shape (8, 8, 0) over 512 leaves happens to hash identically to a flat
    # arity-8 tree of the same leaves (the sub level is just another row)
    leaves512 = random_leaves(512, seed=5)
    tree3 = create_tree(leaves512, 8, 8, 0)
    flat = MerkleTree.build(leaves512, 8)
    assert tree3.root() == flat.root()


def test_disk_store_roundtrip(tmp_path):
    leaves = random_leaves(64, seed=5)
    cfg = StoreConfig(str(tmp_path), "tree-test", 0, 0)
    tree = MerkleTree.build(leaves, 8, "poseidon", cfg)
    # reopen from disk
    store = DiskStore.new_from_disk(get_merkle_tree_len(64, 8), cfg)
    tree2 = MerkleTree.from_store(store, 64, 8, "poseidon")
    assert tree2.root() == tree.root()
    assert tree2.gen_proof(17).validate()


def test_lc_tree_cached_proofs(tmp_path):
    """Full LevelCache flow: build on disk, compact, reopen against the
    'replica' file, generate proofs that rebuild discarded rows."""
    leafs_total = 1024  # 2 base trees of 512 = 8^3 leaves
    base_arity, sub_arity, top_arity = 8, 2, 0
    count = get_base_tree_count(sub_arity, top_arity)
    rtd = 1
    leaves = random_leaves(leafs_total, seed=6)
    replica_path = str(tmp_path / "replica.dat")
    leaves.tofile(replica_path)

    cfg = StoreConfig(str(tmp_path), "tree-r-last", 0, rtd)
    configs, replica_cfg = split_config_and_replica(
        cfg, replica_path, leafs_total, count
    )
    for c in configs:
        c.rows_to_discard = rtd
    full = create_tree(leaves, base_arity, sub_arity, top_arity, "poseidon", configs)
    expect_root = full.root()

    # compact each sub-tree store to LevelCache form
    for c in configs:
        compact(c, leafs_total // count, base_arity)

    lc = create_lc_tree(
        leafs_total, base_arity, sub_arity, top_arity, configs, replica_cfg
    )
    assert lc.root() == expect_root
    for ch in [0, 100, 263, 1023]:
        p = lc.gen_proof(ch)
        assert p.validate()
        assert p.proves_challenge(ch)
        assert p.root == expect_root
