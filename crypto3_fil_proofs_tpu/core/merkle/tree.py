"""Merkle trees: level-batched build, linear layout, inclusion proofs.

Replaces reference core/merkle/merkle.hpp (MerkleTree/SubMerkleTree/
TopMerkleTree) and core/merkle/proof.hpp / old_proof.hpp.

TPU-first design: a level is hashed as ONE batched backend call
(`backend.hash_level` — host reference or JAX/Pallas kernel) instead of
the reference's 4096-node chunked loops (merkle.hpp:37-43). Compound
shapes (base/sub/top arities, reference constants.hpp:116-125) are a
wrapper over independently-built base trees — the natural device-shard
boundary (SURVEY.md P1/P3).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend

from .storage import (
    NODE_SIZE,
    DiskStore,
    ExternalReader,
    LevelCacheStore,
    Store,
    StoreConfig,
    VecStore,
    get_merkle_tree_len,
    get_merkle_tree_row_count,
)


def level_offsets(leafs: int, arity: int) -> list[int]:
    """Linear-layout offset of each level (level 0 = leaves)."""
    offs, off, n = [], 0, leafs
    while True:
        offs.append(off)
        if n == 1:
            break
        off += n
        n //= arity
    return offs


@dataclass
class ProofLevel:
    """One path level: the (arity-1) sibling hashes and the child index
    (reference: core/path_element.hpp:36-50)."""

    siblings: list[bytes]
    index: int


@dataclass
class MerkleProof:
    """Inclusion proof over (base, sub, top) segments.

    `path` is base-tree levels bottom-up, then the sub level (siblings
    among base-tree roots), then the top level — matching the reference's
    SingleProof/SubProof/TopProof variants (old_proof.hpp:98-608).
    """

    leaf: bytes
    root: bytes
    path: list[ProofLevel]
    backend: str = "poseidon"

    def validate(self) -> bool:
        backend = get_backend(self.backend)
        cur = self.leaf
        for lvl in self.path:
            children = list(lvl.siblings)
            children.insert(lvl.index, cur)
            cur = backend.hash_single(children)
        return cur == self.root

    def validate_data(self, data: bytes) -> bool:
        return self.leaf == data and self.validate()

    def leaf_index(self) -> int:
        """Reconstruct the challenged leaf index from path indices
        (reference old_proof.hpp `proves_challenge`)."""
        idx, mult = 0, 1
        for lvl in self.path:
            idx += lvl.index * mult
            mult *= len(lvl.siblings) + 1
        return idx

    def proves_challenge(self, challenge: int) -> bool:
        return self.leaf_index() == challenge

    def as_options(self) -> list[tuple[list[bytes], int]]:
        """Circuit witness form (reference old_proof.hpp `as_options`)."""
        return [(lvl.siblings, lvl.index) for lvl in self.path]


class MerkleTree:
    """Single base tree of one arity over a linear store."""

    def __init__(self, store: Store, leafs: int, arity: int, backend: str = "poseidon"):
        self.store = store
        self.leafs = leafs
        self.arity = arity
        self.backend = backend
        self.offsets = level_offsets(leafs, arity)
        self.row_count = get_merkle_tree_row_count(leafs, arity)
        self.tree_len = get_merkle_tree_len(leafs, arity)

    # -- construction -------------------------------------------------

    @classmethod
    def build(
        cls,
        leaves: np.ndarray,
        arity: int,
        backend: str = "poseidon",
        config: StoreConfig | None = None,
    ) -> "MerkleTree":
        """Build from an (N, 32) uint8 leaf array; one batched hash call
        per level."""
        leafs = leaves.shape[0]
        tree_len = get_merkle_tree_len(leafs, arity)
        if config is not None:
            config.size = tree_len
            store: Store = DiskStore(config, size=tree_len)
        else:
            store = VecStore(tree_len)
        hb = get_backend(backend)
        store.write_range(0, leaves)
        level = leaves
        off = leafs
        while level.shape[0] > 1:
            level = hb.hash_level(level, arity)
            store.write_range(off, level)
            off += level.shape[0]
        store.sync()
        return cls(store, leafs, arity, backend)

    @classmethod
    def from_store(
        cls, store: Store, leafs: int, arity: int, backend: str = "poseidon"
    ) -> "MerkleTree":
        return cls(store, leafs, arity, backend)

    # -- access -------------------------------------------------------

    def root(self) -> bytes:
        return self.store.read_at(self.tree_len - 1)

    def read_at(self, index: int) -> bytes:
        return self.store.read_at(index)

    def leaf(self, index: int) -> bytes:
        return self.store.read_at(index)

    # -- proofs -------------------------------------------------------

    def gen_proof(self, challenge: int) -> MerkleProof:
        if isinstance(self.store, LevelCacheStore) and self.store.rows_to_discard > 0:
            return self._gen_cached_proof(challenge)
        a = self.arity
        path: list[ProofLevel] = []
        idx = challenge
        for level in range(self.row_count - 1):
            group = idx // a
            pos = idx % a
            base = self.offsets[level] + group * a
            nodes = self.store.read_range(base, base + a)
            path.append(
                ProofLevel([nodes[j].tobytes() for j in range(a) if j != pos], pos)
            )
            idx = group
        return MerkleProof(
            leaf=self.leaf(challenge), root=self.root(), path=path, backend=self.backend
        )

    def _gen_cached_proof(self, challenge: int) -> MerkleProof:
        """Proof from a LevelCache store: rebuild the subtree covering the
        challenge for the discarded rows, then use cached rows
        (reference: processing/naive/tree.hpp MerkleTree_gen_cached_proof)."""
        store = self.store
        assert isinstance(store, LevelCacheStore)
        a = self.arity
        rtd = store.rows_to_discard
        seg_leafs = a ** (rtd + 1)
        seg_start = (challenge // seg_leafs) * seg_leafs
        hb = get_backend(self.backend)
        level_nodes = store.read_range(seg_start, seg_start + seg_leafs)
        path: list[ProofLevel] = []
        idx = challenge - seg_start
        for _ in range(rtd + 1):
            group = idx // a
            pos = idx % a
            nodes = level_nodes[group * a : (group + 1) * a]
            path.append(
                ProofLevel([nodes[j].tobytes() for j in range(a) if j != pos], pos)
            )
            level_nodes = hb.hash_level(level_nodes, a)
            idx = group
        # continue over the cached rows
        idx = challenge // seg_leafs
        for level in range(rtd + 1, self.row_count - 1):
            group = idx // a
            pos = idx % a
            base = self.offsets[level] + group * a
            nodes = store.read_range(base, base + a)
            path.append(
                ProofLevel([nodes[j].tobytes() for j in range(a) if j != pos], pos)
            )
            idx = group
        return MerkleProof(
            leaf=self.leaf(challenge), root=self.root(), path=path, backend=self.backend
        )


class CompoundMerkleTree:
    """1-3 layer compound tree over equally-sized base trees.

    Shape (base_arity, sub_arity, top_arity) with 0 = absent, matching the
    reference SectorShape table (constants.hpp:116-125): e.g. 32GiB =
    (8, 8, 0): 8 base trees, their roots hashed with arity 8.
    """

    def __init__(self, base_trees: list[MerkleTree], sub_arity: int, top_arity: int):
        self.base_trees = base_trees
        self.base_arity = base_trees[0].arity
        self.backend = base_trees[0].backend
        self.sub_arity = sub_arity
        self.top_arity = top_arity
        count = len(base_trees)
        expected = (top_arity or 1) * (sub_arity or 1)
        if count != expected:
            raise ValueError(f"expected {expected} base trees, got {count}")
        hb = get_backend(self.backend)
        roots = [t.root() for t in base_trees]
        if sub_arity:
            self.sub_roots = [
                hb.hash_single(roots[i : i + sub_arity])
                for i in range(0, count, sub_arity)
            ]
        else:
            self.sub_roots = roots
        if top_arity:
            assert len(self.sub_roots) == top_arity
            self._root = hb.hash_single(self.sub_roots)
        else:
            self._root = self.sub_roots[0]

    @property
    def leafs(self) -> int:
        return sum(t.leafs for t in self.base_trees)

    @property
    def row_count(self) -> int:
        rows = self.base_trees[0].row_count
        if self.sub_arity:
            rows += 1
        if self.top_arity:
            rows += 1
        return rows

    def root(self) -> bytes:
        return self._root

    def leaf(self, index: int) -> bytes:
        per = self.base_trees[0].leafs
        return self.base_trees[index // per].leaf(index % per)

    def gen_proof(self, challenge: int) -> MerkleProof:
        per = self.base_trees[0].leafs
        tree_idx = challenge // per
        base_proof = self.base_trees[tree_idx].gen_proof(challenge % per)
        path = list(base_proof.path)
        roots = [t.root() for t in self.base_trees]
        if self.sub_arity:
            group = tree_idx // self.sub_arity
            pos = tree_idx % self.sub_arity
            sibs = [
                roots[group * self.sub_arity + j]
                for j in range(self.sub_arity)
                if j != pos
            ]
            path.append(ProofLevel(sibs, pos))
            if self.top_arity:
                pos_t = group % self.top_arity
                sibs_t = [
                    self.sub_roots[j] for j in range(self.top_arity) if j != pos_t
                ]
                path.append(ProofLevel(sibs_t, pos_t))
        return MerkleProof(
            leaf=base_proof.leaf, root=self._root, path=path, backend=self.backend
        )
