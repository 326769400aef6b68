"""Merkle stores: backing storage for tree node arrays.

Re-implements the behavior of reference core/merkle/storage/*:
- StoreConfig / ReplicaConfig (utilities.hpp:188-261)
- VecStore (vec.hpp), DiskStore (disk.hpp, `sc-02-data-<id>.dat` naming),
  LevelCacheStore (level_cache.hpp — base layer read from the replica
  file via an external reader + cached top rows)
- tree math helpers (utilities.hpp:44-151)

Node data is uniformly an (N, 32) uint8 array; DiskStore memory-maps the
file (the reference mmaps via boost::interprocess).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

NODE_SIZE = 32


# ---------------------------------------------------------------------------
# Tree math (reference: core/merkle/storage/utilities.hpp:44-151)
# ---------------------------------------------------------------------------


def get_merkle_tree_row_count(leafs: int, arity: int) -> int:
    """Rows including leaf row and root row."""
    rows = 1
    n = leafs
    while n > 1:
        assert n % arity == 0, f"{n} not a power of arity {arity}"
        n //= arity
        rows += 1
    return rows


def get_merkle_tree_len(leafs: int, arity: int) -> int:
    """Total node count of a linear-layout tree."""
    total, n = leafs, leafs
    while n > 1:
        n //= arity
        total += n
    return total


def get_merkle_tree_leafs(tree_len: int, arity: int) -> int:
    """Inverse of get_merkle_tree_len."""
    # leafs * (1 + 1/a + 1/a^2 + ...) = len  =>  search powers of arity
    leafs = 1
    while get_merkle_tree_len(leafs, arity) < tree_len:
        leafs *= arity
    if get_merkle_tree_len(leafs, arity) != tree_len:
        raise ValueError(f"tree_len {tree_len} invalid for arity {arity}")
    return leafs


def get_merkle_tree_cache_size(leafs: int, arity: int, rows_to_discard: int) -> int:
    """Node count of the cached top region of a LevelCache tree: all rows
    above the discarded region (excluding the leaf row)."""
    total = 0
    n = leafs
    row = 0
    while n > 1:
        n //= arity
        row += 1
        if row > rows_to_discard:
            total += n
    return total


def get_merkle_proof_lemma_len(row_count: int, arity: int) -> int:
    """Lemma length of an inclusion proof: leaf + (arity-1) siblings per
    level + root."""
    return 2 + (row_count - 1) * (arity - 1)


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass
class StoreConfig:
    """On-disk identity of a tree store
    (reference: storage/utilities.hpp:205-261)."""

    path: str
    id: str
    size: int = 0  # total node count (linear layout)
    rows_to_discard: int = 0

    def data_path(self) -> str:
        return os.path.join(self.path, f"sc-02-data-{self.id}.dat")

    @staticmethod
    def from_config(other: "StoreConfig", id: str, size: int | None = None) -> "StoreConfig":
        return StoreConfig(
            path=other.path,
            id=id,
            size=other.size if size is None else size,
            rows_to_discard=other.rows_to_discard,
        )


@dataclass
class ReplicaConfig:
    """Replica file + per-subtree offsets (reference: utilities.hpp:188-203)."""

    path: str
    offsets: list[int] = field(default_factory=lambda: [0])


# ---------------------------------------------------------------------------
# Stores
# ---------------------------------------------------------------------------


class Store:
    """Abstract node store (reference: utilities.hpp:264-278)."""

    def __len__(self) -> int:
        raise NotImplementedError

    def read_at(self, index: int) -> bytes:
        raise NotImplementedError

    def read_range(self, start: int, end: int) -> np.ndarray:
        raise NotImplementedError

    def write_at(self, index: int, value: bytes) -> None:
        raise NotImplementedError

    def write_range(self, start: int, values: np.ndarray) -> None:
        raise NotImplementedError

    def sync(self) -> None:
        pass


class VecStore(Store):
    """In-memory store (reference: storage/vec.hpp:37-101)."""

    def __init__(self, size: int):
        self._data = np.zeros((size, NODE_SIZE), dtype=np.uint8)

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "VecStore":
        s = cls(arr.shape[0])
        s._data[:] = arr
        return s

    def __len__(self) -> int:
        return self._data.shape[0]

    def read_at(self, index: int) -> bytes:
        return self._data[index].tobytes()

    def read_range(self, start: int, end: int) -> np.ndarray:
        return self._data[start:end].copy()

    def write_at(self, index: int, value: bytes) -> None:
        self._data[index] = np.frombuffer(value, dtype=np.uint8)

    def write_range(self, start: int, values: np.ndarray) -> None:
        self._data[start : start + values.shape[0]] = values


class MmapStore(Store):
    """mmap-backed store (reference: storage/mmap.hpp:45-133) — a
    numpy memmap over the same sc-02-data-<id>.dat layout DiskStore
    uses, for zero-copy reads of large trees."""

    def __init__(self, config: "StoreConfig", size: int | None = None, create: bool = False):
        self.config = config
        path = config.data_path()
        n = size if size is not None else config.size
        if create:
            mode = "w+"
        else:
            import os as _os

            n = n or _os.path.getsize(path) // NODE_SIZE
            mode = "r+"
        self._data = np.memmap(path, dtype=np.uint8, mode=mode, shape=(n, NODE_SIZE))

    def __len__(self) -> int:
        return self._data.shape[0]

    def read_at(self, index: int) -> bytes:
        return self._data[index].tobytes()

    def read_range(self, start: int, end: int) -> np.ndarray:
        return np.asarray(self._data[start:end])

    def write_at(self, index: int, value: bytes) -> None:
        self._data[index] = np.frombuffer(value, dtype=np.uint8)

    def write_range(self, start: int, values: np.ndarray) -> None:
        self._data[start : start + values.shape[0]] = values

    def sync(self) -> None:
        self._data.flush()


class DiskStore(Store):
    """File-backed store, memory-mapped (reference: storage/disk.hpp)."""

    def __init__(self, config: StoreConfig, size: int | None = None, create: bool = True):
        self.config = config
        self.path = config.data_path()
        n = size if size is not None else config.size
        if create and not os.path.exists(self.path):
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "wb") as f:
                f.truncate(n * NODE_SIZE)
        file_nodes = os.path.getsize(self.path) // NODE_SIZE
        if n == 0:
            n = file_nodes
        if file_nodes < n:
            with open(self.path, "r+b") as f:
                f.truncate(n * NODE_SIZE)
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r+", shape=(n, NODE_SIZE))

    @classmethod
    def new_from_disk(cls, size: int, config: StoreConfig) -> "DiskStore":
        if not os.path.exists(config.data_path()):
            raise FileNotFoundError(config.data_path())
        return cls(config, size=size, create=False)

    @classmethod
    def new_from_slice_with_config(cls, arr: np.ndarray, config: StoreConfig) -> "DiskStore":
        s = cls(config, size=arr.shape[0])
        s.write_range(0, arr)
        return s

    def __len__(self) -> int:
        return self._mm.shape[0]

    def read_at(self, index: int) -> bytes:
        return self._mm[index].tobytes()

    def read_range(self, start: int, end: int) -> np.ndarray:
        return np.asarray(self._mm[start:end]).copy()

    def write_at(self, index: int, value: bytes) -> None:
        self._mm[index] = np.frombuffer(value, dtype=np.uint8)

    def write_range(self, start: int, values: np.ndarray) -> None:
        self._mm[start : start + values.shape[0]] = values

    def sync(self) -> None:
        self._mm.flush()


class ExternalReader:
    """Reads leaf data straight from a replica file at an offset
    (reference: level_cache.hpp ExternalReader over the replica)."""

    def __init__(self, path: str, offset: int = 0):
        self.path = path
        self.offset = offset

    def read(self, start: int, end: int) -> np.ndarray:
        count = end - start
        with open(self.path, "rb") as f:
            f.seek(self.offset + start * NODE_SIZE)
            raw = f.read(count * NODE_SIZE)
        return np.frombuffer(raw, dtype=np.uint8).reshape(count, NODE_SIZE).copy()


class LevelCacheStore(Store):
    """Truncated tree store: leaf row via external reader (replica file),
    discarded middle rows absent, top rows cached
    (reference: storage/level_cache.hpp:52-651).

    Linear indexing matches the full tree layout; reads within the
    discarded region raise — callers must rebuild those rows from leaves
    (see MerkleTree.gen_cached_proof).
    """

    def __init__(
        self,
        leafs: int,
        arity: int,
        rows_to_discard: int,
        cache: np.ndarray,
        reader: ExternalReader,
    ):
        self.leafs = leafs
        self.arity = arity
        self.rows_to_discard = rows_to_discard
        self.reader = reader
        expected_cache = get_merkle_tree_cache_size(leafs, arity, rows_to_discard)
        if cache.shape[0] != expected_cache:
            raise ValueError(
                f"cache has {cache.shape[0]} nodes, expected {expected_cache}"
            )
        self._cache = cache
        self._len = get_merkle_tree_len(leafs, arity)
        # linear offset where the cached top region begins
        off, n = 0, leafs
        for _ in range(rows_to_discard + 1):
            off += n
            n //= arity
        self._cache_start = off

    def __len__(self) -> int:
        return self._len

    def read_at(self, index: int) -> bytes:
        return self.read_range(index, index + 1)[0].tobytes()

    def read_range(self, start: int, end: int) -> np.ndarray:
        if end <= self.leafs:
            return self.reader.read(start, end)
        if start >= self._cache_start:
            return np.asarray(
                self._cache[start - self._cache_start : end - self._cache_start]
            ).copy()
        raise IndexError(
            f"range [{start},{end}) falls in the discarded region "
            f"[{self.leafs},{self._cache_start})"
        )

    def write_at(self, index: int, value: bytes) -> None:
        raise NotImplementedError("LevelCacheStore is read-only")

    def write_range(self, start: int, values: np.ndarray) -> None:
        raise NotImplementedError("LevelCacheStore is read-only")
