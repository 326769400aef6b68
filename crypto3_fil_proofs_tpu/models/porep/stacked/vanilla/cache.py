"""Parent cache: precomputed on-disk parent table.

Mirrors reference stacked/vanilla/cache.hpp:52-252 — one file per
(graph identity), DEGREE u32 little-endian entries per node, stored under
the parent-cache dir (`FIL_PROOFS_PARENT_CACHE`, default
/var/tmp/filecoin-parents), generated once under an exclusive lock and
memory-mapped on reuse, with length consistency checks.
"""
from __future__ import annotations

import fcntl
import hashlib
import os

import numpy as np

from crypto3_fil_proofs_tpu.core.settings import settings

VERSION = 1


def parent_cache_path(graph_identifier: str, degree: int, nodes: int) -> str:
    digest = hashlib.sha256(graph_identifier.encode()).hexdigest()[:32]
    return os.path.join(
        settings().parent_cache, f"v{VERSION}-sdr-parent-{digest}.cache"
    )


class ParentCache:
    """Parent table, disk-backed and memory-mapped."""

    def __init__(self, graph):
        self.degree = graph.degree()
        self.nodes = graph.size()
        self.path = parent_cache_path(graph.identifier(), self.degree, self.nodes)
        self._table = self._open_or_generate(graph)

    def _open_or_generate(self, graph) -> np.ndarray:
        expected_bytes = self.nodes * self.degree * 4
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        lock_path = self.path + ".lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if (
                    os.path.exists(self.path)
                    and os.path.getsize(self.path) == expected_bytes
                ):
                    return np.memmap(
                        self.path, dtype="<u4", mode="r", shape=(self.nodes, self.degree)
                    )
                tmp = self.path + ".tmp"
                mm = np.memmap(
                    tmp, dtype="<u4", mode="w+",
                    shape=(self.nodes, self.degree),
                )
                if hasattr(graph, "parents_into"):
                    # windowed generation straight into the disk mmap —
                    # the one-shot parents_all held ~13 GB at 512MiB
                    # (nodes x degree plus vectorized sampling temps)
                    graph.parents_into(mm)
                else:
                    mm[:] = graph.parents_all()
                mm.flush()
                del mm
                os.replace(tmp, self.path)
                return np.memmap(
                    self.path, dtype="<u4", mode="r", shape=(self.nodes, self.degree)
                )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def read(self, node: int) -> np.ndarray:
        return np.asarray(self._table[node])

    def table(self) -> np.ndarray:
        """The full (nodes, degree) parent table."""
        return np.asarray(self._table)
