"""Node-size helpers (reference: core/utilities.hpp:36-93)."""
from __future__ import annotations

from .settings import settings

NODE_SIZE = 32


def data_at_node_offset(node: int) -> int:
    return node * NODE_SIZE


def data_at_node(data: bytes, node: int) -> bytes:
    off = data_at_node_offset(node)
    if off + NODE_SIZE > len(data):
        raise ValueError(f"node {node} out of range")
    return data[off : off + NODE_SIZE]


def default_rows_to_discard(leaves: int, arity: int) -> int:
    """Cache truncation depth per tree shape
    (reference: core/utilities.hpp + merkle/storage/utilities.hpp:211-234):
    row_count bounds the discard; binary trees cap at 7, quad at 5, oct at
    the configured setting (default 2)."""
    rows = merkle_row_count(leaves, arity)
    if rows <= 2:
        return 0
    if arity == 2:
        cap = 7
    elif arity == 4:
        cap = 5
    else:
        cap = settings().rows_to_discard
    return min(cap, rows - 2)


def merkle_row_count(leaves: int, arity: int) -> int:
    """Number of rows including the leaf row and the root row."""
    if leaves <= 1:
        return 1
    rows = 1
    n = leaves
    while n > 1:
        assert n % arity == 0, f"{n} not divisible by arity {arity}"
        n //= arity
        rows += 1
    return rows
