"""Partition arithmetic (reference core/partitions.hpp:34-41)."""
from __future__ import annotations


def partition_count(total_challenges: int, challenges_per_partition: int) -> int:
    assert challenges_per_partition > 0
    return -(-total_challenges // challenges_per_partition)
