"""Sector identity types (reference core/sector.hpp:34-38).

The reference's `ordered_sector_set` (btree::set<sector_id_type>)
collapses to a sorted python view — SURVEY §7 deliberately drops the
vendored btree containers.
"""
from __future__ import annotations

SectorId = int


def ordered_sector_set(sector_ids) -> list[SectorId]:
    """Sorted, de-duplicated sector id list."""
    return sorted(set(int(s) for s in sector_ids))
