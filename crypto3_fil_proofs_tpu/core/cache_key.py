"""Canonical on-disk cache names (reference core/cache_key.hpp:1-38)."""
from __future__ import annotations

PAUX = "p_aux"
TAUX = "t_aux"
COMM_D_TREE = "tree-d"
COMM_C_TREE = "tree-c"
COMM_R_LAST_TREE = "tree-r-last"


def label_layer(layer: int) -> str:
    """1-indexed layer file id (reference cache_key.hpp label_layer)."""
    return f"layer-{layer}"
