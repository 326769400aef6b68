"""Multi-sector sealing pipeline: host labeling // TPU tree building.

The TPU-native answer to the reference's multicore-SDR pipeline
(reference: SURVEY §2.9 P2 — producer threads + sequential consumer,
configuration.hpp:60-65): SDR labeling is an inherently sequential hash
chain per layer, so it stays on host cores — but DIFFERENT SECTORS are
independent, so a pool of workers labels sectors in parallel (the
native SHA-NI engine releases the GIL during its C call) while the
main thread streams finished sectors through the TPU/accelerated tree
and column builders. At steady state labeling and commitment building
fully overlap.
"""
from __future__ import annotations

import concurrent.futures as _fut
from dataclasses import dataclass

import numpy as np

from ..core.settings import settings
from ..models.porep.stacked.vanilla.params import Labels
from ..models.porep.stacked.vanilla.proof import StackedDrg


@dataclass
class SectorJob:
    sector_key: object  # caller's identity (e.g. (sector_id, cache_dir))
    replica_id: bytes
    data_leaves: np.ndarray  # (nodes, 32) uint8 padded sector data


@dataclass
class SealedSector:
    sector_key: object
    tau: object
    p_aux: object
    t_aux: object
    replica: np.ndarray


def seal_many(
    pp,
    jobs: list[SectorJob],
    shape=(8, 0, 0),
    workers: int | None = None,
    configs_for=None,
) -> list[SealedSector]:
    """Replicate many sectors with labeling/tree-build overlap.

    `configs_for(sector_key) -> dict` may supply per-sector StoreConfigs
    (tree-d / tree-c / tree-r-last) for on-disk persistence.
    Results are returned in job order.
    """
    workers = workers or max(1, settings().multicore_sdr_producers)
    graph, layers = pp.graph, pp.layers
    parents = None  # shared parent tables are cached inside the graph

    def label(job: SectorJob) -> Labels:
        return StackedDrg.generate_labels(graph, layers, job.replica_id)

    results: list[SealedSector | None] = [None] * len(jobs)
    with _fut.ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {pool.submit(label, job): i for i, job in enumerate(jobs)}
        for fut in _fut.as_completed(futures):
            i = futures[fut]
            job = jobs[i]
            labels = fut.result()
            # commitment building (device-accelerated) on the main thread
            cfg = configs_for(job.sector_key) if configs_for else None
            tau, p_aux, t_aux, replica = _transform(
                pp, job, labels, shape, cfg
            )
            results[i] = SealedSector(job.sector_key, tau, p_aux, t_aux, replica)
    return results  # type: ignore[return-value]


def _transform(pp, job, labels, shape, configs):
    """tree_d/tree_c/encode/tree_r_last/comm_r for pre-labeled data
    (the phase-2 half of transform_and_replicate_layers)."""
    from ..core.merkle.builders import create_tree
    from ..core.merkle.tree import MerkleTree
    from ..ops.fr_numpy import fr_add_bytes
    from ..ops.poseidon import hash2
    from ..ops.tree_hash import get_backend
    from ..models.porep.stacked.vanilla.params import (
        PersistentAux,
        Tau,
        TemporaryAux,
    )

    configs = configs or {}
    nodes = job.data_leaves.shape[0]
    tree_d = MerkleTree.build(job.data_leaves, 2, "sha256", configs.get("tree-d"))
    hb = get_backend("poseidon")
    cols = np.stack(labels.layers_data, axis=1).reshape(
        nodes * labels.layers, 32
    )
    col_leaves = hb.hash_level(cols, labels.layers)
    tree_c = create_tree(
        col_leaves, shape[0], shape[1], shape[2], "poseidon",
        configs.get("tree-c"),
    )
    replica = fr_add_bytes(job.data_leaves, labels.layer(labels.layers))
    tree_r_last = create_tree(
        replica, shape[0], shape[1], shape[2], "poseidon",
        configs.get("tree-r-last"),
    )
    comm_r = hash2(
        int.from_bytes(tree_c.root(), "little"),
        int.from_bytes(tree_r_last.root(), "little"),
    ).to_bytes(32, "little")
    return (
        Tau(comm_d=tree_d.root(), comm_r=comm_r),
        PersistentAux(comm_c=tree_c.root(), comm_r_last=tree_r_last.root()),
        TemporaryAux(
            labels=labels, tree_d=tree_d, tree_c=tree_c,
            tree_r_last=tree_r_last,
        ),
        replica,
    )
