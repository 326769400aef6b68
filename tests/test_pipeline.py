"""Multi-sector sealing pipeline: parity with single-sector sealing."""
import numpy as np

from crypto3_fil_proofs_tpu.core.fr32 import pad_sector
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.params import (
    LayerChallenges,
    SetupParams,
    generate_replica_id,
)
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof import StackedDrg
from crypto3_fil_proofs_tpu.parallel.pipeline import SectorJob, seal_many

SECTOR = 2048
NODES = SECTOR // 32
POREP_ID = bytes([1] * 32)


def test_seal_many_matches_single(rng_seed):
    sp = SetupParams(
        nodes=NODES,
        degree=6,
        expansion_degree=8,
        porep_id=POREP_ID,
        layer_challenges=LayerChallenges(layers=2, max_count=2),
    )
    pp = StackedDrg.setup(sp)

    jobs = []
    for sector_id in (3, 4, 9):
        data = bytes((i * 31 + sector_id) % 256 for i in range(2032))
        leaves = pad_sector(data, SECTOR)
        rid = generate_replica_id(
            bytes([9] * 32), sector_id, bytes([3] * 32), b"\0" * 32, POREP_ID
        )
        jobs.append(SectorJob(sector_key=sector_id, replica_id=rid, data_leaves=leaves))

    sealed = seal_many(pp, jobs, shape=(8, 0, 0), workers=3)
    assert [s.sector_key for s in sealed] == [3, 4, 9]

    # pipeline output must be bit-identical with the single-sector path
    for job, got in zip(jobs, sealed):
        tau, p_aux, _, replica = StackedDrg.transform_and_replicate_layers(
            pp, job.replica_id, job.data_leaves, shape=(8, 0, 0)
        )
        assert got.tau.comm_d == tau.comm_d
        assert got.tau.comm_r == tau.comm_r
        assert got.p_aux.comm_c == p_aux.comm_c
        assert np.array_equal(got.replica, replica)
