"""Stacked SDR PoRep vanilla roundtrip at the 2KiB test sector class
(layers=2, challenges=2, partitions=1 — reference constants.hpp:65-78;
test analog: libs/storage/test/porep/stacked/vanilla/proof.cpp)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.fr32 import pad_sector
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.params import (
    LayerChallenges,
    PublicInputs,
    PrivateInputs,
    SetupParams,
    Tau,
    generate_replica_id,
)
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof import StackedDrg

SECTOR = 2048
NODES = SECTOR // 32
POREP_ID = bytes([1] * 32)


@pytest.fixture(scope="module")
def sealed():
    sp = SetupParams(
        nodes=NODES,
        degree=6,
        expansion_degree=8,
        porep_id=POREP_ID,
        layer_challenges=LayerChallenges(layers=2, max_count=2),
    )
    pp = StackedDrg.setup(sp)
    data = bytes((i * 37 + 11) % 256 for i in range(2032))
    leaves = pad_sector(data, SECTOR)
    replica_id = generate_replica_id(
        bytes([9] * 32), 5, bytes([3] * 32), b"\0" * 32, POREP_ID
    )
    tau, p_aux, t_aux, replica = StackedDrg.transform_and_replicate_layers(
        pp, replica_id, leaves, shape=(8, 0, 0)
    )
    return pp, replica_id, leaves, tau, p_aux, t_aux, replica, data


def test_commitments_shape(sealed):
    pp, replica_id, leaves, tau, p_aux, t_aux, replica, data = sealed
    assert len(tau.comm_d) == 32 and len(tau.comm_r) == 32
    # comm_r binds comm_c and comm_r_last
    from crypto3_fil_proofs_tpu.ops.poseidon import hash2

    expect = hash2(
        int.from_bytes(p_aux.comm_c, "little"),
        int.from_bytes(p_aux.comm_r_last, "little"),
    ).to_bytes(32, "little")
    assert tau.comm_r == expect
    # replica differs from data
    assert not (replica == leaves).all()


def test_prove_verify_roundtrip(sealed):
    pp, replica_id, leaves, tau, p_aux, t_aux, replica, data = sealed
    pub = PublicInputs(replica_id=replica_id, seed=bytes([7] * 32), tau=tau, k=None)
    priv = PrivateInputs(p_aux=p_aux, t_aux=t_aux)
    proofs = StackedDrg.prove_all_partitions(pp, pub, priv, partitions=1)
    assert len(proofs) == 1 and len(proofs[0]) == 2
    assert StackedDrg.verify_all_partitions(pp, pub, proofs)


def test_verify_rejects_tampering(sealed):
    pp, replica_id, leaves, tau, p_aux, t_aux, replica, data = sealed
    pub = PublicInputs(replica_id=replica_id, seed=bytes([7] * 32), tau=tau, k=None)
    priv = PrivateInputs(p_aux=p_aux, t_aux=t_aux)
    proofs = StackedDrg.prove_all_partitions(pp, pub, priv, partitions=1)

    # wrong seed -> different challenges -> proofs don't match
    bad_pub = PublicInputs(replica_id=replica_id, seed=bytes([8] * 32), tau=tau, k=None)
    assert not StackedDrg.verify_all_partitions(pp, bad_pub, proofs)

    # tampered comm_r
    bad_tau = Tau(comm_d=tau.comm_d, comm_r=bytes(32))
    bad_pub2 = PublicInputs(replica_id=replica_id, seed=bytes([7] * 32), tau=bad_tau)
    assert not StackedDrg.verify_all_partitions(pp, bad_pub2, proofs)

    # tampered labeling proof parent
    import copy

    bad = copy.deepcopy(proofs)
    bad[0][0].labeling_proofs[0].parents[0] = bytes(32)
    assert not StackedDrg.verify_all_partitions(pp, pub, bad)


def test_unseal_recovers_data(sealed):
    pp, replica_id, leaves, tau, p_aux, t_aux, replica, data = sealed
    decoded = StackedDrg.extract_and_invert_transform_layers(pp, replica_id, replica)
    assert (decoded == leaves).all()
    from crypto3_fil_proofs_tpu.core.fr32 import write_unpadded

    raw = write_unpadded(decoded.tobytes(), 0, len(data))
    assert raw == data


def test_multiple_partitions(sealed):
    pp, replica_id, leaves, tau, p_aux, t_aux, replica, data = sealed
    pub = PublicInputs(replica_id=replica_id, seed=bytes([7] * 32), tau=tau, k=None)
    priv = PrivateInputs(p_aux=p_aux, t_aux=t_aux)
    proofs = StackedDrg.prove_all_partitions(pp, pub, priv, partitions=2)
    assert len(proofs) == 2
    assert StackedDrg.verify_all_partitions(pp, pub, proofs)
    # partition challenges differ
    ch0 = pub.challenges(pp.layer_challenges, NODES, 0)
    ch1 = pub.challenges(pp.layer_challenges, NODES, 1)
    assert ch0 != ch1


def test_streamed_labels_match_in_ram(tmp_path):
    """generate_labels_streamed (2-layer ping-pong + per-layer persist)
    is bit-identical to the in-RAM path (reference proof.hpp:311-354)."""
    import numpy as np

    from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.graph import (
        StackedBucketGraph,
    )
    from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof import StackedDrg

    graph = StackedBucketGraph(64, base_degree=6, expansion_degree=8,
                               porep_id=bytes([5] * 32))
    rid = bytes([2] * 32)
    layers = 3
    ram = StackedDrg.generate_labels(graph, layers, rid)
    paths = [str(tmp_path / f"layer-{i}") for i in range(1, layers + 1)]
    streamed = StackedDrg.generate_labels_streamed(graph, layers, rid, paths)
    for l in range(1, layers + 1):
        assert np.array_equal(ram.layer(l), streamed.layer(l))
