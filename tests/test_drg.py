"""DRG PoRep vanilla roundtrip (reference test: porep/drg/vanilla.cpp)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.models.porep.drg.vanilla import (
    DrgParams,
    DrgPoRep,
    PrivateInputs,
    PublicInputs,
    SetupParams,
)

NODES = 64


@pytest.fixture(scope="module")
def replicated(rng_seed=0x5EED):
    sp = SetupParams(
        drg=DrgParams(nodes=NODES, degree=6, expansion_degree=0, seed=bytes([9] * 32)),
        challenges_count=2,
    )
    pp = DrgPoRep.setup(sp)
    rng = np.random.default_rng(rng_seed)
    data = rng.integers(0, 64, size=(NODES, 32), dtype=np.uint8)
    replica_id = bytes(rng.integers(0, 64, size=32, dtype=np.uint8))
    tau, aux, replica = DrgPoRep.replicate(pp, replica_id, data)
    return pp, replica_id, data, tau, aux, replica


def test_replicate_and_extract(replicated):
    pp, replica_id, data, tau, aux, replica = replicated
    assert not np.array_equal(replica, data)
    back = DrgPoRep.extract_all(pp, replica_id, replica)
    assert np.array_equal(back, data)


def test_prove_verify(replicated):
    pp, replica_id, data, tau, aux, replica = replicated
    pub = PublicInputs(replica_id=replica_id, challenges=[3, 7], tau=tau)
    priv = PrivateInputs(tree_d=aux.tree_d, tree_r=aux.tree_r)
    proof = DrgPoRep.prove(pp, pub, priv)
    assert DrgPoRep.verify(pp, pub, proof)
    # tampered challenge set fails
    bad_pub = PublicInputs(replica_id=replica_id, challenges=[3, 8], tau=tau)
    assert not DrgPoRep.verify(pp, bad_pub, proof)
    # tampered replica id fails
    bad_id = bytes([replica_id[0] ^ 1]) + replica_id[1:]
    bad_pub2 = PublicInputs(replica_id=bad_id, challenges=[3, 7], tau=tau)
    assert not DrgPoRep.verify(pp, bad_pub2, proof)
