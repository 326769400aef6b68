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


def test_drg_compound_circuit_parity(rng_seed):
    """Compound ladder (reference porep/drg/compound.hpp:41-224):
    witness circuit satisfied, public-input order matches
    generate_public_inputs, blank circuit (setup shape) matches the
    witness circuit's constraint/input counts. The Groth16 leg runs on
    TPU via scripts/drg_groth16_e2e.py with artifacts replayed by
    tests/test_drg_golden.py."""
    from crypto3_fil_proofs_tpu.models.porep.drg import circuit as dcirc

    # tiny 8-node instance: the 1-challenge circuit is ~2M constraints
    # (sha256 trees + create_key), so keep the CI leg minimal
    sp = SetupParams(
        drg=DrgParams(nodes=8, degree=6, expansion_degree=0, seed=bytes([9] * 32)),
        challenges_count=1,
    )
    pp1 = DrgPoRep.setup(sp)
    rng = np.random.default_rng(rng_seed)
    data = rng.integers(0, 64, size=(8, 32), dtype=np.uint8)
    replica_id = bytes(rng.integers(0, 64, size=32, dtype=np.uint8))
    tau, aux, replica = DrgPoRep.replicate(pp1, replica_id, data)
    pub = PublicInputs(replica_id=replica_id, challenges=[3], tau=tau)
    priv = PrivateInputs(tree_d=aux.tree_d, tree_r=aux.tree_r)
    proof = DrgPoRep.prove(pp1, pub, priv)
    assert DrgPoRep.verify(pp1, pub, proof)
    cs = dcirc.circuit_from_vanilla(pp1, pub, proof)
    assert cs.which_unsatisfied() is None
    comp = dcirc.DrgPoRepCompound()
    want = comp.generate_public_inputs(pp1, pub)
    got = [v for v, i in zip(cs.values, cs.is_input) if i][1:]
    assert got == want
    blank = comp.blank_circuit(pp1)
    assert blank.num_constraints == cs.num_constraints
    assert blank.num_inputs == cs.num_inputs

    # tampered parent value breaks the key derivation / decode binding
    import copy

    bad = copy.deepcopy(proof)
    idx, dp = bad.replica_parents[0][0]
    flipped = bytearray(dp.data)
    flipped[0] ^= 1
    dp2 = type(dp)(proof=dp.proof, data=bytes(flipped))
    bad.replica_parents[0][0] = (idx, dp2)
    cs2 = dcirc.circuit_from_vanilla(pp1, pub, bad)
    assert cs2.which_unsatisfied() is not None
