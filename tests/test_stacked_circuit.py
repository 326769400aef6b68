"""Stacked SDR circuit: synthesis satisfaction + public-input parity.

Analog of reference libs/storage/test/porep/stacked/circuit/proof.cpp
(synthesis with expected num_inputs, witness satisfaction, tamper
rejection) at the 2KiB class with 1 challenge to keep synthesis fast.
"""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.fr32 import pad_sector
from crypto3_fil_proofs_tpu.models.porep.stacked.circuit import proof as circ
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.params import (
    LayerChallenges,
    PrivateInputs,
    PublicInputs,
    SetupParams,
    generate_replica_id,
)
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof import StackedDrg

SECTOR = 2048
NODES = SECTOR // 32
POREP_ID = bytes([1] * 32)


@pytest.fixture(scope="module")
def sealed_one_challenge():
    sp = SetupParams(
        nodes=NODES,
        degree=6,
        expansion_degree=8,
        porep_id=POREP_ID,
        layer_challenges=LayerChallenges(layers=2, max_count=1),
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
    pub = PublicInputs(replica_id=replica_id, seed=bytes([7] * 32), tau=tau, k=None)
    priv = PrivateInputs(p_aux=p_aux, t_aux=t_aux)
    proofs = StackedDrg.prove_all_partitions(pp, pub, priv, partitions=1)
    assert StackedDrg.verify_all_partitions(pp, pub, proofs)
    return pp, pub, p_aux, proofs


def test_stacked_circuit_satisfied_and_inputs_match(sealed_one_challenge):
    pp, pub, p_aux, proofs = sealed_one_challenge
    cs = circ.circuit_from_vanilla(
        pp, pub, proofs[0], p_aux.comm_c, p_aux.comm_r_last
    )
    bad = cs.which_unsatisfied()
    assert bad is None, f"unsatisfied: {bad}"

    want_inputs = circ.generate_public_inputs(pp, pub, k=0)
    got_inputs = [
        v for v, is_in in zip(cs.values, cs.is_input) if is_in
    ][1:]  # drop leading constant 1
    assert got_inputs == want_inputs


def test_stacked_circuit_rejects_tampered_label(sealed_one_challenge):
    import copy

    pp, pub, p_aux, proofs = sealed_one_challenge
    tampered = copy.deepcopy(proofs[0])
    col = tampered[0].replica_column_proofs.c_x.column
    first = bytearray(col.rows[0])
    first[0] ^= 1
    col.rows[0] = bytes(first)
    cs = circ.circuit_from_vanilla(
        pp, pub, tampered, p_aux.comm_c, p_aux.comm_r_last
    )
    assert cs.which_unsatisfied() is not None


def test_blank_and_witness_circuits_share_structure(sealed_one_challenge):
    """The blank (CRS) circuit and the witness circuit must have
    identical shape — variable and constraint counts — or cached Groth16
    parameters cannot prove real seals (reference compound_proof
    blank_circuit contract; caught live: a witness-sized addmany width
    made the 2KiB witness circuit diverge from its CRS)."""
    from crypto3_fil_proofs_tpu.models.porep.stacked.circuit.compound import (
        StackedCompound,
    )

    pp, pub, p_aux, proofs = sealed_one_challenge
    witness_cs = circ.circuit_from_vanilla(
        pp, pub, proofs[0], p_aux.comm_c, p_aux.comm_r_last
    )
    blank_cs = StackedCompound(shape=(8, 0, 0)).blank_circuit(pp)
    assert blank_cs.num_constraints == witness_cs.num_constraints
    assert blank_cs.num_inputs == witness_cs.num_inputs
    assert blank_cs.num_aux == witness_cs.num_aux


def test_batched_matches_scalar_oracle(sealed_one_challenge, monkeypatch):
    """The challenge-batched emitter (circuit/batched.py, the default)
    is semantically identical to the scalar per-challenge path: same
    constraint count, same public-input values in the same order, and
    both satisfied by the same vanilla proofs (variable ORDER differs by
    design)."""
    pp, pub, p_aux, proofs = sealed_one_challenge
    monkeypatch.setenv("FIL_PROOFS_SDR_SYNTH", "scalar")
    cs_s = circ.circuit_from_vanilla(
        pp, pub, proofs[0], p_aux.comm_c, p_aux.comm_r_last
    )
    monkeypatch.setenv("FIL_PROOFS_SDR_SYNTH", "batched")
    cs_b = circ.circuit_from_vanilla(
        pp, pub, proofs[0], p_aux.comm_c, p_aux.comm_r_last
    )
    assert cs_b.num_constraints == cs_s.num_constraints
    assert cs_b.num_inputs == cs_s.num_inputs
    ins_s = [v for v, i in zip(cs_s.values, cs_s.is_input) if i]
    ins_b = [v for v, i in zip(cs_b.values, cs_b.is_input) if i]
    assert ins_s == ins_b
    assert cs_s.which_unsatisfied() is None
    assert cs_b.which_unsatisfied() is None
