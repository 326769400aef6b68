"""Replay the committed DRG PoRep Groth16 proof artifacts.

scripts/drg_groth16_e2e.py replicates a fixed 8-node DRG sector and
drives the DrgPoRepCompound ladder through Groth16 with fixed
randomness (reference porep/drg/compound.hpp:41-224), committing the
192-byte proof + vk to tests/golden/drg8/. This test replays them
through CompoundProof.verify without re-running the prover.
"""
import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "drg8")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN, "proof.bin")),
    reason="no committed drg8 artifacts (scripts/drg_groth16_e2e.py not yet run)",
)


@pytest.fixture()
def golden():
    import numpy as np

    from crypto3_fil_proofs_tpu.models.porep.drg.vanilla import (
        DrgParams,
        DrgPoRep,
        PublicInputs,
        SetupParams,
        Tau,
    )
    from crypto3_fil_proofs_tpu.zk import groth16

    with open(os.path.join(GOLDEN, "inputs.json")) as f:
        inputs = json.load(f)
    with open(os.path.join(GOLDEN, "proof.bin"), "rb") as f:
        proof = f.read()
    vk = groth16.VerifyingKey.from_npz_dict(
        np.load(os.path.join(GOLDEN, "vk.npz"), allow_pickle=False)
    )
    sp = SetupParams(
        drg=DrgParams(
            nodes=inputs["nodes"],
            degree=inputs["degree"],
            expansion_degree=0,
            seed=bytes.fromhex(inputs["drg_seed"]),
        ),
        challenges_count=len(inputs["challenges"]),
    )
    pp = DrgPoRep.setup(sp)
    pub = PublicInputs(
        replica_id=bytes.fromhex(inputs["replica_id"]),
        challenges=inputs["challenges"],
        tau=Tau(
            comm_d=bytes.fromhex(inputs["comm_d"]),
            comm_r=bytes.fromhex(inputs["comm_r"]),
        ),
    )
    return pp, pub, proof, vk, inputs


def test_golden_drg_proof_verifies(golden):
    from crypto3_fil_proofs_tpu.core.compound import CompoundProof, MultiProof
    from crypto3_fil_proofs_tpu.models.porep.drg.circuit import DrgPoRepCompound

    pp, pub, proof, vk, inputs = golden
    assert len(proof) == inputs["proof_len"] == 192
    compound = CompoundProof(DrgPoRepCompound())
    assert compound.verify(pp, pub, MultiProof.from_bytes(proof, 1), vk)


def test_golden_drg_tamper_rejected(golden):
    from crypto3_fil_proofs_tpu.core.compound import CompoundProof, MultiProof
    from crypto3_fil_proofs_tpu.models.porep.drg.circuit import DrgPoRepCompound

    pp, pub, proof, vk, inputs = golden
    compound = CompoundProof(DrgPoRepCompound())
    # a corrupted proof is rejected either at point-decompression (the
    # flipped x lands off-curve -> ValueError) or by the pairing check
    for byte, mask in ((7, 0x20), (50, 0x01), (191, 0x80)):
        bad = bytearray(proof)
        bad[byte] ^= mask
        try:
            mp = MultiProof.from_bytes(bytes(bad), 1)
        except ValueError:
            continue
        assert not compound.verify(pp, pub, mp, vk)


def test_golden_drg_wrong_inputs_rejected(golden):
    from crypto3_fil_proofs_tpu.core.compound import CompoundProof, MultiProof
    from crypto3_fil_proofs_tpu.models.porep.drg.circuit import DrgPoRepCompound

    pp, pub, proof, vk, inputs = golden
    pub.replica_id = bytes(32)
    compound = CompoundProof(DrgPoRepCompound())
    assert not compound.verify(pp, pub, MultiProof.from_bytes(proof, 1), vk)
