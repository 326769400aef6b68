"""Replay the committed 2KiB SDR PoRep Groth16 proof artifacts.

scripts/seal2k_e2e.py seals a fixed 2KiB sector with fixed randomness
(BASELINE config #4; reference api/seal.hpp:260-337 commit phase2 +
339-395 verify_seal) and commits the 192-byte proof + verifying key to
tests/golden/seal2k/. This test replays them through the production
verify_seal path: the proof bytes in git must keep verifying, and
tampered bytes must keep failing, without re-running the prover.
"""
import json
import os
import shutil

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "seal2k")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN, "proof.bin")),
    reason="no committed seal2k artifacts (scripts/seal2k_e2e.py not yet run)",
)


@pytest.fixture()
def golden(tmp_path, monkeypatch):
    with open(os.path.join(GOLDEN, "inputs.json")) as f:
        inputs = json.load(f)
    with open(os.path.join(GOLDEN, "proof.bin"), "rb") as f:
        proof = f.read()
    # seed a private parameter cache with the committed vk so
    # verify_seal resolves it instead of regenerating a CRS
    monkeypatch.setenv("FIL_PROOFS_PARAMETER_CACHE", str(tmp_path))
    from crypto3_fil_proofs_tpu import caches
    from crypto3_fil_proofs_tpu.constants import SECTOR_SHAPES
    from crypto3_fil_proofs_tpu.core.parameter_cache import vk_path
    from crypto3_fil_proofs_tpu.models.porep.stacked.circuit.compound import (
        StackedCompound,
    )
    from crypto3_fil_proofs_tpu.parameters import public_params
    from crypto3_fil_proofs_tpu.types import PoRepConfig

    caches.clear_caches()
    config = PoRepConfig.for_sector_size(
        inputs["sector_size"], bytes.fromhex(inputs["porep_id"])
    )
    prefix = StackedCompound(
        shape=SECTOR_SHAPES[inputs["sector_size"]]
    ).cache_prefix(public_params(config))
    shutil.copy(os.path.join(GOLDEN, "vk.npz"), vk_path(prefix))
    yield config, inputs, proof
    caches.clear_caches()


def test_golden_seal_proof_verifies(golden):
    from crypto3_fil_proofs_tpu.api import seal as api_seal

    config, inputs, proof = golden
    assert len(proof) == inputs["proof_len"] == 192 * config.partitions
    ok = api_seal.verify_seal(
        config,
        bytes.fromhex(inputs["comm_r"]),
        bytes.fromhex(inputs["comm_d"]),
        bytes.fromhex(inputs["prover_id"]),
        inputs["sector_id"],
        bytes.fromhex(inputs["ticket"]),
        bytes.fromhex(inputs["seed"]),
        proof,
    )
    assert ok, "committed golden proof must verify"


def test_golden_seal_proof_tamper_rejected(golden):
    from crypto3_fil_proofs_tpu.api import seal as api_seal

    config, inputs, proof = golden
    bad = bytearray(proof)
    bad[5] ^= 0x40
    assert not api_seal.verify_seal(
        config,
        bytes.fromhex(inputs["comm_r"]),
        bytes.fromhex(inputs["comm_d"]),
        bytes.fromhex(inputs["prover_id"]),
        inputs["sector_id"],
        bytes.fromhex(inputs["ticket"]),
        bytes.fromhex(inputs["seed"]),
        bytes(bad),
    )


def test_golden_seal_wrong_seed_rejected(golden):
    from crypto3_fil_proofs_tpu.api import seal as api_seal

    config, inputs, proof = golden
    assert not api_seal.verify_seal(
        config,
        bytes.fromhex(inputs["comm_r"]),
        bytes.fromhex(inputs["comm_d"]),
        bytes.fromhex(inputs["prover_id"]),
        inputs["sector_id"],
        bytes.fromhex(inputs["ticket"]),
        bytes(32),  # wrong interactive seed -> different challenges
        proof,
    )


def test_golden_verify_batch_seal(golden):
    """verify_batch_seal all-or-nothing semantics over the golden proof
    (reference: api/seal.hpp verify_batch_seal)."""
    from crypto3_fil_proofs_tpu.api import seal as api_seal

    config, inputs, proof = golden
    item = dict(
        comm_r=bytes.fromhex(inputs["comm_r"]),
        comm_d=bytes.fromhex(inputs["comm_d"]),
        prover_id=bytes.fromhex(inputs["prover_id"]),
        sector_id=inputs["sector_id"],
        ticket=bytes.fromhex(inputs["ticket"]),
        seed=bytes.fromhex(inputs["seed"]),
        proof_bytes=proof,
    )
    assert api_seal.verify_batch_seal(config, [item, dict(item)])
    bad = dict(item)
    tampered = bytearray(proof)
    tampered[9] ^= 1
    bad["proof_bytes"] = bytes(tampered)
    assert not api_seal.verify_batch_seal(config, [item, bad])
