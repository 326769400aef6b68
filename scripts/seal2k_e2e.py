"""End-to-end 2KiB SDR PoRep: seal -> Groth16 proof -> verify_seal.

BASELINE config #4 / VERDICT round-1 item #1: produce and verify a real
SDR PoRep Groth16 proof (reference api/seal.hpp:260-337 commit phase2,
core/proof/compound_proof.hpp:85-137), with fixed randomness so the
192-byte proof is reproducible, and commit the artifacts:

  tests/golden/seal2k/inputs.json   fixed seal inputs + commitments
  tests/golden/seal2k/proof.bin     192-byte Groth16 proof
  tests/golden/seal2k/vk.npz        verifying key for replay

The CRS is cached under FIL_PROOFS_PARAMETER_CACHE (repo-local
.cache/filecoin-proof-parameters by default here) with the reference's
v28-<id>.params naming; reruns reuse it.

Run:  python scripts/seal2k_e2e.py [--stage all|crs|seal|prove]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "FIL_PROOFS_PARAMETER_CACHE",
    os.path.join(REPO, ".cache", "filecoin-proof-parameters"),
)
sys.path.insert(0, REPO)

SECTOR_SIZE = 2048
PROVER_ID = bytes([9] * 32)
TICKET = bytes([3] * 32)
SEED = bytes([7] * 32)
SECTOR_ID = 5
POREP_ID = bytes([1] * 32)

GOLDEN_DIR = os.path.join(REPO, "tests", "golden", "seal2k")
WORK_DIR = os.path.join(REPO, ".cache", "seal2k")
H_DIR = os.path.join(REPO, ".cache", "seal2k_h")


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_crs():
    """Generate (or load) the 2KiB SDR Groth16 CRS."""
    from crypto3_fil_proofs_tpu.caches import get_stacked_params
    from crypto3_fil_proofs_tpu.constants import SECTOR_SHAPES
    from crypto3_fil_proofs_tpu.core.compound import CompoundProof
    from crypto3_fil_proofs_tpu.models.porep.stacked.circuit.compound import (
        StackedCompound,
    )
    from crypto3_fil_proofs_tpu.parameters import public_params
    from crypto3_fil_proofs_tpu.types import PoRepConfig

    config = PoRepConfig.for_sector_size(SECTOR_SIZE, POREP_ID)
    pp = public_params(config)
    compound = CompoundProof(StackedCompound(shape=SECTOR_SHAPES[SECTOR_SIZE]))
    t0 = time.time()
    log("CRS: loading or generating (blank synth ~80s + fixed-base device batches)")
    pk = get_stacked_params(config, pp, compound)
    log(f"CRS ready in {time.time() - t0:.0f}s; ic={len(pk.vk.ic)} log_n={pk.log_n}")
    return config, pp, compound, pk


def stage_seal(config):
    from crypto3_fil_proofs_tpu.api import mod as api_mod
    from crypto3_fil_proofs_tpu.api import seal as api_seal
    from crypto3_fil_proofs_tpu.core.fr32 import to_unpadded_bytes

    import shutil

    if os.path.isdir(WORK_DIR):
        shutil.rmtree(WORK_DIR)  # stale staged/cache files break add_piece
    os.makedirs(WORK_DIR, exist_ok=True)
    staged_path = os.path.join(WORK_DIR, "staged")
    sealed_path = os.path.join(WORK_DIR, "sealed")
    cache = os.path.join(WORK_DIR, "cache")

    piece_size = to_unpadded_bytes(SECTOR_SIZE)
    piece = bytes((i * 37 + 11) % 256 for i in range(piece_size))
    info, _ = api_mod.add_piece(piece, staged_path, piece_size, [])
    piece_infos = [info]

    t0 = time.time()
    p1 = api_seal.seal_pre_commit_phase1(
        config, cache, staged_path, sealed_path, PROVER_ID, SECTOR_ID, TICKET,
        piece_infos,
    )
    p2 = api_seal.seal_pre_commit_phase2(config, p1, cache, sealed_path)
    log(f"PC1+PC2 in {time.time() - t0:.1f}s comm_r={p2.comm_r.hex()}")
    t0 = time.time()
    c1 = api_seal.seal_commit_phase1(
        config, cache, sealed_path, PROVER_ID, SECTOR_ID, TICKET, SEED, p2,
        piece_infos,
    )
    log(f"C1 (vanilla proofs) in {time.time() - t0:.1f}s")
    return p2, c1


def stage_h(config, pp, compound, pk, c1):
    """Witness synthesis + QAP h(x) via the device NTTs; persist the
    finalized assignment and h so the MSM stage can run in a FRESH
    process (the v5e worker crashes when the NTT phase's and the MSM
    phase's device state coexist in one client)."""
    import numpy as np

    from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.params import (
        PublicInputs,
        Tau,
    )
    from crypto3_fil_proofs_tpu.zk import groth16
    from crypto3_fil_proofs_tpu.zk.groth16 import (
        _compute_h,
        _ints_to_limbs_fast,
    )

    pub_inputs = PublicInputs(
        replica_id=c1.replica_id,
        seed=c1.seed,
        tau=Tau(comm_d=c1.comm_d, comm_r=c1.comm_r),
        k=None,
    )
    t0 = time.time()
    cs = compound.adapter.circuit_from_vanilla(
        pp, pub_inputs, c1.vanilla_proofs[0], 0
    )
    bad = cs.which_unsatisfied()
    assert bad is None, f"circuit unsatisfied: {bad}"
    expected = compound.adapter.generate_public_inputs(pp, pub_inputs, 0)
    got = [v for v, i in zip(cs.values, cs.is_input) if i][1:]
    assert got == expected, "public-input mismatch"
    log(f"witness circuit synthesized+checked in {time.time() - t0:.0f}s")

    fin = cs.finalize()
    n_in, n_aux, constraints, inputs, aux = fin
    t0 = time.time()
    h = _compute_h(fin, inputs + aux, pk.log_n)
    log(f"h coefficients in {time.time() - t0:.0f}s")
    os.makedirs(H_DIR, exist_ok=True)
    np.save(os.path.join(H_DIR, "inputs.npy"), _ints_to_limbs_fast(inputs))
    np.save(os.path.join(H_DIR, "aux.npy"), _ints_to_limbs_fast(aux))
    np.save(os.path.join(H_DIR, "h.npy"), _ints_to_limbs_fast(h))
    log("assignment + h persisted")


def stage_msms(config, pp, compound, pk, c1):
    """Fresh-process MSM stage: load assignment + h, run the five
    commitments, assemble the 192 B proof, verify_seal."""
    import numpy as np

    from crypto3_fil_proofs_tpu.api import seal as api_seal
    from crypto3_fil_proofs_tpu.zk import groth16
    from crypto3_fil_proofs_tpu.zk.groth16 import _limbs_to_ints

    inputs = _limbs_to_ints(np.load(os.path.join(H_DIR, "inputs.npy")))
    aux = _limbs_to_ints(np.load(os.path.join(H_DIR, "aux.npy")))
    h = _limbs_to_ints(np.load(os.path.join(H_DIR, "h.npy")))
    t0 = time.time()
    # partition k=0 randomness, matching CompoundProof.prove/prove_many
    proof = groth16.prove_from_assignment(
        pk, inputs, aux, h, randomness=b"fil-tpu-prove" + bytes([0])
    )
    log(f"Groth16 commitments+assembly in {time.time() - t0:.0f}s")
    proof_bytes = proof.to_bytes()
    assert len(proof_bytes) == 192 * config.partitions
    t0 = time.time()
    ok = api_seal.verify_seal(
        config, c1.comm_r, c1.comm_d, PROVER_ID, SECTOR_ID, TICKET, SEED,
        proof_bytes,
    )
    assert ok, "verify_seal rejected the proof"
    log(f"verify_seal OK in {time.time() - t0:.0f}s")

    from crypto3_fil_proofs_tpu.types import SealCommitOutput

    return SealCommitOutput(proof=proof_bytes)


def save_artifacts(config, p2, c1, out, pk):
    import shutil

    from crypto3_fil_proofs_tpu.core.parameter_cache import vk_path
    from crypto3_fil_proofs_tpu.models.porep.stacked.circuit.compound import (
        StackedCompound,
    )
    from crypto3_fil_proofs_tpu.constants import SECTOR_SHAPES
    from crypto3_fil_proofs_tpu.parameters import public_params

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, "proof.bin"), "wb") as f:
        f.write(out.proof)
    prefix = StackedCompound(shape=SECTOR_SHAPES[SECTOR_SIZE]).cache_prefix(
        public_params(config)
    )
    shutil.copy(vk_path(prefix), os.path.join(GOLDEN_DIR, "vk.npz"))
    with open(os.path.join(GOLDEN_DIR, "inputs.json"), "w") as f:
        json.dump(
            {
                "sector_size": SECTOR_SIZE,
                "prover_id": PROVER_ID.hex(),
                "sector_id": SECTOR_ID,
                "ticket": TICKET.hex(),
                "seed": SEED.hex(),
                "porep_id": POREP_ID.hex(),
                "comm_r": c1.comm_r.hex(),
                "comm_d": c1.comm_d.hex(),
                "replica_id": c1.replica_id.hex(),
                "proof_len": len(out.proof),
            },
            f,
            indent=2,
        )
    log(f"artifacts saved to {GOLDEN_DIR}")


def main():
    stage = sys.argv[sys.argv.index("--stage") + 1] if "--stage" in sys.argv else "all"
    t_start = time.time()
    if stage == "all":
        # orchestrate the two device phases as separate processes (fresh
        # TPU client each); both re-derive the deterministic seal state
        import subprocess

        for sub in ("h", "msms"):
            rc = subprocess.call(
                [sys.executable, "-u", os.path.abspath(__file__), "--stage", sub]
            )
            assert rc == 0, f"stage {sub} failed"
        log(f"TOTAL {time.time() - t_start:.0f}s")
        return
    config, pp, compound, pk = stage_crs()
    if stage == "crs":
        return
    p2, c1 = stage_seal(config)
    if stage == "seal":
        return
    if stage == "h":
        stage_h(config, pp, compound, pk, c1)
        return
    out = stage_msms(config, pp, compound, pk, c1)
    save_artifacts(config, p2, c1, out, pk)
    log(f"stage msms done in {time.time() - t_start:.0f}s — proof verifies, {len(out.proof)} bytes")


if __name__ == "__main__":
    main()
