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


def stage_prove(config, c1):
    from crypto3_fil_proofs_tpu.api import seal as api_seal

    t0 = time.time()
    out = api_seal.seal_commit_phase2(config, c1, PROVER_ID, SECTOR_ID)
    log(f"C2 (witness synth + Groth16 prove + verify_seal) in {time.time() - t0:.0f}s")
    assert len(out.proof) == 192 * config.partitions
    return out


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
    config, pp, compound, pk = stage_crs()
    if stage == "crs":
        return
    p2, c1 = stage_seal(config)
    if stage == "seal":
        return
    out = stage_prove(config, c1)
    save_artifacts(config, p2, c1, out, pk)
    log(f"TOTAL {time.time() - t_start:.0f}s — proof verifies, {len(out.proof)} bytes")


if __name__ == "__main__":
    main()
