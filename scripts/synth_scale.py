"""Production-scale circuit synthesis benchmark (VERDICT r3 missing #4).

Synthesizes ONE full window-PoSt partition circuit at the 32GiB
production class — reference count 125,279,217 constraints/partition
(reference libs/filecoin/include/nil/filecoin/proofs/constants.hpp:85-88:
2349 sectors/partition x 10 challenges over (8,8,2) LC trees) — through
the template-tiled emitters (zk/gadgets/tiled.py), and reports
wall-clock, constraints/s, and peak RSS.

Blank mode (default) skips witness computation — the CRS/counting path;
--witness also computes the vectorized witness replay for a smaller
sector count to report the witness-bearing rate.

Run: python scripts/synth_scale.py [--sectors 2349] [--witness]
"""
from __future__ import annotations

import argparse
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sectors", type=int, default=2349)
    ap.add_argument("--challenges", type=int, default=10)
    ap.add_argument("--witness", action="store_true")
    args = ap.parse_args()

    from crypto3_fil_proofs_tpu.models.post.fallback import circuit as fc
    from crypto3_fil_proofs_tpu.models.post.fallback.compound import (
        blank_partition_proof,
    )
    from crypto3_fil_proofs_tpu.models.post.fallback.vanilla import (
        PublicInputs,
        PublicParams,
        PublicSector,
    )

    pp = PublicParams(
        sector_size=32 * 2**30,
        challenge_count=args.challenges,
        sector_count=args.sectors,
    )
    shape = (8, 8, 2)
    proof = blank_partition_proof(pp, shape)
    blank_inputs = PublicInputs(
        randomness=b"\x00" * 32,
        prover_id=b"\x00" * 32,
        sectors=[PublicSector(id=0, comm_r=b"\x00" * 32)] * pp.sector_count,
    )
    t0 = time.time()
    cs = fc.circuit_from_vanilla(pp, blank_inputs, proof, 0, blank=True)
    dt = time.time() - t0
    n = cs.num_constraints
    print(
        f"blank window-PoSt partition: {args.sectors} sectors x "
        f"{args.challenges} challenges -> {n:,} constraints in {dt:.1f}s "
        f"= {n/dt/1e6:.2f}M c/s; peak RSS {rss_gb():.1f} GiB "
        f"(reference partition: 125,279,217 constraints, constants.hpp:85-88)"
    )
    if args.witness:
        del cs
        t0 = time.time()
        cs = fc.circuit_from_vanilla(pp, blank_inputs, proof, 0, blank=False)
        dt = time.time() - t0
        bad = cs.which_unsatisfied()
        print(
            f"witness-bearing: {cs.num_constraints/dt/1e6:.2f}M c/s "
            f"({dt:.1f}s); satisfied={bad is None} "
            f"(blank data -> satisfaction not expected; structural only)"
        )


if __name__ == "__main__":
    main()
