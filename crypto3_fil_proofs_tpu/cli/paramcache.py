"""paramcache: pre-generate Groth16 params + vks for registered circuits.

Re-implements reference bin/paramcache/src/main.cpp (224 LoC):
`cache_porep_params` (:27-52), `cache_winning_post_params` (:55-86),
`cache_window_post_params` (:88-113); flags `--only-post`,
`--params-for-sector-sizes`.

Usage: python -m crypto3_fil_proofs_tpu.cli.paramcache \
           --params-for-sector-sizes 2048 [--only-post]
"""
from __future__ import annotations

import argparse
import sys

from ..constants import SECTOR_SHAPES, SUPPORTED_SECTOR_SIZES
from ..core.compound import CompoundProof
from ..models.porep.stacked.circuit.compound import StackedCompound
from ..models.post.fallback.compound import FallbackPoStCompound
from ..parameters import (
    public_params,
    window_post_public_params,
    winning_post_public_params,
)
from ..types import PoRepConfig, PoStConfig


def cache_porep_params(sector_size: int) -> None:
    config = PoRepConfig.for_sector_size(sector_size)
    pp = public_params(config)
    compound = CompoundProof(StackedCompound(shape=SECTOR_SHAPES[sector_size]))
    print(f"generating PoRep params for {sector_size} bytes...", flush=True)
    pk = compound.get_params(pp)
    print(f"  done ({pk.log_n=} domain)")


def cache_winning_post_params(sector_size: int) -> None:
    config = PoStConfig.winning(sector_size)
    pp = winning_post_public_params(config)
    compound = CompoundProof(FallbackPoStCompound(shape=SECTOR_SHAPES[sector_size]))
    print(f"generating Winning PoSt params for {sector_size} bytes...", flush=True)
    compound.get_params(pp)
    print("  done")


def cache_window_post_params(sector_size: int) -> None:
    config = PoStConfig.window(sector_size)
    pp = window_post_public_params(config)
    compound = CompoundProof(FallbackPoStCompound(shape=SECTOR_SHAPES[sector_size]))
    print(f"generating Window PoSt params for {sector_size} bytes...", flush=True)
    compound.get_params(pp)
    print("  done")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="paramcache",
        description="Generate and cache Groth16 parameters "
        "(reference bin/paramcache)",
    )
    ap.add_argument(
        "--params-for-sector-sizes",
        type=lambda s: [int(x) for x in s.split(",")],
        default=SUPPORTED_SECTOR_SIZES,
        help="comma-separated sector sizes in bytes",
    )
    ap.add_argument(
        "--only-post", action="store_true", help="skip PoRep parameters"
    )
    args = ap.parse_args(argv)

    for size in args.params_for_sector_sizes:
        if size not in SUPPORTED_SECTOR_SIZES:
            print(f"unsupported sector size {size}", file=sys.stderr)
            return 1
        cache_winning_post_params(size)
        cache_window_post_params(size)
        if not args.only_post:
            cache_porep_params(size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
