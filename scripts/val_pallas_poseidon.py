"""Validate + bench the Pallas Poseidon permutation on the live chip.

Bit-exactness: hash_level_packed vs the host permutation
(ops/poseidon.poseidon_hash) at arities 2/8/11 over random Fr inputs.
Throughput: poseidon-8 hashes/s at large batch with a hard device sync
(ops/devsync.fetch_sync) and fresh buffers each iteration.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.fr_limbs import FR, fr_ops
from crypto3_fil_proofs_tpu.ops.pallas.poseidon import (
    POS_BLOCK,
    hash_level_packed,
)
from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash

rng = np.random.default_rng(7)


def rand_fr(n):
    return [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63)) % FR.modulus for _ in range(n)]


def to_mont_packed(vals):
    return fr_ops.to_mont(jnp.asarray(FR.to_limbs(vals)))


def from_mont_ints(limbs):
    return FR.from_limbs(np.asarray(fr_ops.from_mont(limbs)))


def validate(arity: int, groups: int = 40, kernel: str = "vpu") -> None:
    vals = rand_fr(arity * groups)
    nodes = to_mont_packed(vals)
    out = hash_level_packed(nodes, arity, kernel=kernel)
    got = from_mont_ints(out)
    want = [
        poseidon_hash(vals[i : i + arity], arity)
        for i in range(0, len(vals), arity)
    ]
    bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert not bad, f"arity {arity} [{kernel}]: {len(bad)}/{groups} mismatches, first {bad[:3]}"
    print(f"arity {arity} [{kernel}]: bit-exact over {groups} hashes")


def bench(arity: int, batch: int, iters: int = 5, kernel: str = "vpu") -> float:
    n = batch * arity
    pads = (-batch) % POS_BLOCK
    print(f"bench arity={arity} batch={batch} kernel={kernel} (pad {pads})")
    bufs = [
        jnp.asarray(
            rng.integers(0, 1 << 16, size=(n, FR.n), dtype=np.uint32)
        )
        for _ in range(3)
    ]
    # warm compile
    fetch_sync(hash_level_packed(bufs[0], arity, kernel=kernel))
    best = 1e30
    for i in range(iters):
        b = bufs[i % len(bufs)]
        t0 = time.perf_counter()
        fetch_sync(hash_level_packed(b, arity, kernel=kernel))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"  iter {i}: {dt*1e3:.1f} ms  {batch/dt/1e6:.3f} M hashes/s")
    print(f"best: {batch/best/1e6:.3f} M hashes/s")
    return batch / best


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="both", choices=["vpu", "mxu", "both"])
    ap.add_argument("--bench-only", action="store_true")
    args = ap.parse_args()
    kernels = ["vpu", "mxu"] if args.kernel == "both" else [args.kernel]
    print(jax.devices())
    for k in kernels:
        if not args.bench_only:
            for a in (2, 8, 11):
                validate(a, kernel=k)
        bench(8, 1 << 17, kernel=k)
        bench(11, 1 << 17, kernel=k)
        bench(8, 1 << 20, kernel=k)
        bench(2, 1 << 20, kernel=k)
