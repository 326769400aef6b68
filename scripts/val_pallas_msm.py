"""Validate the Pallas MSM (count-sorted prefix scheduling) on TPU.

Checks G1 and G2 against the host naive MSM at several sizes and digit
distributions (uniform mod-r, all-zero, bit-heavy, single dense
bucket), then reports rates at bench sizes.

Usage: python scripts/val_pallas_msm.py [--big]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from crypto3_fil_proofs_tpu.ops import g1_jax, g2_jax, msm as msm_mod
from crypto3_fil_proofs_tpu.ops.bls12_381 import (
    G1_GEN,
    G2_GEN_X,
    G2_GEN_Y,
    R,
    g1_eq,
    g1_from_affine,
    g1_mul,
    g1_msm_naive,
    g2_add,
    g2_eq,
    g2_from_affine,
    g2_mul,
)


def g2_msm_naive(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        term = g2_mul(p, s)
        acc = term if acc is None else g2_add(acc, term)
    return acc
from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.pallas.msm import (
    msm_pallas,
    msm_pallas_g2,
    msm_pallas_stages,
)

assert jax.default_backend() != "cpu", "needs a TPU"


def check_g1(n, scalars, n_buckets, label, signed=False):
    rng = random.Random(7)
    base = g1_from_affine(G1_GEN)
    pts = [g1_mul(base, rng.randrange(1, R)) for _ in range(min(n, 256))]
    pts = (pts * ((n + len(pts) - 1) // len(pts)))[:n]
    px, py, _ = g1_jax.points_to_device(pts)
    sc = np.asarray(msm_mod.scalars_to_device(scalars))
    got = msm_pallas(
        (np.asarray(px), np.asarray(py)), sc, n_buckets=n_buckets,
        signed=signed,
    )
    want = g1_msm_naive(pts, scalars)
    ok = g1_eq(got, want)
    tag = "s" if signed else " "
    print(f"g1 {label:24s} n={n:6d} c={n_buckets.bit_length()-1:2d}{tag}"
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def check_g2(n, scalars, n_buckets, label):
    rng = random.Random(8)
    base = g2_from_affine((G2_GEN_X, G2_GEN_Y))
    pts = [g2_mul(base, rng.randrange(1, R)) for _ in range(min(n, 64))]
    pts = (pts * ((n + len(pts) - 1) // len(pts)))[:n]
    aff, _ = g2_jax.points_to_device(pts)
    sc = np.asarray(msm_mod.scalars_to_device(scalars))
    got = msm_pallas_g2(aff, sc, n_buckets=n_buckets)
    want = g2_msm_naive(pts, scalars)
    ok = g2_eq(got, want)
    print(f"g2 {label:24s} n={n:6d} c={n_buckets.bit_length()-1:2d} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    rng = random.Random(0x5EED)
    all_ok = True

    n = 4096
    uniform = [rng.randrange(R) for _ in range(n)]
    all_ok &= check_g1(n, uniform, 256, "uniform mod-r")
    zeros = [0] * n
    zeros[0], zeros[1], zeros[5] = 1, R - 1, (1 << 255) % R
    all_ok &= check_g1(n, zeros, 256, "zero/edge")
    bits = [rng.randrange(2) for _ in range(n)]
    all_ok &= check_g1(n, bits, 256, "bit-heavy (degenerate)")
    dense = [(5 << 16) | 5] * n  # every point in the same two buckets
    all_ok &= check_g1(n, dense, 256, "single dense bucket")

    m = 2048
    uniform2 = [rng.randrange(R) for _ in range(m)]
    all_ok &= check_g2(m, uniform2, 256, "uniform mod-r")

    # split (hi/lo) aggregation path: engaged at n_buckets >= 2^12
    all_ok &= check_g1(n, uniform, 1 << 16, "uniform split-agg")
    all_ok &= check_g1(n, zeros, 1 << 16, "zero/edge split-agg")
    all_ok &= check_g1(n, dense, 1 << 16, "dense split-agg")
    all_ok &= check_g2(m, uniform2, 1 << 16, "uniform split-agg")

    # signed-digit recode (c must satisfy c*W >= 256): exercises the
    # sentinel lanes, the bit-31 sign channel, y-negation, and the
    # (lane+1)-weight aggregation
    all_ok &= check_g1(n, uniform, 1 << 8, "uniform signed", signed=True)
    all_ok &= check_g1(n, zeros, 1 << 8, "zero/edge signed", signed=True)
    all_ok &= check_g1(n, dense, 1 << 8, "dense signed", signed=True)
    all_ok &= check_g1(n, uniform, 1 << 16, "uniform signed split", signed=True)

    if "--anyc" in sys.argv:
        # non-byte-aligned windows (odd split: Bhi != Blo at c=21).
        # NOTE: c=20 allocates 13 windows x 2^20 bucket lanes (~4 GB of
        # Jacobian accumulators + transients) — RESOURCE_EXHAUSTED on a
        # 16 GB v5e alongside the points; and at low bucket occupancy
        # the count-staircase overshoot cancels the 16->13 window win,
        # so production stays at c=16 (PLAN.md MSM endgame analysis).
        all_ok &= check_g1(n, uniform, 1 << 20, "uniform c=20")
        all_ok &= check_g1(n, uniform, 1 << 21, "uniform c=21")

    if "--big" in sys.argv:
        for logn in (22, 24):
            n = 1 << logn
            points, scalars = msm_mod.random_bench_input(n, seed=0)
            px, py = (jnp.asarray(t).T for t in points)
            fn = lambda s: msm_pallas_stages(px, py, s, n_buckets=1 << 16)
            fetch_sync(fn(scalars))
            t0 = time.perf_counter()
            iters = 2 if logn <= 22 else 1
            for i in range(iters):
                fetch_sync(fn(scalars.at[0, 0].set(i)))
            dt = (time.perf_counter() - t0) / iters
            print(f"g1 2^{logn} mod-r: {n/dt/1e3:.1f}k pts/s "
                  f"({dt:.1f}s)", flush=True)

    print("ALL OK" if all_ok else "FAILURES", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
