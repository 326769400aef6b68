"""Probe the MSM levers identified in VERDICT r3 missing-gap #3.

The r3 kernel sits at 64% of its own gather roofline at c=16. Candidate
levers, measured in isolation before committing to a kernel rewrite:

  1. fused-plane gather: today _G1Ops.gather issues TWO takes
     (px[:, idx], py[:, idx]) per pass. If the gather is
     descriptor-rate-bound (~140ns/row, width-independent — r2 probe),
     one take over a fused [48, N] plane should halve descriptor count.
  2. row-major [N, 48] gather (96B contiguous rows) vs SoA [48, N]
     column gather, with and without the transpose back to SoA.
  3. digit reslice cost at generalized window c (c=20 -> W=13 cuts the
     minimum gathered rows 19% vs c=16).

All tensors are built ON DEVICE (one small transfer) — the first
version of this probe moved ~2.4GB through the tunnel and never got to
the timers. Run on the TPU (never concurrently with another tunnel
job):  python scripts/probe_msm_levers.py [--logn 22]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync

    fetch_sync(x)


def bench(fn, *args, iters=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=22)
    args = ap.parse_args()
    N = 1 << args.logn
    G = 1 << 20  # rows gathered per probe call
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=G, dtype=np.int32))

    # build the tables on device from a tiny seed block (tile + iota mix)
    seed = jnp.asarray(
        rng.integers(0, 1 << 16, size=(48, 1024), dtype=np.uint32)
    )

    @jax.jit
    def make_tables(s):
        fused = jnp.tile(s, (1, N // 1024)) ^ jnp.arange(
            N, dtype=jnp.uint32
        )[None, :]
        # slice INSIDE the jit: eager __getitem__ over the axon tunnel
        # pulls the whole source buffer host-side (hung the r4 probe)
        return fused, fused.T, fused[:24], fused[24:]

    fused, rowm, soa, soa2 = make_tables(seed)
    sync(jax.jit(lambda t: t.sum())(fused))  # scalar barrier, no big pull
    print("tables built", flush=True)

    # tables are ARGUMENTS, not closures: a jit-closure over a device
    # array embeds it as an HLO constant, and the axon tunnel ships the
    # whole 800MB literal at compile time (hung two probe attempts)
    two_takes = jax.jit(lambda a, b, i: a[:, i].sum() + b[:, i].sum())
    one_take = jax.jit(lambda a, i: a[:, i].sum())
    row_take = jax.jit(lambda a, i: a[i, :].sum())
    row_take_t = jax.jit(
        lambda a, i: a[i, :].T.reshape(2, 24, -1).sum()
    )

    for name, fn, args in [
        ("two SoA takes (current)", two_takes, (soa, soa2, idx)),
        ("one fused [48,N] take", one_take, (fused, idx)),
        ("row-major [N,48] take", row_take, (rowm, idx)),
        ("row-major take + transpose to SoA", row_take_t, (rowm, idx)),
    ]:
        dt = bench(fn, *args)
        print(
            f"{name:40s} {G/dt/1e6:8.2f} M point-rows/s  ({dt*1e3:.1f} ms)",
            flush=True,
        )

    from crypto3_fil_proofs_tpu.ops.msm import _reslice_digits

    scalars = jnp.asarray(
        rng.integers(0, 1 << 16, size=(N, 16), dtype=np.uint32)
    )
    for c in (16, 20, 21):
        f = jax.jit(lambda s, c=c: _reslice_digits(s, 1 << c).sum())
        dt = bench(f, scalars)
        print(f"reslice c={c:2d}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
