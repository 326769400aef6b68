"""Time the MSM pipeline stages separately on the TPU.

Breakdown target (VERDICT r3 #3): where do the non-gather seconds go at
2^24 — digit reslice + argsort/searchsorted scheduling setup, the rank
passes themselves (gather + madd), or the aggregation scans?

Usage: python scripts/probe_msm_stages.py [logn] [c_bits]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crypto3_fil_proofs_tpu.ops import msm as msm_mod
from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.msm import _reslice_digits
from crypto3_fil_proofs_tpu.ops.pallas import msm as pmsm

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 24
C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = 1 << LOGN
B = 1 << C


def timed(name, fn, *args, iters=2):
    out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch_sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt:8.2f} s", flush=True)
    return out, dt


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def schedule_stage(scalars, n_buckets):
    """digits + argsort + searchsorted + perm: everything before the
    rank passes, reduced to small outputs."""
    digits = _reslice_digits(scalars, n_buckets).astype(jnp.uint32)
    W, n = digits.shape
    order = jnp.argsort(digits, axis=1)
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)
    bucket_ids = jnp.arange(n_buckets, dtype=jnp.uint32)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)
    ends = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="right")
    )(sorted_digits).astype(jnp.int32)
    counts = ends - starts
    counts_f = counts.reshape(W * n_buckets)
    perm = jnp.argsort(-counts_f)
    return order.sum() + perm.sum() + starts.sum()


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def accumulate_stage(px, py, scalars, n_buckets):
    digits = _reslice_digits(scalars, n_buckets).astype(jnp.uint32)
    acc = pmsm._bucket_accumulate_soa(pmsm._G1Ops, (px, py), digits, n_buckets)
    return jax.tree_util.tree_map(lambda t: t.sum(), acc)


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def aggregate_only(acc, n_buckets):
    W = 256 // C if C * (256 // C) >= 256 else 256 // C + 1
    W = -(-255 // C)
    return jax.tree_util.tree_map(
        lambda t: t.sum(),
        pmsm._aggregate_split(pmsm._G1Ops, acc, W, n_buckets),
    )


def main():
    print(f"logn={LOGN} c={C}")
    points, scalars = msm_mod.random_bench_input(N, seed=0)
    # keep everything on device: np.asarray here would pull 3.2GB back
    # through the tunnel and re-push it
    px, py = (jnp.asarray(t).T for t in points)

    timed("schedule (sort/counts)", schedule_stage, scalars, B)
    timed(
        "full stages",
        lambda s: pmsm.msm_pallas_stages(px, py, s, n_buckets=B),
        scalars,
        iters=1,
    )


if __name__ == "__main__":
    main()
