"""Probe: bucket-fill gather throughput by point-table layout (TPU).

The Pallas MSM is gather-bound (PLAN.md): each rank pass gathers one
affine point per live bucket lane. This probe times the same gather
volume under different table layouts to find the descriptor-cheapest
formulation:

  planes : px[:, idx] + py[:, idx] on [24, N] SoA planes (current MSM)
  rows48 : pts[idx] on [N, 48] row-major (x||y per row, one take)
  rows64 : pts[idx] on [N, 64] row-major (256 B power-of-two stride)
  rows48T: pts[idx] on [N, 48] + transpose back to 2x[24, P] (what the
           kernels would actually consume)

Usage: python scripts/probe_gather.py [log_table] [log_rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 22
LOG_R = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N, Rows = 1 << LOG_N, 1 << LOG_R

rng = np.random.default_rng(0)
planes_x = jnp.asarray(rng.integers(0, 1 << 32, size=(24, N), dtype=np.uint32))
planes_y = jnp.asarray(rng.integers(0, 1 << 32, size=(24, N), dtype=np.uint32))
rows48 = jnp.asarray(rng.integers(0, 1 << 32, size=(N, 48), dtype=np.uint32))
rows64 = jnp.asarray(rng.integers(0, 1 << 32, size=(N, 64), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, N, size=Rows, dtype=np.int32))


@jax.jit
def g_planes(ix):
    return planes_x[:, ix], planes_y[:, ix]


@jax.jit
def g_rows48(ix):
    return rows48[ix]


@jax.jit
def g_rows64(ix):
    return rows64[ix]


@jax.jit
def g_rows48t(ix):
    r = rows48[ix]  # [P, 48]
    return r[:, :24].T, r[:, 24:].T  # 2x [24, P] kernel layout


def bench(name, fn, bytes_per_row):
    fetch_sync(fn(idx))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        fetch_sync(fn(idx.at[0].set(i)))
    dt = (time.perf_counter() - t0) / iters
    rate = Rows / dt
    print(
        f"{name:8s} {rate/1e6:8.2f} M rows/s   "
        f"{rate*bytes_per_row/1e9:7.2f} GB/s   {dt*1e3:8.1f} ms"
    )
    return rate


print(f"table 2^{LOG_N}, gather 2^{LOG_R} random rows, "
      f"backend={jax.default_backend()}")
bench("planes", g_planes, 192)
bench("rows48", g_rows48, 192)
bench("rows64", g_rows64, 256)
bench("rows48T", g_rows48t, 192)
