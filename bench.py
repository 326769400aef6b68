"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline: Pippenger G1 MSM points/sec (BASELINE.json north-star). The
MSM attempt runs in a budgeted subprocess (first-time XLA compiles of
the limb kernels can take many minutes); if it does not complete in
time the batched Poseidon tree-hash metric (the tree_c/tree_r_last
builder, reference stacked/vanilla/proof.hpp:385-646) is reported
instead, so the driver always receives a metric line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

MSM_BUDGET_S = int(os.environ.get("FIL_PROOFS_BENCH_MSM_BUDGET", "2400"))


def _bench_poseidon():
    import jax

    from crypto3_fil_proofs_tpu.ops.fr_limbs import FR
    from crypto3_fil_proofs_tpu.ops.poseidon import poseidon_hash
    from crypto3_fil_proofs_tpu.ops.poseidon_jax import hash_level_mont

    batch = 1 << 15  # 32768 oct hashes per launch
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 16, size=(batch * 8, FR.n), dtype=np.uint32)
    nodes = jax.numpy.asarray(raw)

    fn = jax.jit(lambda x: hash_level_mont(x, 8))
    fn(nodes).block_until_ready()  # compile
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        out = fn(nodes)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    tpu_rate = batch / dt

    # host reference rate from a small sample
    sample = 8
    ints = [
        [int(v) for v in row]
        for row in rng.integers(0, 1 << 30, size=(sample, 8))
    ]
    t0 = time.perf_counter()
    for row in ints:
        poseidon_hash(row, 8)
    host_rate = sample / (time.perf_counter() - t0)

    return {
        "metric": "poseidon8_tree_hashes_per_sec",
        "value": round(tpu_rate, 1),
        "unit": "hashes/s",
        "vs_baseline": round(tpu_rate / host_rate, 2),
    }


def _bench_msm():
    import jax

    from crypto3_fil_proofs_tpu.ops import msm as msm_mod

    n = 1 << 18
    n_buckets = 256  # c=8: bucket aggregation amortizes at this size
    points, scalars = msm_mod.random_bench_input(n, seed=0)
    fn = msm_mod.msm_device  # stages are individually jitted
    jax.block_until_ready(fn(points, scalars, n_buckets=n_buckets))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = fn(points, scalars, n_buckets=n_buckets)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = n / dt
    # baseline: single-core host python-int MSM, measured on a subsample
    host_rate = msm_mod.host_reference_rate(points, scalars, sample=64)
    return {
        "metric": "msm_g1_points_per_sec",
        "value": round(rate, 1),
        "unit": "points/s",
        "vs_baseline": round(rate / host_rate, 2),
    }


def main():
    if "--msm-inner" in sys.argv:
        print(json.dumps(_bench_msm()))
        return
    try:
        out = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--msm-inner"],
            capture_output=True,
            text=True,
            timeout=MSM_BUDGET_S,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line)
                return
    except (subprocess.TimeoutExpired, OSError):
        pass
    print(json.dumps(_bench_poseidon()))


if __name__ == "__main__":
    main()
