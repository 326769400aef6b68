"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline progression (best-available wins):
1. Pippenger G1 MSM points/sec (BASELINE.json north-star metric) once
   ops/msm.py exists.
2. Otherwise: batched Poseidon arity-8 tree-hash throughput (the
   tree_c/tree_r_last builder kernel), vs the host reference backend —
   the reference's own hot path for replication commitments
   (reference: stacked/vanilla/proof.hpp:385-646 GPU/CPU builders).
"""
from __future__ import annotations

import json
import time

import numpy as np


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
    ints = [[int(v) for v in row] for row in rng.integers(0, 1 << 30, size=(sample, 8))]
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

    n = 1 << 16
    points, scalars = msm_mod.random_bench_input(n, seed=0)
    fn = jax.jit(msm_mod.msm_device)
    fn(points, scalars)  # compile + run
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = fn(points, scalars)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = n / dt
    # baseline: single-core host python-int MSM, measured on a subsample
    host_rate = msm_mod.host_reference_rate(points, scalars, sample=256)
    return {
        "metric": "msm_g1_points_per_sec",
        "value": round(rate, 1),
        "unit": "points/s",
        "vs_baseline": round(rate / host_rate, 2),
    }


def main():
    try:
        from crypto3_fil_proofs_tpu.ops import msm  # noqa: F401

        result = _bench_msm()
    except ImportError:
        result = _bench_poseidon()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
