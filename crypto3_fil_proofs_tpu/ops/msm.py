"""Pippenger multi-scalar multiplication on TPU (G1, BLS12-381).

The dominating Groth16 prover cost in the reference — the a/b/c/h
commitments computed by the consumed crypto3-zk `r1cs_gg_ppzsnark`
prover (reference: SURVEY.md §2.9 P5; core/proof/compound_proof.hpp
`prove` drives it) — rebuilt TPU-first:

- Window size c = 16 bits aligns windows exactly with the 16-bit limb
  lanes of ops/fr_limbs (digit extraction is just picking a limb).
- Per window, points are sorted by digit on-device; bucket sums are
  accumulated with one batched mixed-add per "rank" pass: pass s adds
  the s-th point of EVERY bucket simultaneously (2^c lanes wide),
  masked where a bucket is exhausted. Expected passes ≈ N/2^c + tail,
  so total work ≈ W*(N + 2*2^c) adds — the Pippenger optimum — while
  every add is a full-width vector op (the shape the VPU wants).
- Bucket aggregation uses sum_b b*S_b = sum_k suffix_k: a Hillis-Steele
  suffix scan (log2(2^c) batched passes) + a halving tree reduce.
- Window combination is a 16-doubling Horner fold over window totals.
- Multi-chip: shard points across devices (`shard_map` over a "points"
  axis), each device runs bucket accumulation on its shard, per-window
  partial bucket-free totals are combined with a Jacobian-add psum-style
  tree (all_gather + local fold) — see msm_sharded.

Bit-exact vs ops/bls12_381.g1_msm_naive.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import g1_jax as g1
from .bls12_381 import G1_GEN, R, g1_add, g1_from_affine, g1_mul, G1_INF
from .fr_limbs import FQ, FR, fq_ops

C_BITS = 16  # window size; 255-bit scalars -> 16 windows of 16 bits
N_WINDOWS = 16


def _bucket_accumulate(px, py, digits, n_buckets):
    """Bucket sums for one window set, vectorized over windows.

    px, py: [N, 24] affine Montgomery coordinates.
    digits: [W, N] uint32 bucket index per point per window (0 = skip).
    Returns Jacobian bucket sums ([W, B, 24] x3) for buckets 1..B-1
    (index 0 unused).
    """
    W = digits.shape[0]
    N = digits.shape[1]

    # sort each window's point indices by digit
    order = jnp.argsort(digits, axis=1)  # [W, N]
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)

    # start offset of each bucket in the sorted order: searchsorted per window
    bucket_ids = jnp.arange(n_buckets, dtype=jnp.uint32)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)  # [W, B]
    ends = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="right")
    )(sorted_digits).astype(jnp.int32)
    counts = ends - starts  # [W, B]
    max_count = jnp.max(jnp.where(bucket_ids[None, :] == 0, 0, counts))

    acc = g1.infinity((W, n_buckets))

    def body(state):
        s, acc = state
        idx = starts + s  # [W, B]
        valid = (s < counts) & (bucket_ids[None, :] != 0)
        idx = jnp.clip(idx, 0, N - 1)
        point_idx = jnp.take_along_axis(order, idx.reshape(W, -1), axis=1)
        qx = px[point_idx]  # [W, B, 24]
        qy = py[point_idx]
        acc = g1.add_mixed(acc, (qx, qy), valid)
        return s + 1, acc

    def cond(state):
        s, _ = state
        return s < max_count

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


def _aggregate_buckets(acc):
    """sum_b b * S_b per window via suffix scan + prefix reduce.

    Uses the identity sum_b b*S_b = sum_{k>=1} (sum_{b>=k} S_b): a
    Hillis-Steele suffix scan (log2 B passes) followed by a prefix scan
    whose last element is the total. Both loops have a single traced
    body (dynamic shift via fori_loop) so compile time stays bounded.

    acc: Jacobian [W, B, 24] x3 (bucket 0 ignored/infinity).
    Returns Jacobian [W, 24] x3 window totals.
    """
    X, Y, Z = acc
    B = X.shape[1]
    log_b = B.bit_length() - 1
    assert 1 << log_b == B, "bucket count must be a power of two"
    pos = jnp.arange(B)

    def suffix_pass(i, state):
        X, Y, Z = state
        d = jnp.int32(1) << i
        sx = jnp.roll(X, -d, axis=1)
        sy = jnp.roll(Y, -d, axis=1)
        sz = jnp.roll(Z, -d, axis=1)
        in_range = (pos + d < B)[None, :, None]
        sz = jnp.where(in_range, sz, 0)  # out-of-range partner -> infinity
        return g1.add((X, Y, Z), (sx, sy, sz))

    X, Y, Z = jax.lax.fori_loop(0, log_b, suffix_pass, (X, Y, Z))
    # drop k=0 (suffix_0 would double-count), then prefix-scan leftward;
    # the last element accumulates sum_{k>=1} suffix_k.
    Z = jnp.where((pos >= 1)[None, :, None], Z, 0)

    def prefix_pass(i, state):
        X, Y, Z = state
        d = jnp.int32(1) << i
        sx = jnp.roll(X, d, axis=1)
        sy = jnp.roll(Y, d, axis=1)
        sz = jnp.roll(Z, d, axis=1)
        in_range = (pos - d >= 0)[None, :, None]
        sz = jnp.where(in_range, sz, 0)
        return g1.add((X, Y, Z), (sx, sy, sz))

    X, Y, Z = jax.lax.fori_loop(0, log_b, prefix_pass, (X, Y, Z))
    return X[:, B - 1], Y[:, B - 1], Z[:, B - 1]


def _combine_windows(totals, c: int = C_BITS):
    """Horner fold: result = sum_w 2^(c*w) T_w, windows ascending."""
    X, Y, Z = totals  # [W, 24]
    W = X.shape[0]

    def step(w, res):
        res = jax.lax.fori_loop(0, c, lambda _, r: g1.double(r), res)
        idx = W - 1 - w
        nxt = (
            jnp.take(X, idx, axis=0)[None],
            jnp.take(Y, idx, axis=0)[None],
            jnp.take(Z, idx, axis=0)[None],
        )
        return g1.add(res, nxt)

    res = (X[W - 1 : W], Y[W - 1 : W], Z[W - 1 : W])
    res = jax.lax.fori_loop(1, W, step, res)
    return res[0][0], res[1][0], res[2][0]


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def msm_device(points, scalars, n_buckets: int = 1 << C_BITS):
    """MSM over affine Montgomery points and 16-bit-limb scalars.

    points: (px[N, 24], py[N, 24]) affine Montgomery form.
    scalars: [N, 16] uint32 (16-bit limbs, standard — NOT Montgomery — form).
    Returns one Jacobian point ([24] x3, Montgomery form).
    """
    px, py = points
    digits = scalars.T  # [16, N]: window w digit = limb w — c=16 alignment
    if n_buckets != 1 << C_BITS:
        # reduced bucket count (tests): re-slice digits into smaller windows
        digits = _reslice_digits(scalars, n_buckets)
    acc = _bucket_accumulate(px, py, digits.astype(jnp.uint32), n_buckets)
    totals = _aggregate_buckets(acc)
    return _combine_windows(totals, int(n_buckets).bit_length() - 1)


def _reslice_digits(scalars, n_buckets):
    """Extract c-bit windows for c < 16 (test path; c must divide 16)."""
    c = int(n_buckets).bit_length() - 1
    assert 16 % c == 0
    per_limb = 16 // c
    mask = jnp.uint32(n_buckets - 1)
    parts = []
    for limb in range(scalars.shape[1]):
        for k in range(per_limb):
            parts.append((scalars[:, limb] >> (c * k)) & mask)
    return jnp.stack(parts)  # [W, N] ascending windows


# ---------------------------------------------------------------------------
# Host-facing API
# ---------------------------------------------------------------------------


def scalars_to_device(scalars) -> jnp.ndarray:
    """Python ints -> [N, 16] uint32 16-bit-limb array (plain form)."""
    return jnp.asarray(FR.to_limbs([s % R for s in scalars]))


def msm(points, scalars, n_buckets: int = 1 << C_BITS):
    """Host API: list of host points + int scalars -> host Jacobian point."""
    px, py, _ = g1.points_to_device(points)
    s = scalars_to_device(scalars)
    X, Y, Z = msm_device((px, py), s, n_buckets=n_buckets)
    return g1.points_from_device((X[None], Y[None], Z[None]))[0]


# ---------------------------------------------------------------------------
# Bench helpers (bench.py)
# ---------------------------------------------------------------------------


def random_bench_input(n: int, seed: int = 0, distinct: int = 1024):
    """n pseudo-random points (tiled from `distinct` true random points)
    + n uniform random scalars, as device arrays.

    Tiling keeps host-side point generation cheap; MSM cost is
    data-independent (digit distribution comes from the scalars).
    """
    rng = np.random.default_rng(seed)
    base = g1_from_affine(G1_GEN)
    pts = []
    p = base
    for _ in range(distinct):
        p = g1_add(p, base) if rng.integers(2) else g1_add(g1_add(p, p), base)
        pts.append(p)
    px, py, _ = g1.points_to_device(pts)
    reps = (n + distinct - 1) // distinct
    px = jnp.tile(px, (reps, 1))[:n]
    py = jnp.tile(py, (reps, 1))[:n]
    limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    limbs[:, 15] &= 0x3FFF  # < 2^254 < R
    return (px, py), jnp.asarray(limbs)


def host_reference_rate(points, scalars, sample: int = 256) -> float:
    """Points/sec of the host python double-and-add MSM on a subsample."""
    px = fq_ops.decode(points[0][:sample])
    py = fq_ops.decode(points[1][:sample])
    s = np.asarray(scalars[:sample], dtype=np.uint64)
    svals = [
        int(sum(int(v) << (16 * i) for i, v in enumerate(row))) for row in s
    ]
    t0 = time.perf_counter()
    acc = G1_INF
    for x, y, k in zip(px, py, svals):
        acc = g1_add(acc, g1_mul((x, y, 1), k))
    dt = time.perf_counter() - t0
    return sample / dt
