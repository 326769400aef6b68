"""Pippenger multi-scalar multiplication on TPU (G1/G2, BLS12-381).

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
- Bucket aggregation uses sum_b b*S_b = sum_{k>=1} suffix_k: a
  Hillis-Steele suffix scan + prefix reduce, each a fori_loop with a
  single traced add body.
- Window combination is a c-doubling Horner fold over window totals.
- The engine is curve-generic: points are pytrees (G1 = flat arrays,
  G2 = Fq2 pairs), structural ops go through jax.tree_util, group ops
  through the curve module (ops/g1_jax | ops/g2_jax).

Bit-exact vs ops/bls12_381 host MSMs.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import g1_jax, g2_jax
from .bls12_381 import G1_GEN, G1_INF, R, g1_add, g1_from_affine, g1_mul
from .fr_limbs import FR, fq_ops

C_BITS = 16  # full window size; 255-bit scalars -> 16 windows

_tmap = jax.tree_util.tree_map


def _curve(name: str):
    return g1_jax if name == "g1" else g2_jax


def _bucket_accumulate(aff, digits, n_buckets, curve):
    """Bucket sums for all windows at once.

    aff: affine point pytree with leading [N] axis.
    digits: [W, N] uint32 bucket index per point per window (0 = skip).
    Returns Jacobian bucket-sum pytree with leading [W, B] axes.
    """
    W, N = digits.shape

    order = jnp.argsort(digits, axis=1)  # [W, N]
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)
    bucket_ids = jnp.arange(n_buckets, dtype=jnp.uint32)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)
    ends = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="right")
    )(sorted_digits).astype(jnp.int32)
    counts = ends - starts  # [W, B]
    max_count = jnp.max(jnp.where(bucket_ids[None, :] == 0, 0, counts))

    acc = curve.infinity((W, n_buckets))

    def body(state):
        s, acc = state
        idx = jnp.clip(starts + s, 0, N - 1)  # [W, B]
        valid = (s < counts) & (bucket_ids[None, :] != 0)
        point_idx = jnp.take_along_axis(order, idx, axis=1)  # [W, B]
        q = _tmap(lambda t: t[point_idx], aff)
        return s + 1, curve.add_mixed(acc, q, valid)

    def cond(state):
        return state[0] < max_count

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


def _aggregate_buckets(acc, curve):
    """sum_b b * S_b per window: suffix scan then prefix reduce, both
    with single traced bodies. acc leading axes [W, B] -> totals [W]."""
    B = jax.tree_util.tree_leaves(acc)[0].shape[1]
    log_b = B.bit_length() - 1
    assert 1 << log_b == B, "bucket count must be a power of two"
    pos = jnp.arange(B)

    def shift_add(state, i, direction):
        d = jnp.int32(1) << i
        shifted = _tmap(lambda t: jnp.roll(t, -direction * d, axis=1), state)
        if direction > 0:
            in_range = (pos + d < B)[None, :]
        else:
            in_range = (pos - d >= 0)[None, :]
        # out-of-range partner -> infinity (zero its Z)
        sx, sy, sz = shifted
        sz = _tmap(lambda t: jnp.where(in_range[..., None], t, 0), sz)
        return curve.add(state, (sx, sy, sz))

    state = jax.lax.fori_loop(
        0, log_b, lambda i, s: shift_add(s, i, +1), acc
    )
    # drop k=0 (its suffix would double-count), then prefix-scan leftward;
    # position B-1 accumulates sum_{k>=1} suffix_k.
    X, Y, Z = state
    Z = _tmap(lambda t: jnp.where((pos >= 1)[None, :, None], t, 0), Z)
    state = jax.lax.fori_loop(
        0, log_b, lambda i, s: shift_add(s, i, -1), (X, Y, Z)
    )
    return _tmap(lambda t: t[:, B - 1], state)


def _combine_windows(totals, c, curve):
    """Horner fold: result = sum_w 2^(c*w) T_w, windows ascending."""
    W = jax.tree_util.tree_leaves(totals)[0].shape[0]

    def step(w, res):
        res = jax.lax.fori_loop(0, c, lambda _, r: curve.double(r), res)
        nxt = _tmap(lambda t: jnp.take(t, W - 1 - w, axis=0)[None], totals)
        return curve.add(res, nxt)

    res = _tmap(lambda t: t[W - 1 : W], totals)
    res = jax.lax.fori_loop(1, W, step, res)
    return _tmap(lambda t: t[0], res)


def _reslice_digits(scalars, n_buckets):
    """Extract c-bit windows from [N, 16] uint32 16-bit-limb scalars.

    Any c <= 31 (not just divisors of 16): window w covers scalar bits
    [w*c, w*c + c), assembled from the <=3 limbs it straddles. All
    shift amounts stay < 32 and every discarded carry is above bit c,
    so plain uint32 arithmetic is exact. Returns [W, N], windows
    ascending, W = ceil(255/c)."""
    c = int(n_buckets).bit_length() - 1
    if c == 16:
        return scalars.T
    mask = jnp.uint32(n_buckets - 1)
    n_limbs = scalars.shape[1]
    parts = []
    if 16 % c == 0:
        for limb in range(n_limbs):
            for k in range(16 // c):
                parts.append((scalars[:, limb] >> (c * k)) & mask)
        return jnp.stack(parts)  # [W, N] ascending windows
    assert c < 32
    for w in range(-(-255 // c)):
        lo = w * c
        li, off = lo // 16, lo % 16
        v = scalars[:, li] >> off
        if off + c > 16 and li + 1 < n_limbs:
            v = v | (scalars[:, li + 1] << (16 - off))
        if off + c > 32 and li + 2 < n_limbs:
            v = v | (scalars[:, li + 2] << (32 - off))
        parts.append(v & mask)
    return jnp.stack(parts)


@functools.partial(jax.jit, static_argnames=("n_buckets", "curve_name"))
def _accumulate_stage(points, scalars, n_buckets, curve_name):
    curve = _curve(curve_name)
    digits = _reslice_digits(scalars, n_buckets).astype(jnp.uint32)
    return _bucket_accumulate(points, digits, n_buckets, curve)


@functools.partial(jax.jit, static_argnames=("curve_name",))
def _aggregate_stage(acc, curve_name):
    return _aggregate_buckets(acc, _curve(curve_name))


@functools.partial(jax.jit, static_argnames=("c", "curve_name"))
def _combine_stage(totals, c, curve_name):
    return _combine_windows(totals, c, _curve(curve_name))


def pick_buckets(n: int) -> int:
    """Window size by problem size: c=8 until bucket-aggregation cost
    amortizes, c=16 (limb-aligned) for large MSMs. Measured on v5e:
    c=8 wins at 2^18 (66.3k pts/s) but lane-starves by 2^20."""
    return 256 if n <= (1 << 19) else 1 << C_BITS


def msm_device(points, scalars, n_buckets: int | None = None,
               curve_name: str = "g1"):
    """MSM over affine Montgomery points and 16-bit-limb scalars.

    points: affine pytree (G1: (px[N,24], py[N,24]); G2 nested pairs).
    scalars: [N, 16] uint32 standard-form limbs.
    Returns one Jacobian point pytree (Montgomery form).

    Three separately-jitted stages: only the O(N) accumulation program
    depends on the point count, so the (heavier) aggregation/combine
    programs compile once per (W, B) and are shared across all MSM
    sizes — compile time was the practical bottleneck of the
    monolithic version.
    """
    if n_buckets is None:
        n_buckets = pick_buckets(scalars.shape[0])
    acc = _accumulate_stage(points, scalars, n_buckets, curve_name)
    totals = _aggregate_stage(acc, curve_name)
    return _combine_stage(totals, int(n_buckets).bit_length() - 1, curve_name)


# ---------------------------------------------------------------------------
# Host-facing API
# ---------------------------------------------------------------------------


def scalars_to_device(scalars) -> jnp.ndarray:
    """Python ints -> [N, 16] uint32 16-bit-limb array (plain form)."""
    return jnp.asarray(FR.to_limbs([s % R for s in scalars]))


def msm(points, scalars, n_buckets: int | None = None):
    """Host G1 API: host points + int scalars -> host Jacobian point."""
    px, py, _ = g1_jax.points_to_device(points)
    s = scalars_to_device(scalars)
    out = msm_device((px, py), s, n_buckets=n_buckets, curve_name="g1")
    return g1_jax.points_from_device(_tmap(lambda t: t[None], out))[0]


def msm_g2(points, scalars, n_buckets: int | None = None):
    """Host G2 API: host points + int scalars -> host Jacobian point."""
    aff, _ = g2_jax.points_to_device(points)
    s = scalars_to_device(scalars)
    out = msm_device(aff, s, n_buckets=n_buckets, curve_name="g2")
    return g2_jax.points_from_device(_tmap(lambda t: t[None], out))[0]


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
    px, py, _ = g1_jax.points_to_device(pts)
    reps = (n + distinct - 1) // distinct
    px = jnp.tile(px, (reps, 1))[:n]
    py = jnp.tile(py, (reps, 1))[:n]
    limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    # match the production digit distribution (scalars uniform mod r):
    # top 16-bit window ranges over [0, 0x73ed] — the modulus skew the
    # top-window replica split in pallas/msm.py is sized for
    limbs[:, 15] %= 0x73EE
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
