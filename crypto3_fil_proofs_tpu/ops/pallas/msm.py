"""Pippenger MSM driven by the fused Pallas point kernels.

Same algorithm as ops/msm.py (sorted-bucket rank passes, suffix-scan
aggregation, Horner window combine — SURVEY §2.9 P5) but the point
arithmetic runs through ops/pallas/g1.py fused kernels, which keep all
~40 per-add intermediates in VMEM instead of HBM. Points and
accumulators are SoA ([24, N] limb-major), so kernel blocks are
contiguous and the per-pass gather is one axis-1 take.

Scalars/digit handling, sorting and scheduling stay at the XLA level —
they are integer ops XLA already does well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fr_limbs import FQ
from ..msm import _reslice_digits
from . import g1 as pg1

N_LIMBS = FQ.n


def _zeros_acc(m):
    z = jnp.zeros((N_LIMBS, m), dtype=jnp.uint32)
    one = jnp.asarray(
        np.array(pg1._ONE_MONT, dtype=np.uint32)[:, None]
    ) * jnp.ones((1, m), jnp.uint32)
    return (one, one, z)


def _bucket_accumulate_soa(px, py, digits, n_buckets):
    """Bucket sums via rank passes. digits [W, N] uint32. Returns SoA
    accumulator with flattened [W * B] lane axis."""
    W, N = digits.shape
    B = n_buckets
    order = jnp.argsort(digits, axis=1)
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)
    bucket_ids = jnp.arange(B, dtype=jnp.uint32)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)
    ends = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="right")
    )(sorted_digits).astype(jnp.int32)
    counts = ends - starts
    max_count = jnp.max(jnp.where(bucket_ids[None, :] == 0, 0, counts))

    acc = _zeros_acc(W * B)

    def body(state):
        s, acc = state
        idx = jnp.clip(starts + s, 0, N - 1)
        valid = (s < counts) & (bucket_ids[None, :] != 0)
        point_idx = jnp.take_along_axis(order, idx, axis=1).reshape(-1)
        q = (px[:, point_idx], py[:, point_idx])
        # fast madd (no doubling path, 11 vs 18 montmuls); P==Q lanes
        # are flagged and doubled out of band only on passes that hit
        # one (rare for distinct bases)
        x, y, z, same = pg1.madd_nodbl_soa(
            acc, q, valid.reshape(-1).astype(jnp.uint32)
        )
        acc = jax.lax.cond(
            jnp.any(same != 0),
            lambda a, m: pg1.dbl_soa(a, m),
            lambda a, m: a,
            (x, y, z),
            same,
        )
        return s + 1, acc

    def cond(state):
        return state[0] < max_count

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


def _aggregate_soa(acc, W, B):
    """sum_b b * S_b per window (suffix scan + prefix reduce), acc SoA
    with [W * B] lanes. Returns SoA with [W] lanes (padded to a block)."""
    pos = jnp.arange(B)

    def reshape4(t):
        return t.reshape(N_LIMBS, W, B)

    def flat(t):
        return t.reshape(N_LIMBS, W * B)

    def shift_add(state, i, direction):
        d = jnp.int32(1) << i
        shifted = tuple(
            flat(jnp.roll(reshape4(t), -direction * d, axis=2)) for t in state
        )
        if direction > 0:
            in_range = pos + d < B
        else:
            in_range = pos - d >= 0
        mask = jnp.broadcast_to(in_range[None, :], (W, B)).reshape(-1)
        sx, sy, sz = shifted
        sz = jnp.where(mask[None, :], sz, 0)
        return pg1.add_soa(state, (sx, sy, sz))

    log_b = B.bit_length() - 1
    state = acc
    for i in range(log_b):
        state = shift_add(state, i, +1)
    # drop k=0, then prefix-scan leftward; lane B-1 of each window holds
    # sum_{k>=1} suffix_k
    keep = jnp.broadcast_to((pos >= 1)[None, :], (W, B)).reshape(-1)
    X, Y, Z = state
    Z = jnp.where(keep[None, :], Z, 0)
    state = (X, Y, Z)
    for i in range(log_b):
        state = shift_add(state, i, -1)
    return tuple(t.reshape(N_LIMBS, W, B)[:, :, B - 1] for t in state)


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def msm_pallas_stages(px, py, scalars, n_buckets=1 << 16):
    """Bucket accumulation + aggregation on device. Returns per-window
    totals as SoA [24, W] Jacobian (Montgomery)."""
    digits = _reslice_digits(scalars, n_buckets).astype(jnp.uint32)
    W = digits.shape[0]
    acc = _bucket_accumulate_soa(px, py, digits, n_buckets)
    return _aggregate_soa(acc, W, n_buckets)


def msm_pallas(points_packed, scalars, n_buckets: int = 1 << 16):
    """Full MSM. points_packed: (px [N, 24], py [N, 24]) Montgomery
    affine (ops/g1_jax.points_to_device layout); scalars [N, 16] uint32
    plain limbs. Returns one host-side Jacobian int tuple.

    The O(B + W) tail (window combine) runs on the host — 16 window
    totals and c doublings are negligible next to the O(N*W) passes.
    """
    from ...ops.bls12_381 import G1_INF, g1_add
    from ...ops.fr_limbs import fq_ops

    px, py = points_packed
    totals = msm_pallas_stages(px.T, py.T, scalars, n_buckets)
    c = int(n_buckets).bit_length() - 1
    W = totals[0].shape[1]
    xs = fq_ops.decode(totals[0].T)
    ys = fq_ops.decode(totals[1].T)
    zs = fq_ops.decode(totals[2].T)
    res = G1_INF
    for w in range(W - 1, -1, -1):
        if w != W - 1:
            for _ in range(c):
                res = g1_add(res, res)
        if zs[w] != 0:
            res = g1_add(res, (xs[w], ys[w], zs[w]))
    return res
