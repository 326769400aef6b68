"""Multi-chip sharded kernels: MSM, tree building (Mesh + shard_map).

TPU-native replacements for the reference's distribution machinery
(reference: SURVEY.md §2.9 — P1/P3 chunked/GPU tree builders ->
sub-tree-per-device sharding; P5 Pippenger MSM -> point-sharded bucket
accumulation with cross-device bucket merge; P8 actor-network/DPDK
cluster backend -> jax collectives over ICI/DCN).

Collective layout: bucket sums are POINTS (group elements), so the
cross-device reduction is an all_gather followed by a log-depth local
Jacobian-add fold (psum only works for ring-additive dtypes). The
gather moves [W, B, 3, limbs] uint32 per device over ICI; at c=16 and
8 devices that is ~1.2 GB — amortized over 2^24-point shards it is
<2% of the per-device compute time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import g1_jax, g2_jax
from ..ops import msm as msm_mod

_tmap = jax.tree_util.tree_map


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        devices = jax.devices("cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def msm_sharded(points, scalars, mesh: Mesh, n_buckets: int = 1 << 16,
                curve_name: str = "g1"):
    """Pippenger MSM with points+scalars sharded over the mesh axis.

    Each device accumulates buckets for its shard (the compute-heavy
    O(N) part); bucket matrices are all-gathered and folded with a
    log2(D)-depth batched point-add tree; aggregation and the Horner
    window combine run replicated (O(B + c*W) — negligible).
    """
    curve = g1_jax if curve_name == "g1" else g2_jax
    axis = mesh.axis_names[0]

    def local(pts, sc):
        digits = msm_mod._reslice_digits(sc, n_buckets).astype(jnp.uint32)
        acc = msm_mod._bucket_accumulate(pts, digits, n_buckets, curve)
        # cross-device bucket merge: gather [D, W, B, ...] then fold
        state = _tmap(lambda t: jax.lax.all_gather(t, axis, axis=0), acc)
        size = jax.tree_util.tree_leaves(state)[0].shape[0]
        while size > 1:
            half = size // 2
            lo = _tmap(lambda t: t[:half], state)
            hi = _tmap(lambda t: t[half : 2 * half], state)
            merged = curve.add(lo, hi)
            if size % 2:
                rest = _tmap(lambda t: t[2 * half :], state)
                merged = _tmap(
                    lambda a, b: jnp.concatenate([a, b], axis=0), merged, rest
                )
            state = merged
            size = half + (size % 2)
        acc = _tmap(lambda t: t[0], state)
        totals = msm_mod._aggregate_buckets(acc, curve)
        res = msm_mod._combine_windows(
            totals, int(n_buckets).bit_length() - 1, curve
        )
        return _tmap(lambda t: t[None], res)

    spec_points = _tmap(lambda _: P(axis, None), points)
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_points, P(axis, None)),
        out_specs=P(None, None),
        check_vma=False,
    )(points, scalars)
    return _tmap(lambda t: t[0], out)


def build_tree_sharded(leaves, arity: int, mesh: Mesh):
    """Sub-tree-per-device Merkle build (Montgomery limb leaves).

    Returns (sub_roots [D, limbs], top_root [limbs]) — the device-shard
    layout of the reference's split_config base trees (builders.hpp
    :253-272), with the root combine over the gathered sub-roots.
    """
    from ..ops.poseidon_jax import hash_level_mont, poseidon_hash_mont

    axis = mesh.axis_names[0]

    def local(block):
        level = block
        while level.shape[0] > 1:
            level = hash_level_mont(level, arity)
        roots = jax.lax.all_gather(level[0], axis)  # [D, limbs]
        # compound sub/top combine: arity-2 fold over gathered sub-roots
        # (2KiB..1GiB shapes use sub/top arity 2; constants.hpp:116-125)
        top = roots
        while top.shape[0] > 1:
            top = poseidon_hash_mont(
                top.reshape(top.shape[0] // 2, 2, -1), 2
            )
        return roots, top

    roots, top = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(leaves)
    return roots, top[0]
