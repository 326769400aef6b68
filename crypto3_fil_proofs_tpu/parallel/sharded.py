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

from functools import lru_cache

_NTT_SHARDED_CACHE: dict = {}
_SHARDED_FN_CACHE: dict = {}

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


def msm_sharded_buckets(points, scalars, mesh: Mesh,
                        n_buckets: int = 1 << 16,
                        curve_name: str = "g1"):
    """The sharded half of the Pippenger MSM: per-device bucket
    accumulation + cross-device bucket merge (all_gather + log-depth
    point-add fold). Returns the merged [W, B] Jacobian bucket pytree.

    Split out so callers that only need to validate the collective
    layout (the driver dry run) can aggregate the O(W*B) bucket sums on
    the host instead of compiling the (large) aggregation/combine
    programs — those are identical to the single-chip stages anyway.
    """
    curve = g1_jax if curve_name == "g1" else g2_jax
    axis = mesh.axis_names[0]

    def local(pts, sc):
        digits = msm_mod._reslice_digits(sc, n_buckets).astype(jnp.uint32)
        acc = msm_mod._bucket_accumulate(pts, digits, n_buckets, curve)
        # cross-device bucket merge: gather [D, W, B, ...] then reduce
        # with a fori_loop over the device axis. A log-depth unrolled
        # fold does the same D-1 full-[W,B]-width adds of work but
        # traces log2(D) separate curve.add programs — each traced
        # curve-add instance costs seconds of XLA:CPU compile, which is
        # what timed out the 8-device dry run (MULTICHIP_r02).
        state = _tmap(lambda t: jax.lax.all_gather(t, axis, axis=0), acc)
        D = jax.tree_util.tree_leaves(state)[0].shape[0]

        def merge(d, s):
            return curve.add(
                s,
                _tmap(
                    lambda t: jax.lax.dynamic_index_in_dim(
                        t, d, axis=0, keepdims=False
                    ),
                    state,
                ),
            )

        return jax.lax.fori_loop(
            1, D, merge, _tmap(lambda t: t[0], state)
        )

    spec_points = _tmap(lambda _: P(axis, None), points)
    key = ("msm", n_buckets, curve_name, mesh,
           jax.tree_util.tree_structure(points))
    fn = _SHARDED_FN_CACHE.get(key)
    if fn is None:
        # jit ONLY the sharded part (accumulate + gather + merge-fold);
        # aggregation/combine reuse msm_device's single-device jitted
        # stages, so their (large) curve programs compile once and are
        # shared between the sharded and local MSM paths. Eager
        # shard_map would dispatch every primitive per-device.
        fn = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(spec_points, P(axis, None)),
                out_specs=P(None, None),
                check_vma=False,
            )
        )
        _SHARDED_FN_CACHE[key] = fn
    return fn(points, scalars)


def msm_sharded(points, scalars, mesh: Mesh, n_buckets: int = 1 << 16,
                curve_name: str = "g1"):
    """Pippenger MSM with points+scalars sharded over the mesh axis.

    Each device accumulates buckets for its shard (the compute-heavy
    O(N) part); bucket matrices are all-gathered and folded with a
    log2(D)-depth batched point-add tree; aggregation and the Horner
    window combine run replicated (O(B + c*W) — negligible).
    """
    acc = msm_sharded_buckets(points, scalars, mesh, n_buckets, curve_name)
    totals = msm_mod._aggregate_stage(acc, curve_name)
    return msm_mod._combine_stage(
        totals, int(n_buckets).bit_length() - 1, curve_name
    )


@lru_cache(maxsize=None)
def _four_step_twiddles(log_n: int, inverse: bool) -> np.ndarray:
    """[n1, n2, limbs] Montgomery table w^(k1*i2) for the four-step NTT
    (w = 2^log_n-th root of unity, inverted for the inverse transform)."""
    from ..ops import ntt as ntt_mod
    from ..ops.bls12_381 import R
    from ..ops.fr_limbs import FR

    log_n1 = (log_n + 1) // 2
    n1, n2 = 1 << log_n1, 1 << (log_n - log_n1)
    omega = ntt_mod._root_of_unity(log_n)
    if inverse:
        omega = pow(omega, R - 2, R)
    base = [1] * n2  # omega^i2, plain form
    for i in range(1, n2):
        base[i] = base[i - 1] * omega % R
    mont = FR.mont_r % R
    cur = [mont] * n2  # row k1 in Montgomery form
    rows = np.empty((n1, n2, FR.n), dtype=np.uint32)
    for k1 in range(n1):
        rows[k1] = FR.to_limbs(cur)
        if k1 + 1 < n1:
            cur = [c * b % R for c, b in zip(cur, base)]
    return rows


def ntt_sharded(a, log_n: int, mesh: Mesh, inverse: bool = False):
    """Multi-chip NTT via the four-step (transpose) algorithm — the
    TPU-native butterfly exchange (SURVEY §2.9 P6): view the length-n
    vector as an [n1, n2] matrix; each device runs length-n1 NTTs over
    its column shard, scales by w^(k1*i2), transposes shards with ONE
    tiled all_to_all over ICI, then runs length-n2 NTTs locally. Result
    is bit-identical to the single-chip ops/ntt transform.

    a: [n, limbs] Montgomery-form coefficients (natural order).
    """
    import jax.numpy as _jnp

    from ..ops import ntt as ntt_mod
    from ..ops.fr_limbs import FR, fr_ops

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n1 % D == 0 and n2 % D == 0, "mesh must divide both factors"
    plan1 = ntt_mod.NttPlan(log_n1)
    plan2 = ntt_mod.NttPlan(log_n2)
    tw1 = _jnp.asarray(plan1.tw_inv if inverse else plan1.tw_fwd)
    tw2 = _jnp.asarray(plan2.tw_inv if inverse else plan2.tw_fwd)
    step2 = _jnp.asarray(_four_step_twiddles(log_n, inverse))

    def local(block, tw_loc, tw1_arr, tw2_arr):
        # block [n1, n2/D, limbs]: length-n1 NTTs down each local column
        x = block.transpose(1, 0, 2)
        x = ntt_mod._transform(x, plan1, tw1_arr)
        x = x.transpose(1, 0, 2)          # B[k1, i2_local]
        x = fr_ops.mont_mul(x, tw_loc)    # * w^(k1*i2)
        # shard transpose: i2-sharded -> k1-sharded (the ICI exchange)
        x = jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=1, tiled=True)
        return ntt_mod._transform(x, plan2, tw2_arr)  # rows over i2

    key = (log_n, inverse, mesh)
    fn = _NTT_SHARDED_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, axis, None), P(None, axis, None),
                          P(None, None), P(None, None)),
                out_specs=P(axis, None, None),
                check_vma=False,
            )
        )
        _NTT_SHARDED_CACHE[key] = fn
    y = fn(a.reshape(n1, n2, FR.n), step2, tw1, tw2)
    # X[k1 + n1*k2] = Y[k1, k2] -> natural order
    out = y.transpose(1, 0, 2).reshape(1 << log_n, FR.n)
    if inverse:
        out = fr_ops.mont_mul(
            out, _jnp.asarray(ntt_mod.NttPlan(log_n).n_inv_mont)
        )
    return out


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
