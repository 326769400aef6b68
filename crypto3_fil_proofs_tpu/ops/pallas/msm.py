"""Pippenger MSM driven by the fused Pallas point kernels (G1 and G2).

Same algorithm as ops/msm.py (sorted-bucket rank passes, suffix-scan
aggregation, Horner window combine — SURVEY §2.9 P5) but the point
arithmetic runs through ops/pallas/{g1,g2}.py fused kernels, which keep
all per-add intermediates in VMEM instead of HBM. Points and
accumulators are SoA ([24, N] limb planes), so kernel blocks are
contiguous and the per-pass gather is one axis-1 take.

Scalars/digit handling, sorting and scheduling stay at the XLA level —
they are integer ops XLA already does well. The curve enters only
through a small adapter (plane pytree + kernel entry points), so the
G2 MSM (Groth16 B commitment, the slowest per-partition stage) shares
every line of the scheduling logic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fr_limbs import FQ
from ..msm import _reslice_digits
from . import g1 as pg1
from . import g2 as pg2

N_LIMBS = FQ.n


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _pack_planes(planes):
    """[k*16, N] canonical 16-bit-limb u32 planes -> [k*8, N] with two
    limbs per word. The bucket-fill gather is HBM-byte-rate bound
    (~2.4 GB/s useful on v5e — r4 probe: a 24-row take runs 24.2M
    rows/s, a 48-row take 12.6M, i.e. bytes/s constant), so halving the
    table bytes halves the dominant MSM stage."""
    return jnp.concatenate(
        [p[0::2] | (p[1::2] << 16) for p in planes], axis=0
    )


def _unpack_rows(packed, k):
    """Inverse of _pack_planes on gathered [k*12, P] rows -> k planes of
    [24, P] canonical limbs."""
    half = N_LIMBS // 2
    outs = []
    for i in range(k):
        w = packed[i * half : (i + 1) * half]
        lo = w & jnp.uint32(0xFFFF)
        hi = w >> 16
        # interleave back: limb 2j from lo[j], 2j+1 from hi[j]
        outs.append(
            jnp.stack([lo, hi], axis=1).reshape(N_LIMBS, *w.shape[1:])
        )
    return outs


def _permute_lanes_packed(tree, idx):
    """Lane permutation of a canonical-limb SoA pytree through ONE
    packed take (half the bytes of per-plane takes)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    rows = _pack_planes(leaves)[:, idx]
    return jax.tree_util.tree_unflatten(treedef, _unpack_rows(rows, len(leaves)))


def _neg_fq_plane(y):
    """p - y on a [24, P] canonical-limb plane (y == 0 stays 0)."""
    p_limbs = jnp.asarray(np.asarray(FQ.p_np, np.uint32))[:, None]
    borrow = jnp.zeros_like(y[0])
    diff = []
    for j in range(N_LIMBS):
        s = y[j] + borrow
        d = p_limbs[j] - s
        borrow = (p_limbs[j] < s).astype(jnp.uint32)
        diff.append(d & jnp.uint32(0xFFFF))
    is_zero = (y.astype(jnp.int32).max(axis=0) == 0)
    return jnp.where(is_zero[None, :], y, jnp.stack(diff, axis=0))


class _G1Ops:
    """Adapter: acc pytree (X, Y, Z), affine q (x, y); the gather table
    is one packed [2*8, N] plane (x||y, two 16-bit limbs per word)."""

    block = pg1.G1_BLOCK
    name = "g1"

    @staticmethod
    def zeros(m):
        z = jnp.zeros((N_LIMBS, m), dtype=jnp.uint32)
        one = jnp.asarray(
            np.array(pg1._ONE_MONT, dtype=np.uint32)[:, None]
        ) * jnp.ones((1, m), jnp.uint32)
        return (one, one, z)

    @staticmethod
    def pack_table(points):
        px, py = points
        return _pack_planes([px, py])

    @staticmethod
    def gather(table, idx):
        return tuple(_unpack_rows(table[:, idx], 2))

    @staticmethod
    def negate_y(q, neg):
        x, y = q
        return (x, jnp.where(neg[None, :] == 1, _neg_fq_plane(y), y))

    @staticmethod
    def madd_split(acc, q, valid):
        x, y, z, same = pg1.madd_nodbl_soa(acc, q, valid)
        return (x, y, z), same

    dbl = staticmethod(pg1.dbl_soa)
    add = staticmethod(pg1.add_soa)

    @staticmethod
    def zero_z(acc, keep):
        """Zero the Z plane(s) on lanes where keep is False -> infinity."""
        x, y, z = acc
        return (x, y, jnp.where(keep[None, :], z, 0))


class _G2Ops:
    """acc pytree ((X0,X1),(Y0,Y1),(Z0,Z1)); q ((x0,x1),(y0,y1))."""

    block = pg2.G2_BLOCK
    name = "g2"

    @staticmethod
    def zeros(m):
        z = jnp.zeros((N_LIMBS, m), dtype=jnp.uint32)
        one = jnp.asarray(
            np.array(pg2._ONE_MONT, dtype=np.uint32)[:, None]
        ) * jnp.ones((1, m), jnp.uint32)
        return ((one, z), (one, z), (z, z))

    @staticmethod
    def pack_table(points):
        (x0, x1), (y0, y1) = points
        return _pack_planes([x0, x1, y0, y1])

    @staticmethod
    def gather(table, idx):
        x0, x1, y0, y1 = _unpack_rows(table[:, idx], 4)
        return ((x0, x1), (y0, y1))

    @staticmethod
    def negate_y(q, neg):
        x, (y0, y1) = q
        m = neg[None, :] == 1
        return (
            x,
            (
                jnp.where(m, _neg_fq_plane(y0), y0),
                jnp.where(m, _neg_fq_plane(y1), y1),
            ),
        )

    madd_split = staticmethod(pg2.madd_nodbl_soa)
    dbl = staticmethod(pg2.dbl_soa)
    add = staticmethod(pg2.add_soa)

    @staticmethod
    def zero_z(acc, keep):
        x, y, z = acc
        return (x, y, _tmap(lambda t: jnp.where(keep[None, :], t, 0), z))


def _reslice_signed(scalars, c):
    """Signed c-bit windows (carry recode): returns (idx, neg) [W, N]
    u32 where idx = |digit| - 1 (zero digits become the 0xffffffff
    sentinel, which sorts past every real lane) and neg flags digits
    recoded as negatives. Digit range is the asymmetric
    [-(2^(c-1)-1), 2^(c-1)], so bucket values 1..2^(c-1) fill EXACTLY
    2^(c-1) lanes — half the unsigned lane space, which is what lets
    c=20 windows fit HBM at 2^24 (the unsigned attempt OOM'd).
    Negated digits cost one conditional y-negation at gather time
    (negation is free on short-Weierstrass points)."""
    from ..msm import _reslice_digits

    digits = _reslice_digits(scalars, 1 << c)
    W = digits.shape[0]
    # the final carry must die in the top window: top digit + 1 must
    # stay <= 2^(c-1), i.e. at least one spare bit above bit 255
    assert c * W >= 256, (c, W)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    idxs, negs = [], []
    carry = jnp.zeros_like(digits[0])
    for w in range(W):
        d = digits[w] + carry
        neg = (d > half).astype(jnp.uint32)
        mag = jnp.where(neg == 1, full - d, d)
        carry = neg
        idxs.append(mag - 1)  # mag 0 -> sentinel 0xffffffff
        negs.append(neg)
    return jnp.stack(idxs), jnp.stack(negs)


def _bucket_accumulate_soa(
    ops, points, digits, n_buckets, neg=None, prepacked=False
):
    """Bucket sums via count-sorted prefix rank passes. digits [W, N]
    uint32. Returns SoA accumulator pytree with flattened [W * B] lane
    axis (window-major bucket order).

    Scheduling: bucket lanes are sorted by occupancy (descending) and
    the rank passes run over a shrinking prefix — phase k covers the
    first L/2^k lanes for ranks [counts_p[L/2^k_next], ...), so a lane
    is only ever gathered while it still has points. A single global
    while_loop pays max_count passes over ALL W*B lanes (gathering
    clipped junk for exhausted buckets): with uniform mod-r scalars
    that is ~1.27x the N*W minimum (Poisson max/mean at 2^24/c=16,
    measured 325 vs 256), and the modulus-skewed TOP window (its digits
    only reach r>>240) previously needed a replica split to avoid a
    ~2.2x dense bucket space. Count sorting absorbs any distribution:
    total gathered rows ~= sum(counts) + staircase overshoot (<4% for
    Poisson), dead lanes (bucket 0, empty buckets, padding) get zero
    passes, and no replica machinery is needed."""
    W, N = digits.shape
    B = n_buckets
    # ONE variadic sort carries the payload with the keys: the old
    # argsort + take_along_axis(digits) + take_along_axis(neg) chain
    # paid two extra 268M-element gathers at 2^24 (schedule was 5.7s of
    # the 27s total). The payload rides the sign in bit 31 (N <= 2^30).
    iota = jnp.arange(N, dtype=jnp.uint32)
    if neg is None:
        payload = jnp.broadcast_to(iota[None, :], (W, N))
    else:
        payload = iota[None, :] | (neg << 31)
    sorted_digits, order_flat = jax.lax.sort(
        (digits, payload), dimension=1, num_keys=1
    )
    order_flat = order_flat.reshape(W * N)
    bucket_ids = jnp.arange(B, dtype=jnp.uint32)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)
    # dense bucket ids: end of run b == start of run b+1 — saves the
    # second 13M-lane searchsorted at large c. The last run ends at N
    # (unsigned: every digit is a real bucket) or at the first signed
    # sentinel (one extra single-id searchsorted).
    if neg is None:
        last = jnp.full((W, 1), N, jnp.int32)
    else:
        last = jax.vmap(
            lambda sd: jnp.searchsorted(sd, jnp.uint32(B), side="left")
        )(sorted_digits).astype(jnp.int32)[:, None]
    ends = jnp.concatenate([starts[:, 1:], last], axis=1)
    counts = ends - starts  # [W, B]
    if neg is None:
        # unsigned lane b holds bucket VALUE b: value 0 is dead
        counts = jnp.where(bucket_ids[None, :] == 0, 0, counts)

    WB = W * B
    win = jnp.arange(WB, dtype=jnp.int32) // B
    counts_f = counts.reshape(WB)
    base_f = win * N + starts.reshape(WB)  # lane -> its run in order_flat

    # pad the lane space to a kernel-block multiple; padding lanes have
    # count 0 and sort to the tail (never processed)
    L = max(ops.block, -(-WB // ops.block) * ops.block)
    if L > WB:
        z = jnp.zeros(L - WB, jnp.int32)
        counts_f = jnp.concatenate([counts_f, z])
        base_f = jnp.concatenate([base_f, z])

    perm = jnp.argsort(-counts_f)  # occupancy-descending lane order
    counts_p = counts_f[perm]
    base_p = base_f[perm]

    # 4x prefix steps (rounded up to block multiples): each phase is a
    # traced madd+dbl kernel pair, so phase count is compile time; for
    # concentrated (Poisson-ish) count distributions the staircase
    # overshoot of coarser steps is <1%.
    prefixes = [L]
    while prefixes[-1] > ops.block:
        nxt = -(-(prefixes[-1] // 4) // ops.block) * ops.block
        prefixes.append(max(nxt, ops.block))

    # packed once; halves gather bytes. Callers at memory-critical sizes
    # pre-pack outside the jit so the unpacked planes never coexist
    # with the accumulator (2^24 c=20 signed OOM'd 16GB otherwise).
    table = points if prepacked else ops.pack_table(points)

    def make_body(base_pref, cnt_pref):
        def body(state):
            s, a = state
            idx = jnp.clip(base_pref + s, 0, W * N - 1)
            v = order_flat[idx]
            q = ops.gather(table, (v & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32))
            if neg is not None:
                q = ops.negate_y(q, v >> 31)
            # fast madd (no doubling path); P==Q lanes are flagged and
            # doubled out of band only on passes that hit one (rare
            # for distinct bases)
            new_a, same = ops.madd_split(
                a, q, (s < cnt_pref).astype(jnp.uint32)
            )
            a = jax.lax.cond(
                jnp.any(same != 0),
                lambda x, m: ops.dbl(x, m),
                lambda x, m: x,
                new_a,
                same,
            )
            return s + 1, a

        return body

    acc = ops.zeros(L)  # permuted lane space
    segments = []  # finished lane ranges, innermost (smallest) last
    lo = jnp.int32(0)
    for k, P in enumerate(prefixes):
        nxt = prefixes[k + 1] if k + 1 < len(prefixes) else None
        hi = counts_p[0] if nxt is None else counts_p[nxt]
        hi = jnp.maximum(hi, lo)
        body = make_body(base_p[:P], counts_p[:P])
        _, acc = jax.lax.while_loop(
            lambda st, hi=hi: st[0] < hi,
            body,
            (lo, _tmap(lambda t: t[..., :P], acc)),
        )
        if nxt is None:
            segments.append(acc)
        else:
            segments.append(_tmap(lambda t: t[..., nxt:], acc))
        lo = hi
    acc_sorted = jax.tree_util.tree_map(
        lambda *ts: jnp.concatenate(ts[::-1], axis=-1), *segments
    )
    inv = jnp.argsort(perm)[:WB]  # back to window-major bucket order
    return _permute_lanes_packed(acc_sorted, inv)


def _add_padded(ops, a, b):
    """Lanewise full add tolerant of non-block-multiple lane counts:
    pads both operands with all-zero (Z=0 = infinity) lanes, which the
    add kernels pass through, then slices the result back."""
    m = jax.tree_util.tree_leaves(a)[0].shape[-1]
    M = max(ops.block, -(-m // ops.block) * ops.block)
    if M != m:
        pad = lambda t: jnp.pad(t, ((0, 0), (0, M - m)))
        a = _tmap(pad, a)
        b = _tmap(pad, b)
    out = ops.add(a, b)
    if M != m:
        out = _tmap(lambda t: t[..., :m], out)
    return out


def _dbl_padded(ops, p):
    """Lanewise double with the same zero-lane padding contract."""
    m = jax.tree_util.tree_leaves(p)[0].shape[-1]
    M = max(ops.block, -(-m // ops.block) * ops.block)
    pp = _tmap(lambda t: jnp.pad(t, ((0, 0), (0, M - m))), p) if M != m else p
    out = ops.dbl(pp, jnp.ones(M, jnp.uint32))
    return _tmap(lambda t: t[..., :m], out) if M != m else out


def _aggregate_soa(ops, acc, W, B):
    """sum_b b * S_b per window (suffix scan + prefix reduce), acc SoA
    pytree with [W * B] lanes. Returns pytree with [W] lanes."""
    pos = jnp.arange(B)

    def shift_add(state, i, direction):
        d = jnp.int32(1) << i
        shifted = _tmap(
            lambda t: jnp.roll(
                t.reshape(t.shape[0], W, B), -direction * d, axis=2
            ).reshape(t.shape[0], W * B),
            state,
        )
        if direction > 0:
            in_range = pos + d < B
        else:
            in_range = pos - d >= 0
        mask = jnp.broadcast_to(in_range[None, :], (W, B)).reshape(-1)
        shifted = ops.zero_z(shifted, mask)
        return _add_padded(ops, state, shifted)

    log_b = B.bit_length() - 1
    state = acc
    for i in range(log_b):
        state = shift_add(state, i, +1)
    # drop k=0, then prefix-scan leftward; lane B-1 of each window holds
    # sum_{k>=1} suffix_k
    keep = jnp.broadcast_to((pos >= 1)[None, :], (W, B)).reshape(-1)
    state = ops.zero_z(state, keep)
    for i in range(log_b):
        state = shift_add(state, i, -1)
    return _tmap(
        lambda t: t.reshape(t.shape[0], W, B)[:, :, B - 1], state
    )


def _tree_reduce_inner(ops, acc, outer, inner):
    """Reduce [24, outer*inner] lane planes over the contiguous inner
    axis by repeated halving — lanewise adds only, no gathers."""
    m = inner
    while m > 1:
        h = m // 2
        cut = lambda t, s, m=m: t.reshape(t.shape[0], outer, m)[
            :, :, s
        ].reshape(t.shape[0], -1)
        acc = _add_padded(
            ops,
            _tmap(lambda t: cut(t, slice(0, h)), acc),
            _tmap(lambda t: cut(t, slice(h, None)), acc),
        )
        m = h
    return acc  # [24, outer]


def _tree_reduce_mid(ops, acc, W, mid, inner):
    """Reduce [24, W*mid*inner] lane planes over the middle axis."""
    m = mid
    while m > 1:
        h = m // 2
        cut = lambda t, s, m=m: t.reshape(t.shape[0], W, m, inner)[
            :, :, s
        ].reshape(t.shape[0], -1)
        acc = _add_padded(
            ops,
            _tmap(lambda t: cut(t, slice(0, h)), acc),
            _tmap(lambda t: cut(t, slice(h, None)), acc),
        )
        m = h
    return acc  # [24, W*inner]


def _aggregate_split(ops, acc, W, B):
    """sum_b b*S_b per window via the hi/lo digit split.

    With b = hi*Blo + lo:  sum_b b*S_b
        = Blo * sum_hi hi*T_hi + sum_lo lo*U_lo,
      T_hi = sum_lo S[hi,lo]   (contiguous tree reduce over lo)
      U_lo = sum_hi S[hi,lo]   (tree reduce over hi)
    Cost ~2*W*B lanewise adds + two sqrt(B)-scale suffix scans +
    log2(Blo) doublings on W lanes, vs 2*log2(B)*W*B adds for the flat
    scan (_aggregate_soa) — ~16x fewer adds at B=2^16, and the only
    formulation that keeps large-c windows (B >= 2^20) feasible."""
    log_b = B.bit_length() - 1
    h_lo = log_b // 2
    Blo, Bhi = 1 << h_lo, 1 << (log_b - h_lo)
    T = _tree_reduce_inner(ops, acc, W * Bhi, Blo)  # [24, W*Bhi]
    U = _tree_reduce_mid(ops, acc, W, Bhi, Blo)  # [24, W*Blo]
    hi_tot = _aggregate_soa(ops, T, W, Bhi)  # sum_hi hi*T_hi, [24, W]
    lo_tot = _aggregate_soa(ops, U, W, Blo)  # sum_lo lo*U_lo, [24, W]
    for _ in range(h_lo):  # Blo * hi_tot
        hi_tot = _dbl_padded(ops, hi_tot)
    return _add_padded(ops, hi_tot, lo_tot)


def _stages(ops, points, scalars, n_buckets, signed=False, prepacked=False):
    # The count-sorted accumulate schedule absorbs any digit
    # distribution (incl. the mod-r-skewed top window that previously
    # needed a replica split), so digits go in as-is. W*B only needs to
    # be a kernel-block multiple for the aggregation scans.
    if signed:
        c = int(n_buckets).bit_length() - 1
        digits, neg = _reslice_signed(scalars, c)
        W = digits.shape[0]
        Bl = n_buckets // 2  # lanes hold bucket values 1..2^(c-1)
        acc = _bucket_accumulate_soa(
            ops, points, digits, Bl, neg=neg, prepacked=prepacked
        )
        split = (
            _aggregate_split(ops, acc, W, Bl)
            if Bl >= (1 << 12)
            else _aggregate_soa(ops, acc, W, Bl)
        )
        # lane weight is lane+1: add the plain per-window bucket sum
        offset = _tree_reduce_inner(ops, acc, W, Bl)
        return _add_padded(ops, split, offset)
    digits = _reslice_digits(scalars, n_buckets).astype(jnp.uint32)
    W = digits.shape[0]
    acc = _bucket_accumulate_soa(
        ops, points, digits, n_buckets, prepacked=prepacked
    )
    if n_buckets >= (1 << 12):
        return _aggregate_split(ops, acc, W, n_buckets)
    return _aggregate_soa(ops, acc, W, n_buckets)


@jax.jit
def pack_table_g1(px, py):
    """[24, N] x/y planes -> one packed [24, N] gather table (x||y, two
    16-bit limbs per word). For msm_pallas_stages_packed."""
    return _pack_planes([px, py])


@functools.partial(jax.jit, static_argnames=("n_buckets", "signed"))
def msm_pallas_stages_packed(table, scalars, n_buckets=1 << 16, signed=False):
    """msm_pallas_stages over a pre-packed table (pack_table_g1) — the
    memory-lean entry: the unpacked planes can be freed before the
    accumulator allocates."""
    return _stages(
        _G1Ops, table, scalars, n_buckets, signed=signed, prepacked=True
    )


@functools.partial(jax.jit, static_argnames=("n_buckets", "signed"))
def msm_pallas_stages(px, py, scalars, n_buckets=1 << 16, signed=False):
    """G1 bucket accumulation + aggregation on device. Returns
    per-window totals as SoA [24, W] Jacobian (Montgomery), windows
    ascending. signed=True uses the signed-digit recode (half the
    bucket lanes per window; requires c >= 17 so the carry dies in the
    top window)."""
    return _stages(_G1Ops, (px, py), scalars, n_buckets, signed=signed)


@functools.partial(jax.jit, static_argnames=("n_buckets", "signed"))
def msm_pallas_stages_g2(points, scalars, n_buckets=1 << 16, signed=False):
    """G2 variant: points ((x0,x1),(y0,y1)) planes [24, N]."""
    return _stages(_G2Ops, points, scalars, n_buckets, signed=signed)


def _sum_points(ops, pts_jac):
    """Tree-reduce a Jacobian SoA pytree down to one kernel block by
    repeated halving (contiguous adds — no gathers, no buckets). The
    Groth16 prover uses this for the scalar==1 density class: witness
    assignments are mostly bits, and bit-heavy scalars degenerate the
    bucket rank passes (bucket 1 holds ~N/2 points -> ~N/2 while_loop
    trips; the run that exposed this crashed the v5e worker). Mirrors
    bellperson's density-map handling of 0/1 scalars."""
    N = pts_jac[0].shape[1] if ops is _G1Ops else pts_jac[0][0].shape[1]
    while N > ops.block:
        half = N // 2
        a = _tmap(lambda t: t[:, :half], pts_jac)
        b = _tmap(lambda t: t[:, half:], pts_jac)
        pts_jac = ops.add(a, b)
        N = half
    return pts_jac


def sum_points_g1(px_rows, py_rows):
    """Sum of affine G1 points ([n, 24] Montgomery rows). Returns a
    host Jacobian int tuple."""
    from ..bls12_381 import G1_INF, g1_add
    from ..fr_limbs import fq_ops

    n = px_rows.shape[0]
    if n == 0:
        return G1_INF
    N = max(pg1.G1_BLOCK, 1 << (n - 1).bit_length())
    z = np.zeros((N_LIMBS, N), np.uint32)
    one = np.array(pg1._ONE_MONT, np.uint32)[:, None] * np.ones(
        (1, N), np.uint32
    )
    x = np.zeros((N_LIMBS, N), np.uint32)
    y = np.zeros((N_LIMBS, N), np.uint32)
    x[:, :n] = np.asarray(px_rows).T
    y[:, :n] = np.asarray(py_rows).T
    zz = z.copy()
    zz[:, :n] = one[:, :n]  # z=1 real lanes, z=0 padding (infinity)
    out = _sum_points(
        _G1Ops, (jnp.asarray(x), jnp.asarray(y), jnp.asarray(zz))
    )
    xs = fq_ops.decode(np.asarray(out[0]).T)
    ys = fq_ops.decode(np.asarray(out[1]).T)
    zs = fq_ops.decode(np.asarray(out[2]).T)
    acc = G1_INF
    for X, Y, Z in zip(xs, ys, zs):
        if Z != 0:
            acc = g1_add(acc, (X, Y, Z))
    return acc


def sum_points_g2(aff_rows):
    """Sum of affine G2 points (((x0,x1),(y0,y1)) [n, 24] rows)."""
    from ..bls12_381 import G2_INF, g2_add
    from ..fr_limbs import fq_ops

    n = aff_rows[0][0].shape[0]
    if n == 0:
        return G2_INF
    N = max(pg2.G2_BLOCK, 1 << (n - 1).bit_length())

    def plane(rows):
        p = np.zeros((N_LIMBS, N), np.uint32)
        p[:, :n] = np.asarray(rows).T
        return jnp.asarray(p)

    one = np.array(pg2._ONE_MONT, np.uint32)[:, None] * np.ones(
        (1, N), np.uint32
    )
    one[:, n:] = 0
    zero = jnp.zeros((N_LIMBS, N), jnp.uint32)
    pts = (
        (plane(aff_rows[0][0]), plane(aff_rows[0][1])),
        (plane(aff_rows[1][0]), plane(aff_rows[1][1])),
        (jnp.asarray(one), zero),
    )
    out = _sum_points(_G2Ops, pts)
    dec = [[fq_ops.decode(np.asarray(p).T) for p in pair] for pair in out]
    acc = G2_INF
    for i in range(out[0][0].shape[1]):
        z = (dec[2][0][i], dec[2][1][i])
        if z != (0, 0):
            acc = g2_add(
                acc,
                ((dec[0][0][i], dec[0][1][i]),
                 (dec[1][0][i], dec[1][1][i]), z),
            )
    return acc


def _combine_host(pts, c, add_fn, inf):
    """Horner window combine over host window totals (ascending)."""
    res = inf
    for w in range(len(pts) - 1, -1, -1):
        if w != len(pts) - 1:
            for _ in range(c):
                res = add_fn(res, res)
        res = add_fn(res, pts[w])
    return res


def msm_pallas(points_packed, scalars, n_buckets: int = 1 << 16, signed=False):
    """Full G1 MSM. points_packed: (px [N, 24], py [N, 24]) Montgomery
    affine (ops/g1_jax.points_to_device layout); scalars [N, 16] uint32
    plain limbs. Returns one host-side Jacobian int tuple.

    The O(B + W) tail (window combine) runs on the host — a few window
    totals and c doublings are negligible next to the O(N*W) passes.
    """
    from ..bls12_381 import G1_INF, g1_add
    from ..fr_limbs import fq_ops

    px, py = points_packed
    totals = msm_pallas_stages(px.T, py.T, scalars, n_buckets, signed=signed)
    c = int(n_buckets).bit_length() - 1
    xs = fq_ops.decode(totals[0].T)
    ys = fq_ops.decode(totals[1].T)
    zs = fq_ops.decode(totals[2].T)
    pts = [
        (x, y, z) if z != 0 else G1_INF for x, y, z in zip(xs, ys, zs)
    ]
    return _combine_host(pts, c, g1_add, G1_INF)


def msm_pallas_g2(points_affine, scalars, n_buckets: int = 1 << 16):
    """Full G2 MSM. points_affine: ((x0,x1),(y0,y1)) each [N, 24]
    Montgomery (ops/g2_jax.points_to_device layout, transposed here);
    scalars [N, 16] uint32 plain limbs. Returns a host Jacobian point
    over Fq2 int pairs."""
    from ..bls12_381 import G2_INF, g2_add
    from ..fr_limbs import fq_ops

    pts_soa = _tmap(lambda t: jnp.asarray(t).T, points_affine)
    totals = msm_pallas_stages_g2(pts_soa, scalars, n_buckets)
    c = int(n_buckets).bit_length() - 1
    dec = [
        [fq_ops.decode(plane.T) for plane in pair] for pair in totals
    ]
    W_ext = len(dec[0][0])
    pts = []
    for w in range(W_ext):
        x = (dec[0][0][w], dec[0][1][w])
        y = (dec[1][0][w], dec[1][1][w])
        z = (dec[2][0][w], dec[2][1][w])
        pts.append((x, y, z) if z != (0, 0) else G2_INF)
    return _combine_host(pts, c, g2_add, G2_INF)
