"""Pallas TPU Poseidon permutation (whole permutation in one kernel).

The XLA permutation (ops/poseidon_jax.py) runs ~65 rounds as separate
VPU/MXU ops with every intermediate state materialized to HBM; measured
17.2k poseidon-8 hashes/s on v5e. Here the full permutation — round
constants, S-boxes, MDS mix — happens inside one kernel with the state
resident in VMEM: HBM traffic is one read of the preimage and one write
of the digest, and the montmul compute runs at the same in-register
rate as the field kernel (ops/pallas/field.py, 2.6G montmuls/s).

This is the tree_c / tree_r_last builder kernel (SURVEY §2.9 P3;
reference stacked/vanilla/proof.hpp:385-646 GPU column/tree builders,
configuration.hpp:50-56 batch limits). Bit-exactness: validated against
ops/poseidon.py host permutation (which itself is pinned by on-device
tests at arities 2/8/11).

Layout: SoA [t, n_limbs, N] with N tiled (ROWS, 128).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fr_limbs import FR, LIMB_BITS, LIMB_MASK
from ..poseidon import poseidon_constants

N_LIMBS = FR.n  # 16
N0INV = int(FR.n0inv)
P_LIMBS = [int(v) for v in FR.p_np]
P_INT = FR.modulus

POS_ROWS = 8
POS_BLOCK = POS_ROWS * 128

# plain int (weak-typed) so the kernel doesn't capture a device constant
_mask = LIMB_MASK


def _cios_rowwise(a, limb_at):
    """Unrolled CIOS over per-column row values: `a` a [16, R, 128]
    value, `limb_at(i)` yields multiplier limb i ([R, 128] or scalar).
    The running accumulator is a LIST of 17 column rows, so the
    column-shift between iterations is SSA relabeling and each partial
    product costs exactly its 2x16 aligned row adds — the r3 stacked
    version paid two 17-row concatenate adds plus a 17-row shift copy
    per iteration (~30% more VPU work)."""
    t = [jnp.zeros_like(a[0]) for _ in range(N_LIMBS + 1)]
    for i in range(N_LIMBS):
        bi = limb_at(i)
        t0 = t[0] + ((a[0] * bi) & _mask)
        m = (t0 * jnp.uint32(N0INV)) & _mask
        for j in range(N_LIMBS):
            prod = a[j] * bi
            q = m * jnp.uint32(P_LIMBS[j])
            t[j] = t[j] + ((prod & _mask) + (q & _mask))
            t[j + 1] = t[j + 1] + ((prod >> LIMB_BITS) + (q >> LIMB_BITS))
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t[0])]
        t[0] = t[0] + carry
    limbs, carry = [], jnp.zeros_like(t[0])
    for j in range(N_LIMBS):
        v = t[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    out = jnp.stack(limbs, axis=0)
    return _sub_if_ge(out)


def _montmul_val_ref(a, b_ref):
    """CIOS with `a` an in-kernel [16, R, 128] value and `b_ref` a VMEM
    ref read one limb row per (unrolled) iteration."""
    return _cios_rowwise(a, lambda i: b_ref[i])


def _montmul_const(a, c_ref, base):
    """CIOS against a constant whose limbs live in SMEM: `c_ref` is a
    FLAT scalar-memory ref and `base` the (possibly traced) element
    offset; limb k is the scalar c_ref[base + k] broadcast across
    lanes. Mosaic only allows 128-lane-aligned vector loads from VMEM,
    so per-limb constants must come from SMEM (scalar core
    addressing); the refs are flat because SMEM windows are
    (8,128)-tile padded per trailing 2-D slice (a [57,17,16] window
    allocates 684K of the 1M SMEM)."""
    return _cios_rowwise(a, lambda i: c_ref[base + i])


N_ACC = 2 * N_LIMBS + 1  # 33 wide-accumulator columns


def _acc_mul_const(acc, x, c_ref, base):
    """acc += x * const, schoolbook into the wide accumulator WITHOUT
    reduction (the REDC is shared across a whole linear-combination row
    — PLAN r2 'accumulate-then-REDC'). x is a canonical 16-limb value;
    const limbs are SMEM scalars c_ref[base + k]. lo/hi splits keep
    columns <= 2^21 per product and < 2^26 per mix row — far inside u32.

    `acc` is a LIST of N_ACC per-column rows (not a stacked [33, R, 128]
    tensor): only the 17 columns a partial product actually touches get
    a VPU add, where the r3 stacked version added zero-padded full-width
    tensors (66 row-adds per limb vs 32 — the dominant cost of the mix,
    ~1.4x whole-hash on v5e)."""
    for k in range(N_LIMBS):
        p = x * c_ref[base + k]
        lo = p & _mask
        hi = p >> LIMB_BITS
        for j in range(N_LIMBS):
            acc[k + j] = acc[k + j] + lo[j]
            acc[k + j + 1] = acc[k + j + 1] + hi[j]
    return acc


def _redc_wide(acc):
    """Montgomery reduction of the wide column-list accumulator: 16
    CIOS-style iterations resolving one low column at a time, then
    carry-normalize the high half and an 8p/4p/2p/p subtract ladder
    (the row sum of <= 15 canonical products keeps the result < ~7p).
    Like _acc_mul_const, the m*p partials land as per-column row adds
    (columns i..i+16) instead of zero-padded full-width tensor adds."""
    carry = jnp.zeros_like(acc[0])
    for i in range(N_LIMBS):
        v = acc[i] + carry
        m = (v * jnp.uint32(N0INV)) & _mask
        mp = [m * jnp.uint32(pj) for pj in P_LIMBS]
        carry = (v + (mp[0] & _mask)) >> LIMB_BITS
        # columns i..i+16 get the aligned m*p partial (col i cancels)
        for j in range(N_LIMBS):
            acc[i + j] = acc[i + j] + (mp[j] & _mask)
            acc[i + j + 1] = acc[i + j + 1] + (mp[j] >> LIMB_BITS)
    limbs = []
    for j in range(N_LIMBS, N_ACC - 1):
        v = acc[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    v = acc[N_ACC - 1] + carry
    limbs.append(v & _mask)  # 17th limb: result < (1 + t*p/R)p ~ 7p
    x = jnp.stack(limbs[:N_LIMBS], axis=0)
    extra = limbs[N_LIMBS]
    # conditional 8p/4p/2p/p ladder over the 17-limb value (same bound
    # handling as _reduce_sum_mod)
    for mult in (8, 4, 2, 1):
        pm = P_INT * mult
        pm_limbs = [
            (pm >> (LIMB_BITS * j)) & LIMB_MASK for j in range(N_LIMBS + 1)
        ]
        borrow = jnp.zeros_like(x[0])
        diff = []
        for j in range(N_LIMBS):
            s = jnp.uint32(pm_limbs[j]) + borrow
            d = x[j] - s
            borrow = (x[j] < s).astype(jnp.uint32)
            diff.append(d & _mask)
        extra_after = extra - jnp.uint32(pm_limbs[N_LIMBS]) - borrow
        ge = extra >= jnp.uint32(pm_limbs[N_LIMBS]) + borrow
        x = jnp.where(ge, jnp.stack(diff, axis=0), x)
        extra = jnp.where(ge, extra_after, extra)
    return x


def _zero_acc(shape):
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return [z] * N_ACC


def _sub_if_ge(x):
    borrow = jnp.zeros_like(x[0])
    diff = []
    for j in range(N_LIMBS):
        s = jnp.uint32(P_LIMBS[j]) + borrow
        d = x[j] - s
        borrow = (x[j] < s).astype(jnp.uint32)
        diff.append(d & _mask)
    return jnp.where(borrow == 0, jnp.stack(diff, axis=0), x)


def _add_const_ref(x, c_ref, base):
    """x + constant with limbs read as SMEM scalars c_ref[base + j]."""
    limbs, carry = [], jnp.zeros_like(x[0])
    for j in range(N_LIMBS):
        v = x[j] + c_ref[base + j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    return _sub_if_ge(jnp.stack(limbs, axis=0))


def _add_mod(a, b):
    """(a + b) mod p on [16, R, 128] canonical-limb values."""
    limbs, carry = [], jnp.zeros_like(a[0])
    for j in range(N_LIMBS):
        v = a[j] + b[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    return _sub_if_ge(jnp.stack(limbs, axis=0))


def _sbox(x, scratch):
    """x^5 via the scratch ref (multiplier must be ref-sliceable)."""
    scratch[:] = x
    x2 = _montmul_val_ref(x, scratch)
    scratch[:] = x2
    x4 = _montmul_val_ref(x2, scratch)
    scratch[:] = x
    return _montmul_val_ref(x4, scratch)


def _reduce_sum_mod(parts):
    """Sum of t canonical elements (u32 adds stay exact: t*2^16 < 2^32)
    then carry-normalize and conditionally subtract 8R/4R/2R/R."""
    acc = parts[0]
    for p_ in parts[1:]:
        acc = acc + p_
    limbs, carry = [], jnp.zeros_like(acc[0])
    for j in range(N_LIMBS):
        v = acc[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    # t < 16 so the total < 16p < 2^260: one extra limb of carry
    extra = carry  # < 2^4
    x = jnp.stack(limbs, axis=0)
    for mult in (8, 4, 2, 1):
        pm = P_INT * mult
        pm_limbs = [(pm >> (LIMB_BITS * j)) & LIMB_MASK for j in range(N_LIMBS + 1)]
        borrow = jnp.zeros_like(x[0])
        diff = []
        for j in range(N_LIMBS):
            s = jnp.uint32(pm_limbs[j]) + borrow
            d = x[j] - s
            borrow = (x[j] < s).astype(jnp.uint32)
            diff.append(d & _mask)
        extra_after = extra - jnp.uint32(pm_limbs[N_LIMBS]) - borrow
        ge = extra >= jnp.uint32(pm_limbs[N_LIMBS]) + borrow
        x = jnp.where(ge, jnp.stack(diff, axis=0), x)
        extra = jnp.where(ge, extra_after, extra)
    return x


def _make_permute_kernel(arity: int):
    c = poseidon_constants(arity)
    t = c.t
    r_f_half = c.r_f // 2
    r_p = c.r_p
    rounds = c.r_f + c.r_p

    def kernel(state_ref, rc_ref, mds_ref, sp_ref, dl_ref, out_ref, scratch):
        # state [t, 16, R, 128] as a list of t elements
        state = [state_ref[i] for i in range(t)]

        def full_round(r, state):
            new = []
            for i in range(t):
                e = _add_const_ref(state[i], rc_ref, (r * t + i) * N_LIMBS)
                new.append(_sbox(e, scratch))
            return _mix(new, mds_ref)

        def sparse_round(k, state):
            # ARC (pre-transformed c') + sbox(elem0) + sparse mix E_k:
            # out0 = m00*x0 + sum v_j*x_{j+1}; out_i = w_hat_i*x0 + x_i.
            # sp row layout: [m00, v[0..t-2], w_hat[0..t-2]].
            new = [
                _add_const_ref(
                    state[i], rc_ref, ((r_f_half + k) * t + i) * N_LIMBS
                )
                for i in range(t)
            ]
            new[0] = _sbox(new[0], scratch)
            row = k * (2 * t - 1)
            acc = _zero_acc(new[0].shape[1:])
            acc = _acc_mul_const(acc, new[0], sp_ref, row * N_LIMBS)
            for j in range(t - 1):
                acc = _acc_mul_const(
                    acc, new[j + 1], sp_ref, (row + 1 + j) * N_LIMBS
                )
            outs = [_redc_wide(acc)]
            for i in range(t - 1):
                wi = _montmul_const(new[0], sp_ref, (row + t + i) * N_LIMBS)
                outs.append(_add_mod(wi, new[i + 1]))
            return outs

        def _mix(elems, m_ref):
            # accumulate-then-REDC: one shared Montgomery reduction per
            # output row instead of t full CIOS reductions
            mixed = []
            for i in range(t):
                acc = _zero_acc(elems[0].shape[1:])
                for j in range(t):
                    acc = _acc_mul_const(
                        acc, elems[j], m_ref, (i * t + j) * N_LIMBS
                    )
                mixed.append(_redc_wide(acc))
            return mixed

        def run(state_stack, lo, hi, fn):
            def body(r, s):
                lst = [s[i] for i in range(t)]
                return jnp.stack(fn(r, lst), axis=0)

            return jax.lax.fori_loop(lo, hi, body, state_stack)

        s = jnp.stack(state, axis=0)
        s = run(s, 0, r_f_half, full_round)
        s = run(s, 0, r_p, sparse_round)
        # fold the accumulated dense residue D_P in one mix
        s = jnp.stack(_mix([s[i] for i in range(t)], dl_ref), axis=0)
        s = run(s, r_f_half + r_p, rounds, full_round)
        out_ref[:] = s

    return kernel, t, rounds


@lru_cache(maxsize=None)
def _staged(arity: int):
    from ..poseidon import optimized_partial_schedule

    c = poseidon_constants(arity)
    mont = lambda vals: FR.to_limbs([(v * FR.mont_r) % P_INT for v in vals])
    rc = mont(c.round_constants).reshape(c.r_f + c.r_p, c.t, N_LIMBS)
    mds = mont([v for row in c.mds for v in row]).reshape(c.t, c.t, N_LIMBS)
    tag = mont([c.domain_tag]).reshape(N_LIMBS)
    # sparse partial-round schedule: c' replaces the partial rc rows;
    # sp rows are [m00, v..., w_hat...]; d_last is the trailing dense mix
    c_prime, m00s, vs, w_hats, d_last = optimized_partial_schedule(arity)
    half_f = c.r_f // 2
    rc = rc.copy()
    rc[half_f : half_f + c.r_p] = mont(
        [x for row in c_prime for x in row]
    ).reshape(c.r_p, c.t, N_LIMBS)
    sp = mont(
        [
            x
            for k in range(c.r_p)
            for x in ([m00s[k]] + list(vs[k]) + list(w_hats[k]))
        ]
    ).reshape(c.r_p, 2 * c.t - 1, N_LIMBS)
    dl = mont([v for row in d_last for v in row]).reshape(c.t, c.t, N_LIMBS)
    return rc, mds, sp, dl, tag


# ---------------------------------------------------------------------------
# MXU variant: every constant linear map (dense MDS mix, sparse-round
# out0 row, w_hat column) is a matmul over 8-bit limb planes on the
# systolic array; the VPU keeps only the data-dependent work (S-boxes,
# Montgomery reductions, carries). Exactness: bf16 operands hold 8-bit
# limbs (<= 255, exactly representable); every f32 partial sum is an
# integer < 2^24 because the contraction is chunked at K <= 192 rows
# (192 * 255^2 = 1.25e7 < 2^24), and chunk results are added in u32.
# ---------------------------------------------------------------------------

MXU_ROWS = 8  # lane rows per block (Mosaic: 2nd-minor block dim % 8)
MXU_BLOCK = MXU_ROWS * 128
_K_CHUNK = 192


def _const_bytes(v: int) -> list[int]:
    return [(v >> (8 * m)) & 0xFF for m in range(32)]


def _lin_rows(consts: list[int]) -> np.ndarray:
    """One OUTPUT element's 64 byte-columns from len(consts) INPUT
    elements. Input byte-plane row order within an element is
    [lo0..lo15, hi0..hi15] (limb k low byte at row k, high byte at row
    16+k -> byte position 2k / 2k+1), so _to_bytes_bf16 is a plain
    concat with no interleave relayout: A[c8, j*32 + r] =
    byte_{c8 - pos(r)}(consts[j])."""
    K = 32 * len(consts)
    A = np.zeros((64, K), np.float32)
    for j, v in enumerate(consts):
        b = _const_bytes(v)
        for r in range(32):
            q = 2 * r if r < 16 else 2 * (r - 16) + 1
            for m in range(32):
                A[q + m, j * 32 + r] = b[m]
    return A


@lru_cache(maxsize=None)
def _staged_mxu(arity: int):
    from ..poseidon import optimized_partial_schedule

    c = poseidon_constants(arity)
    t = c.t
    mont = lambda v: (v * FR.mont_r) % P_INT
    c_prime, m00s, vs, w_hats, d_last = optimized_partial_schedule(arity)

    def mix_matrix(rows):
        # [t*64, t*32]: output i's 64 byte-cols from all t inputs
        return np.concatenate(
            [_lin_rows([mont(v) for v in row]) for row in rows], axis=0
        )

    w_full = mix_matrix(c.mds)
    w_dl = mix_matrix(d_last)
    # sparse round k: A1 [64, t*32] = [m00_k, v_k...] over all t elems;
    # A2 [(t-1)*64, 32] = w_hat_i over x0 only
    w1 = np.stack(
        [
            _lin_rows([mont(m00s[k])] + [mont(v) for v in vs[k]])
            for k in range(c.r_p)
        ]
    )
    w2 = np.stack(
        [
            np.concatenate(
                [_lin_rows([mont(w)]) for w in w_hats[k]], axis=0
            )
            for k in range(c.r_p)
        ]
    )
    # pad K (lane dim in storage) 32 -> 128: HBM DMA slices must be
    # tile-aligned; the kernel feeds a matching zero-padded B block
    w2 = np.pad(w2, ((0, 0), (0, 0), (0, 128 - w2.shape[2])))
    import ml_dtypes

    # host numpy (NOT jnp): _staged_mxu is reached inside jit traces,
    # and lru_cached device arrays born there escape as tracers
    bf = lambda a: np.asarray(a, dtype=ml_dtypes.bfloat16)
    return bf(w_full), bf(w_dl), bf(w1), bf(w2)


def _to_bytes_bf16(elems):
    """t canonical [16, R, 128] u32 elements -> [t*32, R, 128] bf16 of
    8-bit limbs (byte-major within each element)."""
    planes = []
    for x in elems:
        lo = x & jnp.uint32(0xFF)
        hi = x >> 8
        # row order [lo0..lo15, hi0..hi15] (matches _lin_rows)
        planes.append(jnp.concatenate([lo, hi], axis=0))
    cat = jnp.concatenate(planes, axis=0)
    # Mosaic has no u32->bf16 cast; route through i32 -> f32 (exact:
    # values <= 255)
    return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _mxu_matmul(A, B):
    """A [M, K] bf16 weights, B [K, R, 128] bf16 byte planes -> [M, R,
    128] u32, exact (K-chunked f32 accumulation)."""
    K = A.shape[1]
    out = None
    for k0 in range(0, K, _K_CHUNK):
        part = jax.lax.dot_general(
            A[:, k0 : k0 + _K_CHUNK],
            B[k0 : k0 + _K_CHUNK],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)
        out = part if out is None else out + part
    return out


def _recombine16(o8, i):
    """Byte-column matmul output rows [64] at output index i -> wide
    33-column 16-bit-basis accumulator list (for _redc_wide)."""
    base = i * 64
    acc = []
    for cc in range(32):  # 64 byte-cols -> 32 16-bit cols
        v = o8[base + 2 * cc]
        v = v + ((o8[base + 2 * cc + 1] & jnp.uint32(0xFF)) << 8)
        if cc > 0:
            v = v + (o8[base + 2 * cc - 1] >> 8)
        acc.append(v)
    # col 32: only the carry out of byte-col 63, which is always zero
    # (byte products reach col8 <= 62)
    return acc + [jnp.zeros_like(acc[0])] * (N_ACC - 32)


def _make_permute_kernel_mxu(arity: int):
    c = poseidon_constants(arity)
    t = c.t
    r_f_half = c.r_f // 2
    r_p = c.r_p
    rounds = c.r_f + c.r_p

    def kernel(
        state_ref, rc_ref, wf_ref, wdl_ref, w1_ref, w2_ref, out_ref,
        scratch, w2_buf, w2_sem,
    ):
        def mix_mxu(elems, w_ref):
            # M-chunked: dot + REDC two output elements (128 rows) at a
            # time so the f32 matmul output never materializes at
            # [t*64, R, 128] (the full-width form blew the 16M VMEM
            # scoped-stack limit at t=12)
            B = _to_bytes_bf16(elems)
            outs = []
            for i0 in range(0, t, 2):
                hi = min(i0 + 2, t)
                o8 = _mxu_matmul(w_ref[i0 * 64 : hi * 64], B)
                for i in range(hi - i0):
                    outs.append(_redc_wide(_recombine16(o8, i)))
            return outs

        def full_round(r, state):
            new = []
            for i in range(t):
                e = _add_const_ref(state[i], rc_ref, (r * t + i) * N_LIMBS)
                new.append(_sbox(e, scratch))
            return mix_mxu(new, wf_ref)

        def sparse_round(k, state):
            new = [
                _add_const_ref(
                    state[i], rc_ref, ((r_f_half + k) * t + i) * N_LIMBS
                )
                for i in range(t)
            ]
            # w_hat weights for this round stream HBM -> VMEM (resident
            # storage would tile-pad [57,(t-1)*64,32] bf16 to ~10MB)
            dma = pltpu.make_async_copy(w2_ref.at[k], w2_buf, w2_sem)
            dma.start()
            new[0] = _sbox(new[0], scratch)
            B = _to_bytes_bf16(new)
            o1 = _mxu_matmul(w1_ref[k], B)  # [64, R, 128] out0 wide
            dma.wait()
            # B rows beyond x0's 32 are zero-weighted (w2 K-pad)
            b2 = jnp.concatenate(
                [B[:32], jnp.zeros((96,) + B.shape[1:], B.dtype)], axis=0
            )
            outs = [_redc_wide(_recombine16(o1, 0))]
            for i0 in range(0, t - 1, 2):  # M-chunked like mix_mxu
                hi = min(i0 + 2, t - 1)
                o2 = _mxu_matmul(w2_buf[i0 * 64 : hi * 64], b2)
                for i in range(hi - i0):
                    wi = _redc_wide(_recombine16(o2, i))
                    outs.append(_add_mod(wi, new[i0 + i + 1]))
            return outs

        def run(state_stack, lo, hi, fn):
            def body(r, s):
                lst = [s[i] for i in range(t)]
                return jnp.stack(fn(r, lst), axis=0)

            return jax.lax.fori_loop(lo, hi, body, state_stack)

        s = jnp.stack([state_ref[i] for i in range(t)], axis=0)
        s = run(s, 0, r_f_half, full_round)
        s = run(s, 0, r_p, sparse_round)
        s = jnp.stack(mix_mxu([s[i] for i in range(t)], wdl_ref), axis=0)
        s = run(s, r_f_half + r_p, rounds, full_round)
        out_ref[:] = s

    return kernel, t, rounds


@partial(jax.jit, static_argnames=("arity",))
def permute_soa_mxu(states, arity: int):
    """MXU-mix variant of permute_soa. states: [t, 16, N] SoA
    Montgomery; N a multiple of MXU_BLOCK."""
    kernel, t, rounds = _make_permute_kernel_mxu(arity)
    rc, _, _, _, _ = _staged(arity)
    wf, wdl, w1, w2 = _staged_mxu(arity)
    N = states.shape[2]
    assert N % MXU_BLOCK == 0
    s3 = states.reshape(t, N_LIMBS, N // 128, 128)
    grid = (N // MXU_BLOCK,)
    state_spec = pl.BlockSpec(
        (t, N_LIMBS, MXU_ROWS, 128), lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    rc_flat = np.asarray(rc).reshape(-1)
    vmem_all = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (t, N_LIMBS, N // 128, 128), jnp.uint32
        ),
        grid=grid,
        in_specs=[
            state_spec,
            pl.BlockSpec(
                (rc_flat.size,), lambda i: (0,), memory_space=pltpu.SMEM
            ),
            vmem_all(wf),
            vmem_all(wdl),
            vmem_all(w1),
            pl.BlockSpec(memory_space=pltpu.ANY),  # w2 stays in HBM
        ],
        out_specs=state_spec,
        scratch_shapes=[
            pltpu.VMEM((N_LIMBS, MXU_ROWS, 128), jnp.uint32),
            pltpu.VMEM(w2.shape[1:], jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() == "cpu",
    )(s3, jnp.asarray(rc_flat), wf, wdl, w1, w2)
    return out.reshape(t, N_LIMBS, N)


@partial(jax.jit, static_argnames=("arity",))
def permute_soa(states, arity: int):
    """states: [t, 16, N] SoA Montgomery; N a multiple of POS_BLOCK.
    Returns the permuted states, same layout."""
    kernel, t, rounds = _make_permute_kernel(arity)
    rc, mds, sp, dl, _ = _staged(arity)
    N = states.shape[2]
    assert N % POS_BLOCK == 0
    s3 = states.reshape(t, N_LIMBS, N // 128, 128)
    grid = (N // POS_BLOCK,)
    state_spec = pl.BlockSpec(
        (t, N_LIMBS, POS_ROWS, 128), lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    # constants go to SMEM FLAT: SMEM windows tile-pad the trailing two
    # dims to (8,128), so a [57,17,16] window would eat 684K of the 1M
    smem = lambda size: pl.BlockSpec(
        (size,), lambda i: (0,), memory_space=pltpu.SMEM
    )
    consts = [np.asarray(x).reshape(-1) for x in (rc, mds, sp, dl)]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (t, N_LIMBS, N // 128, 128), jnp.uint32
        ),
        grid=grid,
        in_specs=[state_spec] + [smem(c.size) for c in consts],
        out_specs=state_spec,
        scratch_shapes=[pltpu.VMEM((N_LIMBS, POS_ROWS, 128), jnp.uint32)],
        interpret=jax.default_backend() == "cpu",
    )(s3, *[jnp.asarray(c) for c in consts])
    return out.reshape(t, N_LIMBS, N)


def _kernel_choice(kernel: str) -> str:
    if kernel == "auto":
        import os

        return os.environ.get("FIL_PROOFS_POSEIDON_KERNEL", "mxu")
    return kernel


def hash_mont_soa(preimages, arity: int, kernel: str = "auto"):
    """preimages: [arity, 16, N] SoA Montgomery. Returns [16, N] digests
    (Merkle domain tag in state[0]; digest = state[1]). kernel: "vpu"
    (limb VPU mix) | "mxu" (systolic-array linear maps) | "auto"
    (FIL_PROOFS_POSEIDON_KERNEL, default mxu)."""
    tag = _staged(arity)[-1]
    N = preimages.shape[2]
    tag_plane = jnp.broadcast_to(
        jnp.asarray(tag)[None, :, None], (1, N_LIMBS, N)
    )
    states = jnp.concatenate([tag_plane, preimages], axis=0)
    permute = (
        permute_soa_mxu if _kernel_choice(kernel) == "mxu" else permute_soa
    )
    out = permute(states, arity)
    return out[1]


def hash_level_packed(nodes, arity: int, kernel: str = "auto"):
    """[N, 16] packed Montgomery nodes -> [N//arity, 16] parents via the
    pallas kernel (pads the batch up to POS_BLOCK internally; POS_BLOCK
    is a multiple of MXU_BLOCK so both kernels accept the padded
    batch)."""
    n = nodes.shape[0]
    assert n % arity == 0
    batch = n // arity
    pre = nodes.reshape(batch, arity, N_LIMBS).transpose(1, 2, 0)
    pad = (-batch) % POS_BLOCK
    if pad:
        pre = jnp.concatenate(
            [pre, jnp.zeros((arity, N_LIMBS, pad), jnp.uint32)], axis=2
        )
    out = hash_mont_soa(pre, arity, kernel=kernel)
    return out[:, :batch].T
