"""Pallas four-step NTT over BLS12-381 Fr (SoA limb planes).

The XLA radix-2 transform (ops/ntt.py) runs at ~148 ms for 2^20 — 42x
its own HBM roofline — because every [n, 16] intermediate materializes
with a 16-wide minor dim (1/8 lane utilization) and each stage's
Montgomery multiply spills ~30 temporaries to HBM. Here the transform
is two pallas kernels + one tile transpose:

  fwd (natural coeffs -> P-order evals):   DIF stages along the leading
       axis of [16, R, C] (lanes = C), post-multiplied by the
       bitrev-baked inter-step twiddle table; transpose (R <-> C);
       DIF stages again (lanes = R).
  inv (P-order evals -> natural coeffs):   the exact mirror with DIT
       stages and inverse twiddles; 1/n is baked into the inverse
       inter-step table.

P (a fixed bitrev-block permutation, scripts/proto_ntt4.py) never
materializes: the Groth16 h(x) pipeline is pointwise between a forward
and an inverse transform, and Z_H is constant on the coset, so only
natural-order endpoints matter (zk/groth16.py h path; reference
consumed crypto3-fft / r1cs_gg_ppzsnark prover, SURVEY §2.9 P6).

All state is SoA [16, n] u32 16-bit limbs (8,128)-tiled; butterflies
pair LEADING-axis positions so every reshape between stages is free.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bls12_381 import FR_MULT_GEN, R as MOD
from ..fr_limbs import FR, LIMB_BITS, LIMB_MASK
from ..ntt import _bit_reverse_indices, _root_of_unity

N_LIMBS = FR.n  # 16
N0INV = int(FR.n0inv)
P_LIMBS = [int(v) for v in FR.p_np]
P_INT = FR.modulus
_mask = LIMB_MASK

LANE_CHUNK = 128


# -------------------------------------------------------------------------
# in-kernel field helpers on [..., 16(axis0), pos..., 128] SoA values
# -------------------------------------------------------------------------


def _sub_if_ge(limbs):
    """Conditional x - p on a list of 16 limb rows."""
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for j in range(N_LIMBS):
        s = jnp.uint32(P_LIMBS[j]) + borrow
        d = limbs[j] - s
        borrow = (limbs[j] < s).astype(jnp.uint32)
        diff.append(d & _mask)
    ge = borrow == 0
    return [jnp.where(ge, diff[j], limbs[j]) for j in range(N_LIMBS)]


def _add_mod(a, b):
    limbs, carry = [], jnp.zeros_like(a[0])
    for j in range(N_LIMBS):
        v = a[j] + b[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    return _sub_if_ge(limbs)


def _sub_mod(a, b):
    """a - b mod p via a + (p - b)."""
    # p - b (b canonical < p; b == 0 -> p, folded by _sub_if_ge after add)
    borrow = jnp.zeros_like(a[0])
    pb = []
    for j in range(N_LIMBS):
        s = b[j] + borrow
        d = jnp.uint32(P_LIMBS[j]) - s
        borrow = (jnp.uint32(P_LIMBS[j]) < s).astype(jnp.uint32)
        pb.append(d & _mask)
    return _add_mod(a, pb)


def _cios(a, limb_at):
    """Unrolled CIOS over limb-row lists; limb_at(i) -> multiplier limb
    row (broadcastable against a[0])."""
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
    return _sub_if_ge(limbs)


# -------------------------------------------------------------------------
# stage kernel: DIF or DIT chain along the leading position axis
# -------------------------------------------------------------------------


def _make_stage_kernel(log_l: int, halves: tuple, dif: bool, table: str,
                       lanes: int = LANE_CHUNK):
    """Kernel over state [16, L, 128]: a GROUP of radix-2 stages along
    axis 1 (`halves` = the half-width of each stage in order). One
    fully-unrolled 10-stage kernel blew Mosaic's scoped-VMEM accounting
    (~130MB conservative live-range sum at L=1024), so _stages launches
    groups of a few stages and lets the state round-trip through HBM
    between groups — ~128MB extra traffic per group boundary at 2^20,
    noise next to the montmul compute.

    dif=True : natural in, bitrev out; butterfly (u+v, (u-v)*w).
    dif=False: bitrev in, natural out; butterfly (u+t, u-t), t = v*w.
    table="post": elementwise montmul by a same-shaped table after the
    stages (forward inter-step twiddle); "pre": before the stages (the
    inverse undoes that twiddle before its DIT chain); "none".
    Twiddles: tw_ref [16, L] — the length-m stage uses columns
    [h, 2h) (omega_m^j for j < h = m/2), loaded once as a value.
    """
    L = 1 << log_l

    def kernel(*refs):
        if table != "none":
            state_ref, tw_ref, tbl_ref, out_ref = refs
        else:
            state_ref, tw_ref, out_ref = refs
        a = [state_ref[j] for j in range(N_LIMBS)]  # 16 x [L, 128]
        twv = tw_ref[...]  # [16, L]

        if table == "pre":
            tv = [tbl_ref[j] for j in range(N_LIMBS)]
            a = _cios(a, lambda i: tv[i])

        for h in halves:
            m = 2 * h
            # [L, lanes] -> [L/m, m, lanes]; split top/bottom halves
            u = [x.reshape(L // m, m, lanes)[:, :h] for x in a]
            v = [x.reshape(L // m, m, lanes)[:, h:] for x in a]
            tw = lambda i: twv[i, h : 2 * h][None, :, None]
            if dif:
                top = _add_mod(u, v)
                bot = _cios(_sub_mod(u, v), tw)
            else:
                t = _cios(v, tw)
                top = _add_mod(u, t)
                bot = _sub_mod(u, t)
            a = [
                jnp.concatenate([tp, bt], axis=1).reshape(L, lanes)
                for tp, bt in zip(top, bot)
            ]
        if table == "post":
            tv = [tbl_ref[j] for j in range(N_LIMBS)]
            a = _cios(a, lambda i: tv[i])
        for j in range(N_LIMBS):
            out_ref[j] = a[j]

    return kernel


# v5e VMEM is 128MB; Mosaic's conservative live-range sum for the
# unrolled CIOS chain costs ~60MB per stage at L=1024 (3 stages hit
# 182MB), so one stage per call — the extra HBM round-trips are ~4ms
# of traffic across the whole 2^20 transform
STAGES_PER_CALL = 1

# Row tile for the constant-VMEM stage kernels below. The whole-L
# window kernel above measured 165.86MB scoped VMEM at L=1024 (133MB
# register-allocator spill from the unrolled CIOS over a [1024, 128]
# block + 2x-buffered 16MB windows) — v5e hard-fails over 128MB, and
# production h-domains (2^24 -> L=4096) would blow on windows alone.
ROW_TILE = 128


def _butterfly(u, v, tw, dif):
    if dif:
        return _add_mod(u, v), _cios(_sub_mod(u, v), tw)
    t = _cios(v, tw)
    return _add_mod(u, t), _sub_mod(u, t)


def _make_blocked_kernel(h: int, br: int, dif: bool):
    """Single-window stage kernel for SMALL strides (m = 2h <= br):
    block rows `br` of state, butterfly groups resolved by reshape
    inside the block. Grid (L/br, C/lanes); VMEM = 2x-buffered
    in/out windows + CIOS temps over [br, lanes] — constant in L."""
    m = 2 * h

    def kernel(state_ref, tw_ref, out_ref):
        a = [state_ref[j] for j in range(N_LIMBS)]  # 16 x [br, lanes]
        twv = tw_ref[...]  # [16, L]
        lanes = a[0].shape[-1]
        u = [x.reshape(br // m, m, lanes)[:, :h] for x in a]
        v = [x.reshape(br // m, m, lanes)[:, h:] for x in a]
        tw = lambda i: twv[i, h : 2 * h][None, :, None]
        top, bot = _butterfly(u, v, tw, dif)
        for j in range(N_LIMBS):
            out_ref[j] = jnp.concatenate([top[j], bot[j]], axis=1).reshape(
                br, lanes
            )

    return kernel


def _make_split_kernel(dif: bool):
    """Two-window stage kernel for LARGE strides (h >= ROW_TILE): the
    u and v butterfly halves arrive through separate block-indexed
    windows, the twiddle block carries exactly this tile's columns,
    and top/bot leave through two outputs (interleaved back to state
    layout by XLA in _stage_call). Constant VMEM at any L."""

    def kernel(u_ref, v_ref, tw_ref, top_ref, bot_ref):
        u = [u_ref[j] for j in range(N_LIMBS)]  # [ROW_TILE, lanes]
        v = [v_ref[j] for j in range(N_LIMBS)]
        twv = tw_ref[...]  # [ROW_TILE, 16] (transposed block)
        tw = lambda i: twv[:, i : i + 1]
        top, bot = _butterfly(u, v, tw, dif)
        for j in range(N_LIMBS):
            top_ref[j] = top[j]
            bot_ref[j] = bot[j]

    return kernel


def _stage_call(state, tw, tbl, log_l, halves, dif, table):
    L = 1 << log_l
    C = state.shape[2]
    # lanes: 128 for the full-width single-chip transform; smaller
    # power-of-two widths appear for the LOCAL blocks of the sharded
    # four-step (C/D lanes per device) — Mosaic pads narrow lanes on
    # TPU, and the CPU interpret path doesn't care
    lanes = min(LANE_CHUNK, C)
    interp = jax.default_backend() == "cpu"
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))

    if table == "none" and len(halves) == 1:
        h = halves[0]
        m = 2 * h
        br = min(ROW_TILE, L)
        if m <= br:
            # small stride: butterfly within a row block
            spec = pl.BlockSpec(
                (N_LIMBS, br, lanes), lambda r, c: (0, r, c),
                memory_space=pltpu.VMEM,
            )
            tw_spec = pl.BlockSpec(
                (N_LIMBS, L), lambda r, c: (0, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                _make_blocked_kernel(h, br, dif),
                out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
                grid=(L // br, C // lanes),
                in_specs=[spec, tw_spec],
                out_specs=spec,
                compiler_params=params,
                interpret=interp,
            )(state, tw)
        # large stride (h >= ROW_TILE): two-window butterfly halves
        G, J, HT = L // m, h // ROW_TILE, h // ROW_TILE
        blk = lambda off: pl.BlockSpec(
            (N_LIMBS, ROW_TILE, lanes),
            lambda g, j, c, o=off: (0, g * (m // ROW_TILE) + o + j, c),
            memory_space=pltpu.VMEM,
        )
        tw_spec = pl.BlockSpec(
            (ROW_TILE, N_LIMBS), lambda g, j, c: (HT + j, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (N_LIMBS, ROW_TILE, lanes),
            lambda g, j, c: (0, g * HT + j, c),
            memory_space=pltpu.VMEM,
        )
        half_shape = jax.ShapeDtypeStruct((N_LIMBS, L // 2, C), jnp.uint32)
        top, bot = pl.pallas_call(
            _make_split_kernel(dif),
            out_shape=(half_shape, half_shape),
            grid=(G, J, C // lanes),
            in_specs=[blk(0), blk(HT), tw_spec],
            out_specs=(out_spec, out_spec),
            compiler_params=params,
            interpret=interp,
        )(state, state, jnp.transpose(tw))
        # interleave [top_g ; bot_g] per group back to state layout
        t4 = top.reshape(N_LIMBS, G, h, C)
        b4 = bot.reshape(N_LIMBS, G, h, C)
        return jnp.stack([t4, b4], axis=2).reshape(N_LIMBS, L, C)

    # fused-table fallback (sub-1024-element local blocks only): the
    # whole-L window kernel — small L keeps it inside VMEM
    spec = pl.BlockSpec(
        (N_LIMBS, L, lanes), lambda i: (0, 0, i),
        memory_space=pltpu.VMEM,
    )
    tw_spec = pl.BlockSpec(
        (N_LIMBS, L), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [spec, tw_spec] + ([spec] if table != "none" else [])
    args = (state, tw) + ((tbl,) if table != "none" else ())
    return pl.pallas_call(
        _make_stage_kernel(log_l, halves, dif, table, lanes),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        grid=(C // lanes,),
        in_specs=in_specs,
        out_specs=spec,
        compiler_params=params,
        interpret=interp,
    )(*args)


def _stages_ref(state, tw, tbl, log_l, dif, table):
    """XLA reference of the stage chain — the same butterflies/tables
    as the kernel, expressed through fr_ops (whose compact fori_loop
    CIOS keeps XLA:CPU compiles tractable; the fully-unrolled interpret
    kernel costs ~40s compile per 3 stages). Bit-identical to the
    pallas path: all reductions land canonical (< p)."""
    from ..fr_limbs import fr_ops

    L = 1 << log_l
    C = state.shape[2]
    x = jnp.transpose(state, (1, 2, 0))  # [L, C, 16]
    tw_aos = jnp.transpose(tw)  # [L, 16]
    tbl_aos = (
        jnp.transpose(tbl.reshape(N_LIMBS, L, C), (1, 2, 0))
        if table != "none"
        else None
    )
    if table == "pre":
        x = fr_ops.mont_mul(x, tbl_aos)
    halves = (
        [1 << (k - 1) for k in range(log_l, 0, -1)]
        if dif
        else [1 << k for k in range(log_l)]
    )
    for h in halves:
        m = 2 * h
        xb = x.reshape(L // m, m, C, N_LIMBS)
        u, v = xb[:, :h], xb[:, h:]
        w = tw_aos[h : 2 * h][None, :, None, :]
        if dif:
            top = fr_ops.add(u, v)
            bot = fr_ops.mont_mul(fr_ops.sub(u, v), w)
        else:
            t = fr_ops.mont_mul(v, w)
            top = fr_ops.add(u, t)
            bot = fr_ops.sub(u, t)
        x = jnp.concatenate([top, bot], axis=1).reshape(L, C, N_LIMBS)
    if table == "post":
        x = fr_ops.mont_mul(x, tbl_aos)
    return jnp.transpose(x, (2, 0, 1))


@partial(jax.jit, static_argnames=("log_l", "dif", "table"))
def _stages(state, tw, tbl, log_l, dif, table):
    """state [16, L, C]; optional pre/post table same shape; grid over
    C lane chunks. Stages run in groups of STAGES_PER_CALL pallas
    calls (see _make_stage_kernel). Off-TPU the chain runs through the
    _stages_ref XLA twin instead of interpret mode (same math, compact
    field kernels — interpret compiles were the r5 dryrun wall)."""
    if jax.default_backend() == "cpu":
        return _stages_ref(state, tw, tbl, log_l, dif, table)
    # the pre/post inter-step table rides the standalone elementwise
    # kernel, NOT fused into a stage call: one stage's unrolled CIOS
    # already costs ~60MB of Mosaic scoped VMEM at L=1024, and fusing
    # the table's second CIOS chain pushed the call past the 100MB
    # limit (v5e scoped-allocation failure at 2^20, BENCH r5)
    shape = state.shape
    n_flat = shape[1] * shape[2]
    split_tbl = table != "none" and n_flat % 1024 == 0
    flat = lambda t: t.reshape(N_LIMBS, -1)
    if split_tbl and table == "pre":
        state = fr_mul_soa(flat(state), flat(tbl)).reshape(shape)
    all_halves = (
        [1 << (k - 1) for k in range(log_l, 0, -1)]
        if dif
        else [1 << k for k in range(log_l)]
    )
    groups = [
        tuple(all_halves[i : i + STAGES_PER_CALL])
        for i in range(0, len(all_halves), STAGES_PER_CALL)
    ]
    for gi, halves in enumerate(groups):
        first, last = gi == 0, gi == len(groups) - 1
        t = "none"
        if not split_tbl:
            t = (
                "pre" if (table == "pre" and first)
                else "post" if (table == "post" and last)
                else "none"
            )
        state = _stage_call(
            state, tw, None if t == "none" else tbl, log_l, halves, dif, t
        )
    if split_tbl and table == "post":
        state = fr_mul_soa(flat(state), flat(tbl)).reshape(shape)
    return state


# elementwise montmul a*b (SoA [16, N]) — also reused by the h pipeline
def _mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[j] for j in range(N_LIMBS)]
    b = [b_ref[j] for j in range(N_LIMBS)]
    out = _cios(a, lambda i: b[i])
    for j in range(N_LIMBS):
        o_ref[j] = out[j]


@jax.jit
def fr_mul_soa(a, b):
    """Elementwise Montgomery product of SoA [16, N] arrays (N a
    multiple of 1024; grid-chunked)."""
    N = a.shape[1]
    rows = 512
    while N % (rows * LANE_CHUNK):
        rows //= 2
    assert rows >= 8, N
    chunk = rows * LANE_CHUNK
    a3 = a.reshape(N_LIMBS, N // LANE_CHUNK, LANE_CHUNK)
    b3 = b.reshape(N_LIMBS, N // LANE_CHUNK, LANE_CHUNK)
    spec = pl.BlockSpec(
        (N_LIMBS, rows, LANE_CHUNK), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
        grid=(N // chunk,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() == "cpu",
    )(a3, b3)
    return out.reshape(N_LIMBS, N)


# -------------------------------------------------------------------------
# plans: twiddle + inter-step tables
# -------------------------------------------------------------------------


def _mont(v: int) -> int:
    return (v * FR.mont_r) % P_INT


def _stage_tw_table(omega: int, log_l: int) -> np.ndarray:
    """[16, L] flat: rows [h, 2h) hold omega_m^j (m = 2h) in Montgomery
    form; row 0 unused."""
    L = 1 << log_l
    vals = [0] * L
    for h in (1 << k for k in range(log_l)):
        m = 2 * h
        wm = pow(omega, L // m, MOD)
        w = 1
        for j in range(h):
            vals[h + j] = _mont(w)
            w = (w * wm) % MOD
    return FR.to_limbs(vals).T.copy()  # [16, L]


def _soa(vals: list[int]) -> np.ndarray:
    return FR.to_limbs(vals).T.copy()


@lru_cache(maxsize=None)
def _plan(log_n: int):
    """Split log_n = logR + logC (both <= 10; R >= C), build all tables
    host-side (numpy — this is reached inside jit traces)."""
    logR = (log_n + 1) // 2
    logC = log_n - logR
    R_, C_ = 1 << logR, 1 << logC
    n = R_ * C_
    wN = _root_of_unity(log_n)
    wNi = pow(wN, MOD - 2, MOD)
    wR, wC = pow(wN, C_, MOD), pow(wN, R_, MOD)
    wRi, wCi = pow(wR, MOD - 2, MOD), pow(wC, MOD - 2, MOD)
    brR = _bit_reverse_indices(logR)
    n_inv = pow(n, MOD - 2, MOD)

    # inter-step twiddle T1[kr', c] = wN^(brR(kr') * c); inverse table
    # additionally carries 1/n
    t1 = np.zeros(n, dtype=object)
    t1i = np.zeros(n, dtype=object)
    for kr in range(R_):
        e = int(brR[kr])
        base = pow(wN, e, MOD)
        basei = pow(wNi, e, MOD)
        acc, acci = 1, n_inv
        for c in range(C_):
            t1[kr * C_ + c] = _mont(acc)
            t1i[kr * C_ + c] = _mont(acci)
            acc = (acc * base) % MOD
            acci = (acci * basei) % MOD
    # coset scale tables g^i / g^-i in NATURAL [R, C] order (i = r*C+c)
    g, gi = FR_MULT_GEN, pow(FR_MULT_GEN, MOD - 2, MOD)
    cs = [0] * n
    csi = [0] * n
    acc, acci = 1, 1
    for i in range(n):
        cs[i] = _mont(acc)
        csi[i] = _mont(acci)
        acc = (acc * g) % MOD
        acci = (acci * gi) % MOD
    # P-order variants (h pipeline: coefficient vectors live in P order
    # between the natural-in INTT and the P-in NTT) + the unpermute
    brC = _bit_reverse_indices(logC)
    P = np.zeros(n, np.int64)
    for kc in range(C_):
        for kr in range(R_):
            P[kc * R_ + kr] = int(brR[kr]) + R_ * int(brC[kc])
    csP = [cs[P[j]] for j in range(n)]
    csiP = [csi[P[j]] for j in range(n)]

    return {
        "Pinv": np.argsort(P).astype(np.int32),
        "cosetP": _soa(csP),
        "coset_invP": _soa(csiP),
        "logR": logR,
        "logC": logC,
        "tw_R_fwd": _stage_tw_table(wR, logR).reshape(N_LIMBS, R_),
        "tw_C_fwd": _stage_tw_table(wC, logC).reshape(N_LIMBS, C_),
        "tw_R_inv": _stage_tw_table(wRi, logR).reshape(N_LIMBS, R_),
        "tw_C_inv": _stage_tw_table(wCi, logC).reshape(N_LIMBS, C_),
        "t1": _soa(list(t1)).reshape(N_LIMBS, R_, C_),
        "t1i": _soa(list(t1i)).reshape(N_LIMBS, R_, C_),
        "coset": _soa(cs),
        "coset_inv": _soa(csi),
    }


_DEV: dict = {}


def _dev(log_n: int):
    if log_n not in _DEV:
        p = _plan(log_n)
        _DEV[log_n] = {
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in p.items()
        }
    return _DEV[log_n]


def release(log_n: int) -> None:
    _DEV.pop(log_n, None)


# -------------------------------------------------------------------------
# transforms (SoA [16, n])
# -------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("log_n",), donate_argnums=(0,))
def _fwd(x, t1, tw_R, tw_C, log_n):
    d = _plan(log_n)
    logR, logC = d["logR"], d["logC"]
    R_, C_ = 1 << logR, 1 << logC
    m = x.reshape(N_LIMBS, R_, C_)
    m = _stages(m, tw_R, t1, logR, dif=True, table="post")  # along R
    m = m.transpose(0, 2, 1)  # [16, C, R]
    m = _stages(m, tw_C, None, logC, dif=True, table="none")  # along C
    return m.reshape(N_LIMBS, R_ * C_)  # P-order [kc', kr'] flat


@partial(jax.jit, static_argnames=("log_n",), donate_argnums=(0,))
def _inv(y, t1i, tw_R, tw_C, log_n):
    d = _plan(log_n)
    logR, logC = d["logR"], d["logC"]
    R_, C_ = 1 << logR, 1 << logC
    m = y.reshape(N_LIMBS, C_, R_)  # P layout from _fwd
    m = _stages(m, tw_C, None, logC, dif=False, table="none")  # undo DIF-C
    m = m.transpose(0, 2, 1)  # [16, R(kr'), C(c)]
    # undo inter-step twiddle (with 1/n folded) BEFORE the DIT-R chain
    m = _stages(m, tw_R, t1i, logR, dif=False, table="pre")
    return m.reshape(N_LIMBS, R_ * C_)


def ntt_fwd_p(x_soa, log_n):
    """Natural-order SoA coefficients -> P-order evaluations."""
    d = _dev(log_n)
    return _fwd(x_soa, d["t1"], d["tw_R_fwd"], d["tw_C_fwd"], log_n)


def ntt_inv_p(y_soa, log_n):
    """P-order evaluations -> natural-order SoA coefficients (incl 1/n)."""
    d = _dev(log_n)
    return _inv(y_soa, d["t1i"], d["tw_R_inv"], d["tw_C_inv"], log_n)


def coset_fwd_p(x_soa, log_n):
    d = _dev(log_n)
    return ntt_fwd_p(fr_mul_soa(x_soa, d["coset"]), log_n)


def coset_inv_p(y_soa, log_n):
    d = _dev(log_n)
    return fr_mul_soa(ntt_inv_p(y_soa, log_n), d["coset_inv"])


# -------------------------------------------------------------------------
# Groth16 h(x) pipeline: evals(std) -> h coefficients (natural order)
# -------------------------------------------------------------------------


def intt_nat_to_p(x_soa, log_n):
    """Natural-order evaluations -> P-order COEFFICIENTS (incl 1/n).

    INTT(e) = (1/n) * NTT_{omega^-1}(e), so this is the _fwd structure
    with inverse twiddles; t1i already carries the 1/n."""
    d = _dev(log_n)
    return _fwd(x_soa, d["t1i"], d["tw_R_inv"], d["tw_C_inv"], log_n)


def ntt_p_to_nat(c_soa, log_n):
    """P-order coefficients -> natural-order evaluations.

    The _inv structure with FORWARD twiddles (no 1/n): G_w inverts
    F_{w^-1}*(1/n), i.e. it evaluates a P-ordered coefficient vector on
    the natural domain order."""
    d = _dev(log_n)
    return _inv(c_soa, d["t1"], d["tw_R_fwd"], d["tw_C_fwd"], log_n)


def h_pipeline(a_m, b_m, c_m, log_n, z_inv_mont):
    """(A*B - C)/Z_H on the coset, entirely through the pallas path.

    a_m/b_m/c_m: [n, 16] Montgomery evaluations on H (standard order).
    z_inv_mont: [16] Montgomery limbs of 1/(g^n - 1) (constant on gH).
    Returns h coefficients as [n, 16] (natural order), matching the
    XLA path in zk/groth16.py:618-632 bit-for-bit. Coefficient vectors
    live in P order mid-pipeline; coset tables are pre-permuted, and
    only the final h vector pays one unpermute gather.
    """
    n = 1 << log_n
    d = _dev(log_n)
    soa = lambda t: jnp.transpose(jnp.asarray(t))

    def tf(x):
        # evals(std) -> P coeffs (1/n) -> coset scale (P) -> evals(std)
        coeffs = intt_nat_to_p(soa(x), log_n)
        return ntt_p_to_nat(fr_mul_soa(coeffs, d["cosetP"]), log_n)

    a_cos, b_cos, c_cos = tf(a_m), tf(b_m), tf(c_m)
    ab = fr_mul_soa(a_cos, b_cos)
    num = _sub_soa(ab, c_cos)
    zt = jnp.broadcast_to(z_inv_mont[:, None], (N_LIMBS, n))
    h_cos = fr_mul_soa(num, zt)
    h_p = fr_mul_soa(intt_nat_to_p(h_cos, log_n), d["coset_invP"])
    h = h_p[:, d["Pinv"]]
    return jnp.transpose(h)


@jax.jit
def _sub_soa(a, b):
    """Elementwise (a - b) mod p on SoA [16, N] (XLA; a + (p - b))."""
    rows_b = [b[j] for j in range(N_LIMBS)]
    rows_a = [a[j] for j in range(N_LIMBS)]
    return jnp.stack(_sub_mod(rows_a, rows_b), axis=0)
