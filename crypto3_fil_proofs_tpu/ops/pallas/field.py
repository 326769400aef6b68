"""Pallas TPU kernels for BLS12-381 field arithmetic (SoA limb layout).

The XLA-level limb kernels (ops/fr_limbs.py) are HBM-copy-bound: every
CIOS iteration materializes padded/concatenated [N, n_limbs] arrays, so
the measured montmul rate (42M/s on v5e) sits ~20x under the VPU's u32
multiply throughput. These kernels keep the whole CIOS state in
VMEM/vregs — one HBM read per operand, one write per result.

Layout: struct-of-arrays [n_limbs, N] uint32 (16-bit limbs), N tiled in
(ROWS, 128) blocks on the grid. The limb axis is the leading (batch)
axis, so each limb lives in its own vreg tile and limb-shifts are
register renames.

Replaces the montmul underpinning SURVEY §2.9 P5 (Pippenger MSM — the
dominating Groth16 prover cost, reference core/proof/compound_proof.hpp
prove) on the hot path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fr_limbs import FQ, FR, LIMB_BITS, LIMB_MASK

ROWS = 32  # sublane tile rows per block; lane dim is 128 (32 rows -> HBM-bound: 2.6G montmuls/s on v5e, vs 42M/s for the XLA packed kernel)
BLOCK = ROWS * 128


def _field_consts(field):
    # python int constants — pallas kernels may not capture device
    # arrays, but scalar literals fold into the instruction stream
    return (
        field.n,
        int(field.n0inv),
        [int(v) for v in field.p_np],
    )


def _montmul_tiles(a, b_ref, n, n0inv, p_limbs):
    """CIOS on [n, R, 128] tiles, all state in registers/VMEM.

    Same deferred-carry bound as ops/fr_limbs._make_mont_mul (validated
    bit-exact there): column growth <= 4*(2^16-1) per iteration, total
    < 2^23 for n=24 — safely inside uint32. `b_ref` is a VMEM ref so
    the fori_loop can dynamic-slice one multiplier limb per iteration.
    """
    mask = jnp.uint32(LIMB_MASK)
    t = jnp.zeros((n + 1,) + a.shape[1:], dtype=jnp.uint32)
    zrow = jnp.zeros_like(t[:1])

    def body(i, t):
        bi = b_ref[pl.ds(i, 1)][0]
        prod = a * bi
        t0 = t[0] + (prod[0] & mask)
        m = (t0 * jnp.uint32(n0inv)) & mask
        q = jnp.stack([m * jnp.uint32(pj) for pj in p_limbs], axis=0)
        lo = (prod & mask) + (q & mask)
        hi = (prod >> LIMB_BITS) + (q >> LIMB_BITS)
        t = t + jnp.concatenate([lo, zrow], axis=0)
        t = t + jnp.concatenate([zrow, hi], axis=0)
        carry = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry, t[2:], zrow], axis=0)
        return t

    t = jax.lax.fori_loop(0, n, body, t)
    # carry-normalize to canonical 16-bit limbs
    limbs = []
    carry = jnp.zeros_like(t[0])
    for j in range(n):
        v = t[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    out = jnp.stack(limbs, axis=0)
    return _sub_if_ge_tiles(out, p_limbs, n)


def _sub_if_ge_tiles(t, p_limbs, n):
    borrow = jnp.zeros_like(t[0])
    diff = []
    mask = jnp.uint32(LIMB_MASK)
    for j in range(n):
        sub = jnp.uint32(p_limbs[j]) + borrow
        d = t[j] - sub
        borrow = (t[j] < sub).astype(jnp.uint32)
        diff.append(d & mask)
    ge = borrow == 0
    return jnp.where(ge, jnp.stack(diff, axis=0), t)


def _make_montmul_call(field):
    n, n0inv, p_limbs = _field_consts(field)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = _montmul_tiles(a_ref[:], b_ref, n, n0inv, p_limbs)

    @jax.jit
    def montmul_soa(a, b):
        """a, b: [n, N] uint32 SoA (canonical 16-bit limbs, Montgomery
        form). Returns a*b*R^-1 mod p, same layout."""
        N = a.shape[1]
        assert N % BLOCK == 0, "pad N to a multiple of 1024"
        grid = (N // BLOCK,)
        a3 = a.reshape(n, N // 128, 128)
        b3 = b.reshape(n, N // 128, 128)
        spec = pl.BlockSpec(
            (n, ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, N // 128, 128), jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            # CPU backend (CI) has no Mosaic — run interpreted there
            interpret=jax.default_backend() == "cpu",
        )(a3, b3)
        return out.reshape(n, N)

    return montmul_soa


fq_montmul_soa = _make_montmul_call(FQ)
fr_montmul_soa = _make_montmul_call(FR)


# -- tile-level add/sub (shared by the point kernels in pallas/g1.py) -------


def _add_tiles(a, b, p_limbs, n):
    """(a + b) mod p on [n, R, 128] tiles (canonical limbs in/out)."""
    mask = jnp.uint32(LIMB_MASK)
    limbs = []
    carry = jnp.zeros_like(a[0])
    for j in range(n):
        v = a[j] + b[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    t = jnp.stack(limbs, axis=0)
    # t may be >= p (carry can only be 0 here since a,b < p < 2^(16n))
    return _sub_if_ge_tiles(t, p_limbs, n)


def _sub_tiles(a, b, p_limbs, n):
    """(a - b) mod p on [n, R, 128] tiles."""
    mask = jnp.uint32(LIMB_MASK)
    diff = []
    borrow = jnp.zeros_like(a[0])
    for j in range(n):
        s = b[j] + borrow
        d = a[j] - s
        borrow = (a[j] < s).astype(jnp.uint32)
        diff.append(d & mask)
    d = jnp.stack(diff, axis=0)
    neg = borrow != 0
    # add p back where it went negative
    limbs = []
    carry = jnp.zeros_like(a[0])
    for j in range(n):
        v = d[j] + jnp.uint32(p_limbs[j]) + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    d_plus_p = jnp.stack(limbs, axis=0)
    return jnp.where(neg, d_plus_p, d)


# -- list-based (fully unrolled) field helpers ------------------------------
#
# The point kernels' montmuls are CHAINED (serial data dependency), so
# the fori_loop CIOS with its VMEM-scratch dynamic slices and
# concatenate-shifts leaves the VPU mostly idle: the measured mixed-add
# rate was 29.5M/s vs 52.7M/s for the same formulas with limb state as
# python LISTS (shifts become trace-time renames, multiplier limbs are
# values — scripts/probe_madd.py r5 sweep). The list form is what the
# NTT kernel already uses for Fr; these are the field-generic twins.
# Mosaic can't afford them in interpret mode (XLA:CPU compile of the
# unrolled chain is minutes), so the point kernels keep the fori/scratch
# versions as their CPU twin.


def l_read(ref, n):
    return [ref[j] for j in range(n)]


def l_sub_if_ge(t, p_limbs, n):
    mask = LIMB_MASK
    borrow = jnp.zeros_like(t[0])
    diff = []
    for j in range(n):
        s = jnp.uint32(p_limbs[j]) + borrow
        d = t[j] - s
        borrow = (t[j] < s).astype(jnp.uint32)
        diff.append(d & mask)
    ge = borrow == 0
    return [jnp.where(ge, diff[j], t[j]) for j in range(n)]


def l_add(a, b, p_limbs, n):
    mask = LIMB_MASK
    limbs, carry = [], jnp.zeros_like(a[0])
    for j in range(n):
        v = a[j] + b[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    return l_sub_if_ge(limbs, p_limbs, n)


def l_sub(a, b, p_limbs, n):
    mask = LIMB_MASK
    diff = []
    borrow = jnp.zeros_like(a[0])
    for j in range(n):
        s = b[j] + borrow
        d = a[j] - s
        borrow = (a[j] < s).astype(jnp.uint32)
        diff.append(d & mask)
    neg = borrow != 0
    out = []
    carry = jnp.zeros_like(a[0])
    for j in range(n):
        v = diff[j] + jnp.uint32(p_limbs[j]) + carry
        out.append(v & mask)
        carry = v >> LIMB_BITS
    return [jnp.where(neg, o, d) for o, d in zip(out, diff)]


def l_montmul(a, b, n, n0inv, p_limbs):
    """Unrolled CIOS on limb-row lists (same deferred-carry bound as
    _montmul_tiles — bit-identical on canonical inputs)."""
    mask = LIMB_MASK
    t = [jnp.zeros_like(a[0]) for _ in range(n + 1)]
    for i in range(n):
        bi = b[i]
        t0 = t[0] + ((a[0] * bi) & mask)
        m = (t0 * jnp.uint32(n0inv)) & mask
        for j in range(n):
            prod = a[j] * bi
            q = m * jnp.uint32(p_limbs[j])
            t[j] = t[j] + ((prod & mask) + (q & mask))
            t[j + 1] = t[j + 1] + ((prod >> LIMB_BITS) + (q >> LIMB_BITS))
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t[0])]
        t[0] = t[0] + carry
    limbs, carry = [], jnp.zeros_like(t[0])
    for j in range(n):
        v = t[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    return l_sub_if_ge(limbs, p_limbs, n)


# -- layout helpers ---------------------------------------------------------


def pack_to_soa(a: jnp.ndarray, block: int = BLOCK) -> tuple[jnp.ndarray, int]:
    """[N, n] packed -> ([n, N_padded] SoA, N). Pads N up to `block`."""
    N, n = a.shape
    pad = (-N) % block
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, n), a.dtype)])
    return a.T, N


def soa_to_packed(a: jnp.ndarray, n_real: int) -> jnp.ndarray:
    """[n, N_padded] SoA -> [n_real, n] packed."""
    return a.T[:n_real]
