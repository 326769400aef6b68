"""Fused Pallas G2 point kernels (SoA Jacobian over Fq2 limb tiles).

G2 backs the Groth16 B commitment — one G2 MSM per proof, the slowest
per-partition stage at production sizes (SURVEY §2.9 P5; reference
consumed crypto3-zk r1cs_gg_ppzsnark prover). Same fused-kernel design
as ops/pallas/g1.py: a whole group op per kernel with every
intermediate in VMEM/vregs.

An Fq2 element (c0 + c1*u, u^2 = -1) is a pair of [24, N] Fq limb
planes; a Jacobian point is three pairs. Formula parity: identical
mul/sq/select order to ops/g2_jax.py (which is validated against the
host bigint curve), so edge cases (infinity / P==Q / P==-Q / masked
lanes) are bit-identical.

Layout: each plane [24, N] uint32 SoA; N tiled (G2_ROWS, 128). Fq2
doubles the live temps vs G1, so the tile is half of G1's.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fr_limbs import FQ
from .field import (
    _add_tiles,
    _field_consts,
    _montmul_tiles,
    _sub_tiles,
    l_add,
    l_montmul,
    l_read,
    l_sub,
)

N_LIMBS, N0INV, P_LIMBS = _field_consts(FQ)

G2_ROWS = 8  # half of G1_ROWS: Fq2 temps are pairs
G2_BLOCK = G2_ROWS * 128

_ONE_MONT = [int(v) for v in FQ.to_limbs(FQ.mont_r % FQ.modulus)]


def _mul(scratch, a, b):
    scratch[:] = b
    return _montmul_tiles(a, scratch, N_LIMBS, N0INV, P_LIMBS)


def _add(a, b):
    return _add_tiles(a, b, P_LIMBS, N_LIMBS)


def _sub(a, b):
    return _sub_tiles(a, b, P_LIMBS, N_LIMBS)


# -- Fq2 tile ops (mirror ops/g2_jax f2_* exactly) ---------------------------


def _f2_add(a, b):
    return (_add(a[0], b[0]), _add(a[1], b[1]))


def _f2_sub(a, b):
    return (_sub(a[0], b[0]), _sub(a[1], b[1]))


def _f2_dbl(a):
    return _f2_add(a, a)


def _f2_mul(scratch, a, b):
    """Karatsuba: 3 Fq muls (g2_jax.f2_mul)."""
    t0 = _mul(scratch, a[0], b[0])
    t1 = _mul(scratch, a[1], b[1])
    t2 = _mul(scratch, _add(a[0], a[1]), _add(b[0], b[1]))
    return (_sub(t0, t1), _sub(t2, _add(t0, t1)))


def _f2_sq(scratch, a):
    """(a0+a1)(a0-a1) + 2 a0 a1 u — 2 Fq muls (g2_jax.f2_sq)."""
    c0 = _mul(scratch, _add(a[0], a[1]), _sub(a[0], a[1]))
    t = _mul(scratch, a[0], a[1])
    return (c0, _add(t, t))


def _is_zero(x):
    acc = x[0]
    for j in range(1, N_LIMBS):
        acc = acc | x[j]
    return acc == 0


def _f2_is_zero(a):
    return _is_zero(a[0]) & _is_zero(a[1])


def _sel(cond, a, b):
    return jnp.where(cond[None], a, b)


def _f2_sel(cond, a, b):
    return (_sel(cond, a[0], b[0]), _sel(cond, a[1], b[1]))


def _f2_zero_like(a):
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))


def _f2_one_like(x):
    one = jnp.stack(
        [jnp.full_like(x[0], jnp.uint32(v)) for v in _ONE_MONT], axis=0
    )
    return (one, jnp.zeros_like(one))


def _double_tiles(scratch, X1, Y1, Z1):
    """dbl-2009-l over Fq2, matching ops/g2_jax.double exactly."""
    A = _f2_sq(scratch, X1)
    B = _f2_sq(scratch, Y1)
    C = _f2_sq(scratch, B)
    t = _f2_sub(_f2_sub(_f2_sq(scratch, _f2_add(X1, B)), A), C)
    D = _f2_dbl(t)
    E = _f2_add(_f2_dbl(A), A)
    F = _f2_sq(scratch, E)
    X3 = _f2_sub(F, _f2_dbl(D))
    eight_c = _f2_dbl(_f2_dbl(_f2_dbl(C)))
    Y3 = _f2_sub(_f2_mul(scratch, E, _f2_sub(D, X3)), eight_c)
    Z3 = _f2_dbl(_f2_mul(scratch, Y1, Z1))
    return X3, Y3, Z3


def _madd_nodbl_kernel(
    x1a, x1b, y1a, y1b, z1a, z1b, x2a, x2b, y2a, y2b, valid_ref,
    oxa, oxb, oya, oyb, oza, ozb, same_ref, scratch,
):
    """Mixed add without the doubling path (g2_jax.add_mixed semantics):
    P==Q lanes pass through unchanged and are flagged in same_ref for an
    out-of-band dbl fixup, exactly like g1._madd_nodbl_kernel."""
    X1 = (x1a[:], x1b[:])
    Y1 = (y1a[:], y1b[:])
    Z1 = (z1a[:], z1b[:])
    x2 = (x2a[:], x2b[:])
    y2 = (y2a[:], y2b[:])
    valid = valid_ref[:] != 0

    Z1Z1 = _f2_sq(scratch, Z1)
    U2 = _f2_mul(scratch, x2, Z1Z1)
    S2 = _f2_mul(scratch, _f2_mul(scratch, y2, Z1), Z1Z1)
    H = _f2_sub(U2, X1)
    HH = _f2_sq(scratch, H)
    I = _f2_dbl(_f2_dbl(HH))
    J = _f2_mul(scratch, H, I)
    r = _f2_dbl(_f2_sub(S2, Y1))
    V = _f2_mul(scratch, X1, I)
    X3 = _f2_sub(_f2_sub(_f2_sq(scratch, r), J), _f2_dbl(V))
    Y3 = _f2_sub(
        _f2_mul(scratch, r, _f2_sub(V, X3)),
        _f2_dbl(_f2_mul(scratch, Y1, J)),
    )
    Z3 = _f2_sub(_f2_sub(_f2_sq(scratch, _f2_add(Z1, H)), Z1Z1), HH)

    h_zero = _f2_is_zero(H)
    r_zero = _f2_is_zero(r)
    inf1 = _f2_is_zero(Z1)

    same = h_zero & r_zero & ~inf1 & valid
    neg = h_zero & ~r_zero & ~inf1

    X, Y, Z = X3, Y3, Z3
    Z = _f2_sel(neg, _f2_zero_like(Z), Z)
    X = _f2_sel(inf1, x2, X)
    Y = _f2_sel(inf1, y2, Y)
    Z = _f2_sel(inf1, _f2_one_like(Z[0]), Z)
    keep = ~valid | same
    oxa[:], oxb[:] = _f2_sel(keep, X1, X)
    oya[:], oyb[:] = _f2_sel(keep, Y1, Y)
    oza[:], ozb[:] = _f2_sel(keep, Z1, Z)
    same_ref[:] = same.astype(jnp.uint32)


def _add_kernel(
    x1a, x1b, y1a, y1b, z1a, z1b, x2a, x2b, y2a, y2b, z2a, z2b,
    oxa, oxb, oya, oyb, oza, ozb, scratch,
):
    """Unified Jacobian add, matching ops/g2_jax.add exactly."""
    P = ((x1a[:], x1b[:]), (y1a[:], y1b[:]), (z1a[:], z1b[:]))
    Q = ((x2a[:], x2b[:]), (y2a[:], y2b[:]), (z2a[:], z2b[:]))
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q

    Z1Z1 = _f2_sq(scratch, Z1)
    Z2Z2 = _f2_sq(scratch, Z2)
    U1 = _f2_mul(scratch, X1, Z2Z2)
    U2 = _f2_mul(scratch, X2, Z1Z1)
    S1 = _f2_mul(scratch, _f2_mul(scratch, Y1, Z2), Z2Z2)
    S2 = _f2_mul(scratch, _f2_mul(scratch, Y2, Z1), Z1Z1)
    H = _f2_sub(U2, U1)
    r = _f2_dbl(_f2_sub(S2, S1))
    I = _f2_sq(scratch, _f2_dbl(H))
    J = _f2_mul(scratch, H, I)
    V = _f2_mul(scratch, U1, I)
    X3 = _f2_sub(_f2_sub(_f2_sq(scratch, r), J), _f2_dbl(V))
    Y3 = _f2_sub(
        _f2_mul(scratch, r, _f2_sub(V, X3)),
        _f2_dbl(_f2_mul(scratch, S1, J)),
    )
    Z3 = _f2_mul(
        scratch,
        H,
        _f2_sub(_f2_sub(_f2_sq(scratch, _f2_add(Z1, Z2)), Z1Z1), Z2Z2),
    )

    h_zero = _f2_is_zero(H)
    r_zero = _f2_is_zero(r)
    inf1 = _f2_is_zero(Z1)
    inf2 = _f2_is_zero(Z2)
    dX, dY, dZ = _double_tiles(scratch, X1, Y1, Z1)

    same = h_zero & r_zero & ~inf1 & ~inf2
    neg = h_zero & ~r_zero & ~inf1 & ~inf2

    X = _f2_sel(same, dX, X3)
    Y = _f2_sel(same, dY, Y3)
    Z = _f2_sel(same, dZ, Z3)
    Z = _f2_sel(neg, _f2_zero_like(Z), Z)
    X = _f2_sel(inf1, X2, _f2_sel(inf2, X1, X))
    Y = _f2_sel(inf1, Y2, _f2_sel(inf2, Y1, Y))
    Z = _f2_sel(inf1, Z2, _f2_sel(inf2, Z1, Z))
    oxa[:], oxb[:] = X
    oya[:], oyb[:] = Y
    oza[:], ozb[:] = Z


def _dbl_kernel(xa, xb, ya, yb, za, zb, mask_ref,
                oxa, oxb, oya, oyb, oza, ozb, scratch):
    """Masked in-place doubling (madd_nodbl collision fixup)."""
    X = (xa[:], xb[:])
    Y = (ya[:], yb[:])
    Z = (za[:], zb[:])
    m = mask_ref[:] != 0
    dX, dY, dZ = _double_tiles(scratch, X, Y, Z)
    oxa[:], oxb[:] = _f2_sel(m, dX, X)
    oya[:], oyb[:] = _f2_sel(m, dY, Y)
    oza[:], ozb[:] = _f2_sel(m, dZ, Z)


# -- unrolled (list-based) kernel twins (see g1.py rationale: the
# chained montmuls starve the VPU through the fori/scratch CIOS; the
# unrolled list form measured 1.8x on G1. TPU runs these; CPU interpret
# keeps the fori/scratch kernels above). Fq2 values are pairs of
# limb-row lists.


def _u_mul(a, b):
    return l_montmul(a, b, N_LIMBS, N0INV, P_LIMBS)


def _u_add(a, b):
    return l_add(a, b, P_LIMBS, N_LIMBS)


def _u_sub(a, b):
    return l_sub(a, b, P_LIMBS, N_LIMBS)


def _uf2_add(a, b):
    return (_u_add(a[0], b[0]), _u_add(a[1], b[1]))


def _uf2_sub(a, b):
    return (_u_sub(a[0], b[0]), _u_sub(a[1], b[1]))


def _uf2_dbl(a):
    return _uf2_add(a, a)


def _uf2_mul(a, b):
    t0 = _u_mul(a[0], b[0])
    t1 = _u_mul(a[1], b[1])
    t2 = _u_mul(_u_add(a[0], a[1]), _u_add(b[0], b[1]))
    return (_u_sub(t0, t1), _u_sub(t2, _u_add(t0, t1)))


def _uf2_sq(a):
    c0 = _u_mul(_u_add(a[0], a[1]), _u_sub(a[0], a[1]))
    t = _u_mul(a[0], a[1])
    return (c0, _u_add(t, t))


def _u_is_zero(x):
    acc = x[0]
    for j in range(1, N_LIMBS):
        acc = acc | x[j]
    return acc == 0


def _uf2_is_zero(a):
    return _u_is_zero(a[0]) & _u_is_zero(a[1])


def _u_sel(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _uf2_sel(cond, a, b):
    return (_u_sel(cond, a[0], b[0]), _u_sel(cond, a[1], b[1]))


def _uf2_zero_like(a):
    z = [jnp.zeros_like(a[0][0]) for _ in range(N_LIMBS)]
    return (z, list(z))


def _uf2_one_like(a):
    one = [jnp.full_like(a[0][0], jnp.uint32(v)) for v in _ONE_MONT]
    return (one, [jnp.zeros_like(one[0]) for _ in range(N_LIMBS)])


def _u_double(X1, Y1, Z1):
    A = _uf2_sq(X1)
    B = _uf2_sq(Y1)
    C = _uf2_sq(B)
    t = _uf2_sub(_uf2_sub(_uf2_sq(_uf2_add(X1, B)), A), C)
    D = _uf2_dbl(t)
    E = _uf2_add(_uf2_dbl(A), A)
    F = _uf2_sq(E)
    X3 = _uf2_sub(F, _uf2_dbl(D))
    eight_c = _uf2_dbl(_uf2_dbl(_uf2_dbl(C)))
    Y3 = _uf2_sub(_uf2_mul(E, _uf2_sub(D, X3)), eight_c)
    Z3 = _uf2_dbl(_uf2_mul(Y1, Z1))
    return X3, Y3, Z3


def _uf2_read(ra, rb):
    return (l_read(ra, N_LIMBS), l_read(rb, N_LIMBS))


def _uf2_write(val, ra, rb):
    for j in range(N_LIMBS):
        ra[j] = val[0][j]
        rb[j] = val[1][j]


def _madd_nodbl_kernel_u(
    x1a, x1b, y1a, y1b, z1a, z1b, x2a, x2b, y2a, y2b, valid_ref,
    oxa, oxb, oya, oyb, oza, ozb, same_ref,
):
    X1 = _uf2_read(x1a, x1b)
    Y1 = _uf2_read(y1a, y1b)
    Z1 = _uf2_read(z1a, z1b)
    x2 = _uf2_read(x2a, x2b)
    y2 = _uf2_read(y2a, y2b)
    valid = valid_ref[:] != 0

    Z1Z1 = _uf2_sq(Z1)
    U2 = _uf2_mul(x2, Z1Z1)
    S2 = _uf2_mul(_uf2_mul(y2, Z1), Z1Z1)
    H = _uf2_sub(U2, X1)
    HH = _uf2_sq(H)
    I = _uf2_dbl(_uf2_dbl(HH))
    J = _uf2_mul(H, I)
    r = _uf2_dbl(_uf2_sub(S2, Y1))
    V = _uf2_mul(X1, I)
    X3 = _uf2_sub(_uf2_sub(_uf2_sq(r), J), _uf2_dbl(V))
    Y3 = _uf2_sub(_uf2_mul(r, _uf2_sub(V, X3)), _uf2_dbl(_uf2_mul(Y1, J)))
    Z3 = _uf2_sub(_uf2_sub(_uf2_sq(_uf2_add(Z1, H)), Z1Z1), HH)

    h_zero = _uf2_is_zero(H)
    r_zero = _uf2_is_zero(r)
    inf1 = _uf2_is_zero(Z1)

    same = h_zero & r_zero & ~inf1 & valid
    neg = h_zero & ~r_zero & ~inf1

    X, Y, Z = X3, Y3, Z3
    Z = _uf2_sel(neg, _uf2_zero_like(Z), Z)
    X = _uf2_sel(inf1, x2, X)
    Y = _uf2_sel(inf1, y2, Y)
    Z = _uf2_sel(inf1, _uf2_one_like(Z), Z)
    keep = ~valid | same
    _uf2_write(_uf2_sel(keep, X1, X), oxa, oxb)
    _uf2_write(_uf2_sel(keep, Y1, Y), oya, oyb)
    _uf2_write(_uf2_sel(keep, Z1, Z), oza, ozb)
    same_ref[:] = same.astype(jnp.uint32)


def _add_kernel_u(
    x1a, x1b, y1a, y1b, z1a, z1b, x2a, x2b, y2a, y2b, z2a, z2b,
    oxa, oxb, oya, oyb, oza, ozb,
):
    X1, Y1, Z1 = _uf2_read(x1a, x1b), _uf2_read(y1a, y1b), _uf2_read(z1a, z1b)
    X2, Y2, Z2 = _uf2_read(x2a, x2b), _uf2_read(y2a, y2b), _uf2_read(z2a, z2b)

    Z1Z1 = _uf2_sq(Z1)
    Z2Z2 = _uf2_sq(Z2)
    U1 = _uf2_mul(X1, Z2Z2)
    U2 = _uf2_mul(X2, Z1Z1)
    S1 = _uf2_mul(_uf2_mul(Y1, Z2), Z2Z2)
    S2 = _uf2_mul(_uf2_mul(Y2, Z1), Z1Z1)
    H = _uf2_sub(U2, U1)
    r = _uf2_dbl(_uf2_sub(S2, S1))
    I = _uf2_sq(_uf2_dbl(H))
    J = _uf2_mul(H, I)
    V = _uf2_mul(U1, I)
    X3 = _uf2_sub(_uf2_sub(_uf2_sq(r), J), _uf2_dbl(V))
    Y3 = _uf2_sub(_uf2_mul(r, _uf2_sub(V, X3)), _uf2_dbl(_uf2_mul(S1, J)))
    Z3 = _uf2_mul(
        H, _uf2_sub(_uf2_sub(_uf2_sq(_uf2_add(Z1, Z2)), Z1Z1), Z2Z2)
    )

    h_zero = _uf2_is_zero(H)
    r_zero = _uf2_is_zero(r)
    inf1 = _uf2_is_zero(Z1)
    inf2 = _uf2_is_zero(Z2)
    dX, dY, dZ = _u_double(X1, Y1, Z1)

    same = h_zero & r_zero & ~inf1 & ~inf2
    neg = h_zero & ~r_zero & ~inf1 & ~inf2

    X = _uf2_sel(same, dX, X3)
    Y = _uf2_sel(same, dY, Y3)
    Z = _uf2_sel(same, dZ, Z3)
    Z = _uf2_sel(neg, _uf2_zero_like(Z), Z)
    X = _uf2_sel(inf1, X2, _uf2_sel(inf2, X1, X))
    Y = _uf2_sel(inf1, Y2, _uf2_sel(inf2, Y1, Y))
    Z = _uf2_sel(inf1, Z2, _uf2_sel(inf2, Z1, Z))
    _uf2_write(X, oxa, oxb)
    _uf2_write(Y, oya, oyb)
    _uf2_write(Z, oza, ozb)


def _dbl_kernel_u(xa, xb, ya, yb, za, zb, mask_ref,
                  oxa, oxb, oya, oyb, oza, ozb):
    X, Y, Z = _uf2_read(xa, xb), _uf2_read(ya, yb), _uf2_read(za, zb)
    m = mask_ref[:] != 0
    dX, dY, dZ = _u_double(X, Y, Z)
    _uf2_write(_uf2_sel(m, dX, X), oxa, oxb)
    _uf2_write(_uf2_sel(m, dY, Y), oya, oyb)
    _uf2_write(_uf2_sel(m, dZ, Z), oza, ozb)


def _on_tpu():
    return jax.default_backend() != "cpu"


def _coord_spec():
    return pl.BlockSpec(
        (N_LIMBS, G2_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )


def _mask_spec():
    return pl.BlockSpec(
        (G2_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _shape3(N):
    return jax.ShapeDtypeStruct((N_LIMBS, N // 128, 128), jnp.uint32)


def _flatten(p):
    """((X0,X1),(Y0,Y1),(Z0,Z1)) -> 6 planes."""
    return [c for pair in p for c in pair]


def _unflatten(planes):
    return tuple(
        (planes[i], planes[i + 1]) for i in range(0, len(planes), 2)
    )


@jax.jit
def madd_nodbl_soa(acc, q, valid):
    """acc: ((X0,X1),(Y0,Y1),(Z0,Z1)) planes [24,N]; q: ((x0,x1),(y0,y1))
    affine; valid [N]. Returns (point, same[N]) like g1.madd_nodbl_soa."""
    planes = _flatten(acc) + _flatten(q)
    N = planes[0].shape[1]
    assert N % G2_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    vmask = valid.astype(jnp.uint32).reshape(N // 128, 128)
    cs, ms = _coord_spec(), _mask_spec()
    out = pl.pallas_call(
        _madd_nodbl_kernel_u if _on_tpu() else _madd_nodbl_kernel,
        out_shape=(_shape3(N),) * 6
        + (jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),),
        grid=(N // G2_BLOCK,),
        in_specs=[cs] * 10 + [ms],
        out_specs=(cs,) * 6 + (ms,),
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G2_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(*[r3(t) for t in planes], vmask)
    pt = _unflatten([t.reshape(N_LIMBS, N) for t in out[:6]])
    return pt, out[6].reshape(N)


@jax.jit
def dbl_soa(p, mask):
    """Double the lanes where mask != 0, pass the rest through."""
    planes = _flatten(p)
    N = planes[0].shape[1]
    assert N % G2_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    mmask = mask.astype(jnp.uint32).reshape(N // 128, 128)
    cs, ms = _coord_spec(), _mask_spec()
    out = pl.pallas_call(
        _dbl_kernel_u if _on_tpu() else _dbl_kernel,
        out_shape=(_shape3(N),) * 6,
        grid=(N // G2_BLOCK,),
        in_specs=[cs] * 6 + [ms],
        out_specs=(cs,) * 6,
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G2_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(*[r3(t) for t in planes], mmask)
    return _unflatten([t.reshape(N_LIMBS, N) for t in out])


@jax.jit
def add_soa(p, q):
    """Full Jacobian add of two SoA batches (6 planes each)."""
    planes = _flatten(p) + _flatten(q)
    N = planes[0].shape[1]
    assert N % G2_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    cs = _coord_spec()
    out = pl.pallas_call(
        _add_kernel_u if _on_tpu() else _add_kernel,
        out_shape=(_shape3(N),) * 6,
        grid=(N // G2_BLOCK,),
        in_specs=[cs] * 12,
        out_specs=(cs,) * 6,
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G2_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(*[r3(t) for t in planes])
    return _unflatten([t.reshape(N_LIMBS, N) for t in out])
