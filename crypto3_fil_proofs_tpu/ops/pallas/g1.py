"""Fused Pallas G1 point kernels (SoA Jacobian over Fq limb tiles).

One kernel = one whole group operation (mixed add: 18 Montgomery
multiplies incl. the branch-free doubling path, plus ~20 add/subs and
the edge-case selects). Every intermediate lives in VMEM/vregs — the
XLA path materializes each of its ~40 intermediate [N, 24] arrays to
HBM, which is why the effective mixed-add rate was ~3.5M/s while the
compute bound is >100M/s.

These are the inner loops of the Pippenger MSM (SURVEY §2.9 P5,
reference core/proof/compound_proof.hpp prove). Formula parity:
madd-2007-bl / dbl-2009-l exactly as ops/g1_jax.py (which is validated
against the host bigint curve), including the same select order for
infinity / P==Q / P==-Q edge cases.

Layout: coordinates as [24, N] uint32 SoA; N tiled (ROWS, 128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
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

G1_ROWS = 16  # smaller than the field kernel: ~15 live [24,R,128] temps
G1_BLOCK = G1_ROWS * 128

# 1 in Montgomery form, as python ints per limb (for infinity lifting)
_ONE_MONT = [int(v) for v in FQ.to_limbs(FQ.mont_r % FQ.modulus)]


def _mul(scratch, a, b):
    """Montgomery product of two in-kernel values via the VMEM scratch
    (the CIOS fori_loop needs its multiplier operand as a sliceable ref)."""
    scratch[:] = b
    return _montmul_tiles(a, scratch, N_LIMBS, N0INV, P_LIMBS)


def _dbl(x, p_limbs=P_LIMBS):
    return _add_tiles(x, x, p_limbs, N_LIMBS)


def _is_zero(x):
    acc = x[0]
    for j in range(1, N_LIMBS):
        acc = acc | x[j]
    return acc == 0


def _sel(cond, a, b):
    return jnp.where(cond[None], a, b)


def _double_tiles(X1, Y1, Z1, scratch):
    """dbl-2009-l, matching ops/g1_jax.double exactly."""
    A = _mul(scratch, X1, X1)
    B = _mul(scratch, Y1, Y1)
    C = _mul(scratch, B, B)
    xb = _add_tiles(X1, B, P_LIMBS, N_LIMBS)
    t = _sub_tiles(
        _sub_tiles(_mul(scratch, xb, xb), A, P_LIMBS, N_LIMBS),
        C, P_LIMBS, N_LIMBS,
    )
    D = _dbl(t)
    E = _add_tiles(_dbl(A), A, P_LIMBS, N_LIMBS)
    F = _mul(scratch, E, E)
    X3 = _sub_tiles(F, _dbl(D), P_LIMBS, N_LIMBS)
    eight_c = _dbl(_dbl(_dbl(C)))
    Y3 = _sub_tiles(
        _mul(scratch, E, _sub_tiles(D, X3, P_LIMBS, N_LIMBS)),
        eight_c, P_LIMBS, N_LIMBS,
    )
    Z3 = _dbl(_mul(scratch, Y1, Z1))
    return X3, Y3, Z3


def _madd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, valid_ref,
                 ox_ref, oy_ref, oz_ref, scratch):
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    x2, y2 = x2_ref[:], y2_ref[:]
    valid = valid_ref[:] != 0

    Z1Z1 = _mul(scratch, Z1, Z1)
    U2 = _mul(scratch, x2, Z1Z1)
    S2 = _mul(scratch, _mul(scratch, y2, Z1), Z1Z1)
    H = _sub_tiles(U2, X1, P_LIMBS, N_LIMBS)
    HH = _mul(scratch, H, H)
    I = _dbl(_dbl(HH))
    J = _mul(scratch, H, I)
    r = _dbl(_sub_tiles(S2, Y1, P_LIMBS, N_LIMBS))
    V = _mul(scratch, X1, I)
    X3 = _sub_tiles(
        _sub_tiles(_mul(scratch, r, r), J, P_LIMBS, N_LIMBS),
        _dbl(V), P_LIMBS, N_LIMBS,
    )
    Y3 = _sub_tiles(
        _mul(scratch, r, _sub_tiles(V, X3, P_LIMBS, N_LIMBS)),
        _dbl(_mul(scratch, Y1, J)), P_LIMBS, N_LIMBS,
    )
    zh = _add_tiles(Z1, H, P_LIMBS, N_LIMBS)
    Z3 = _sub_tiles(
        _sub_tiles(_mul(scratch, zh, zh), Z1Z1, P_LIMBS, N_LIMBS),
        HH, P_LIMBS, N_LIMBS,
    )

    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    inf1 = _is_zero(Z1)
    dX, dY, dZ = _double_tiles(X1, Y1, Z1, scratch)

    same = h_zero & r_zero & ~inf1
    neg = h_zero & ~r_zero & ~inf1

    one = jnp.stack(
        [jnp.full_like(X1[0], jnp.uint32(v)) for v in _ONE_MONT], axis=0
    )
    X = _sel(same, dX, X3)
    Y = _sel(same, dY, Y3)
    Z = _sel(same, dZ, Z3)
    Z = jnp.where(neg[None], jnp.zeros_like(Z), Z)
    X = _sel(inf1, x2, X)
    Y = _sel(inf1, y2, Y)
    Z = _sel(inf1, one, Z)
    ox_ref[:] = _sel(valid, X, X1)
    oy_ref[:] = _sel(valid, Y, Y1)
    oz_ref[:] = _sel(valid, Z, Z1)


def _add_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                ox_ref, oy_ref, oz_ref, scratch):
    """Unified Jacobian add, matching ops/g1_jax.add exactly."""
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    Z1Z1 = _mul(scratch, Z1, Z1)
    Z2Z2 = _mul(scratch, Z2, Z2)
    U1 = _mul(scratch, X1, Z2Z2)
    U2 = _mul(scratch, X2, Z1Z1)
    S1 = _mul(scratch, _mul(scratch, Y1, Z2), Z2Z2)
    S2 = _mul(scratch, _mul(scratch, Y2, Z1), Z1Z1)
    H = _sub_tiles(U2, U1, P_LIMBS, N_LIMBS)
    r = _dbl(_sub_tiles(S2, S1, P_LIMBS, N_LIMBS))
    dh = _dbl(H)
    I = _mul(scratch, dh, dh)
    J = _mul(scratch, H, I)
    V = _mul(scratch, U1, I)
    X3 = _sub_tiles(
        _sub_tiles(_mul(scratch, r, r), J, P_LIMBS, N_LIMBS),
        _dbl(V), P_LIMBS, N_LIMBS,
    )
    Y3 = _sub_tiles(
        _mul(scratch, r, _sub_tiles(V, X3, P_LIMBS, N_LIMBS)),
        _dbl(_mul(scratch, S1, J)), P_LIMBS, N_LIMBS,
    )
    zz = _add_tiles(Z1, Z2, P_LIMBS, N_LIMBS)
    Z3 = _mul(
        scratch,
        H,
        _sub_tiles(
            _sub_tiles(_mul(scratch, zz, zz), Z1Z1, P_LIMBS, N_LIMBS),
            Z2Z2, P_LIMBS, N_LIMBS,
        ),
    )

    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    inf1 = _is_zero(Z1)
    inf2 = _is_zero(Z2)
    dX, dY, dZ = _double_tiles(X1, Y1, Z1, scratch)

    same = h_zero & r_zero & ~inf1 & ~inf2
    neg = h_zero & ~r_zero & ~inf1 & ~inf2

    X = _sel(same, dX, X3)
    Y = _sel(same, dY, Y3)
    Z = _sel(same, dZ, Z3)
    Z = jnp.where(neg[None], jnp.zeros_like(Z), Z)
    X = _sel(inf1, X2, _sel(inf2, X1, X))
    Y = _sel(inf1, Y2, _sel(inf2, Y1, Y))
    Z = _sel(inf1, Z2, _sel(inf2, Z1, Z))
    ox_ref[:] = X
    oy_ref[:] = Y
    oz_ref[:] = Z


def _madd_nodbl_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, valid_ref,
                       ox_ref, oy_ref, oz_ref, same_ref, scratch):
    """madd without the doubling path: 11 montmuls instead of 18.

    Lanes where P == Q (H == 0, r == 0) are passed through UNCHANGED and
    flagged in same_ref; the caller doubles those lanes out of band
    (collisions are rare for distinct-base MSMs, so the fixup runs only
    on passes that actually hit one — see msm.py `_bucket_accumulate`).
    """
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    x2, y2 = x2_ref[:], y2_ref[:]
    valid = valid_ref[:] != 0

    Z1Z1 = _mul(scratch, Z1, Z1)
    U2 = _mul(scratch, x2, Z1Z1)
    S2 = _mul(scratch, _mul(scratch, y2, Z1), Z1Z1)
    H = _sub_tiles(U2, X1, P_LIMBS, N_LIMBS)
    HH = _mul(scratch, H, H)
    I = _dbl(_dbl(HH))
    J = _mul(scratch, H, I)
    r = _dbl(_sub_tiles(S2, Y1, P_LIMBS, N_LIMBS))
    V = _mul(scratch, X1, I)
    X3 = _sub_tiles(
        _sub_tiles(_mul(scratch, r, r), J, P_LIMBS, N_LIMBS),
        _dbl(V), P_LIMBS, N_LIMBS,
    )
    Y3 = _sub_tiles(
        _mul(scratch, r, _sub_tiles(V, X3, P_LIMBS, N_LIMBS)),
        _dbl(_mul(scratch, Y1, J)), P_LIMBS, N_LIMBS,
    )
    zh = _add_tiles(Z1, H, P_LIMBS, N_LIMBS)
    Z3 = _sub_tiles(
        _sub_tiles(_mul(scratch, zh, zh), Z1Z1, P_LIMBS, N_LIMBS),
        HH, P_LIMBS, N_LIMBS,
    )

    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    inf1 = _is_zero(Z1)

    same = h_zero & r_zero & ~inf1 & valid
    neg = h_zero & ~r_zero & ~inf1

    one = jnp.stack(
        [jnp.full_like(X1[0], jnp.uint32(v)) for v in _ONE_MONT], axis=0
    )
    X, Y, Z = X3, Y3, Z3
    Z = jnp.where(neg[None], jnp.zeros_like(Z), Z)
    X = _sel(inf1, x2, X)
    Y = _sel(inf1, y2, Y)
    Z = _sel(inf1, one, Z)
    keep = ~valid | same
    ox_ref[:] = _sel(keep, X1, X)
    oy_ref[:] = _sel(keep, Y1, Y)
    oz_ref[:] = _sel(keep, Z1, Z)
    same_ref[:] = same.astype(jnp.uint32)


def _dbl_kernel(x_ref, y_ref, z_ref, mask_ref, ox_ref, oy_ref, oz_ref,
                scratch):
    """Masked in-place doubling (the madd_nodbl collision fixup)."""
    X, Y, Z = x_ref[:], y_ref[:], z_ref[:]
    m = mask_ref[:] != 0
    dX, dY, dZ = _double_tiles(X, Y, Z, scratch)
    ox_ref[:] = _sel(m, dX, X)
    oy_ref[:] = _sel(m, dY, Y)
    oz_ref[:] = _sel(m, dZ, Z)


# -- unrolled (list-based) kernel twins -------------------------------------
#
# The chained montmuls leave the fori/scratch CIOS VPU-starved: measured
# 29.5M mixed adds/s vs 52.7M for the same formulas unrolled with limb
# lists (scripts/probe_madd.py). TPU runs these; the CPU interpret path
# keeps the fori/scratch kernels above (the unrolled chain costs minutes
# of XLA:CPU compile). Bit-identical on canonical inputs.


def _u_mul(a, b):
    return l_montmul(a, b, N_LIMBS, N0INV, P_LIMBS)


def _u_add(a, b):
    return l_add(a, b, P_LIMBS, N_LIMBS)


def _u_sub(a, b):
    return l_sub(a, b, P_LIMBS, N_LIMBS)


def _u_dbl(a):
    return l_add(a, a, P_LIMBS, N_LIMBS)


def _u_is_zero(x):
    acc = x[0]
    for j in range(1, N_LIMBS):
        acc = acc | x[j]
    return acc == 0


def _u_sel(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _u_one_zero(like):
    one = [jnp.full_like(like, jnp.uint32(v)) for v in _ONE_MONT]
    zero = [jnp.zeros_like(like) for _ in range(N_LIMBS)]
    return one, zero


def _u_double(X1, Y1, Z1):
    A = _u_mul(X1, X1)
    B = _u_mul(Y1, Y1)
    C = _u_mul(B, B)
    xb = _u_add(X1, B)
    t = _u_sub(_u_sub(_u_mul(xb, xb), A), C)
    D = _u_dbl(t)
    E = _u_add(_u_dbl(A), A)
    F = _u_mul(E, E)
    X3 = _u_sub(F, _u_dbl(D))
    eight_c = _u_dbl(_u_dbl(_u_dbl(C)))
    Y3 = _u_sub(_u_mul(E, _u_sub(D, X3)), eight_c)
    Z3 = _u_dbl(_u_mul(Y1, Z1))
    return X3, Y3, Z3


def _madd_kernel_u(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, valid_ref,
                   ox_ref, oy_ref, oz_ref):
    X1, Y1, Z1 = (l_read(r, N_LIMBS) for r in (x1_ref, y1_ref, z1_ref))
    x2, y2 = l_read(x2_ref, N_LIMBS), l_read(y2_ref, N_LIMBS)
    valid = valid_ref[:] != 0

    Z1Z1 = _u_mul(Z1, Z1)
    U2 = _u_mul(x2, Z1Z1)
    S2 = _u_mul(_u_mul(y2, Z1), Z1Z1)
    H = _u_sub(U2, X1)
    HH = _u_mul(H, H)
    I = _u_dbl(_u_dbl(HH))
    J = _u_mul(H, I)
    r = _u_dbl(_u_sub(S2, Y1))
    V = _u_mul(X1, I)
    X3 = _u_sub(_u_sub(_u_mul(r, r), J), _u_dbl(V))
    Y3 = _u_sub(_u_mul(r, _u_sub(V, X3)), _u_dbl(_u_mul(Y1, J)))
    zh = _u_add(Z1, H)
    Z3 = _u_sub(_u_sub(_u_mul(zh, zh), Z1Z1), HH)

    h_zero = _u_is_zero(H)
    r_zero = _u_is_zero(r)
    inf1 = _u_is_zero(Z1)
    dX, dY, dZ = _u_double(X1, Y1, Z1)

    same = h_zero & r_zero & ~inf1
    neg = h_zero & ~r_zero & ~inf1

    one, zero = _u_one_zero(X1[0])
    X = _u_sel(same, dX, X3)
    Y = _u_sel(same, dY, Y3)
    Z = _u_sel(same, dZ, Z3)
    Z = _u_sel(neg, zero, Z)
    X = _u_sel(inf1, x2, X)
    Y = _u_sel(inf1, y2, Y)
    Z = _u_sel(inf1, one, Z)
    X = _u_sel(valid, X, X1)
    Y = _u_sel(valid, Y, Y1)
    Z = _u_sel(valid, Z, Z1)
    for j in range(N_LIMBS):
        ox_ref[j] = X[j]
        oy_ref[j] = Y[j]
        oz_ref[j] = Z[j]


def _add_kernel_u(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                  ox_ref, oy_ref, oz_ref):
    X1, Y1, Z1 = (l_read(r, N_LIMBS) for r in (x1_ref, y1_ref, z1_ref))
    X2, Y2, Z2 = (l_read(r, N_LIMBS) for r in (x2_ref, y2_ref, z2_ref))

    Z1Z1 = _u_mul(Z1, Z1)
    Z2Z2 = _u_mul(Z2, Z2)
    U1 = _u_mul(X1, Z2Z2)
    U2 = _u_mul(X2, Z1Z1)
    S1 = _u_mul(_u_mul(Y1, Z2), Z2Z2)
    S2 = _u_mul(_u_mul(Y2, Z1), Z1Z1)
    H = _u_sub(U2, U1)
    r = _u_dbl(_u_sub(S2, S1))
    dh = _u_dbl(H)
    I = _u_mul(dh, dh)
    J = _u_mul(H, I)
    V = _u_mul(U1, I)
    X3 = _u_sub(_u_sub(_u_mul(r, r), J), _u_dbl(V))
    Y3 = _u_sub(_u_mul(r, _u_sub(V, X3)), _u_dbl(_u_mul(S1, J)))
    zz = _u_add(Z1, Z2)
    Z3 = _u_mul(H, _u_sub(_u_sub(_u_mul(zz, zz), Z1Z1), Z2Z2))

    h_zero = _u_is_zero(H)
    r_zero = _u_is_zero(r)
    inf1 = _u_is_zero(Z1)
    inf2 = _u_is_zero(Z2)
    dX, dY, dZ = _u_double(X1, Y1, Z1)

    same = h_zero & r_zero & ~inf1 & ~inf2
    neg = h_zero & ~r_zero & ~inf1 & ~inf2

    _, zero = _u_one_zero(X1[0])
    X = _u_sel(same, dX, X3)
    Y = _u_sel(same, dY, Y3)
    Z = _u_sel(same, dZ, Z3)
    Z = _u_sel(neg, zero, Z)
    X = _u_sel(inf1, X2, _u_sel(inf2, X1, X))
    Y = _u_sel(inf1, Y2, _u_sel(inf2, Y1, Y))
    Z = _u_sel(inf1, Z2, _u_sel(inf2, Z1, Z))
    for j in range(N_LIMBS):
        ox_ref[j] = X[j]
        oy_ref[j] = Y[j]
        oz_ref[j] = Z[j]


def _madd_nodbl_kernel_u(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, valid_ref,
                         ox_ref, oy_ref, oz_ref, same_ref):
    X1, Y1, Z1 = (l_read(r, N_LIMBS) for r in (x1_ref, y1_ref, z1_ref))
    x2, y2 = l_read(x2_ref, N_LIMBS), l_read(y2_ref, N_LIMBS)
    valid = valid_ref[:] != 0

    Z1Z1 = _u_mul(Z1, Z1)
    U2 = _u_mul(x2, Z1Z1)
    S2 = _u_mul(_u_mul(y2, Z1), Z1Z1)
    H = _u_sub(U2, X1)
    HH = _u_mul(H, H)
    I = _u_dbl(_u_dbl(HH))
    J = _u_mul(H, I)
    r = _u_dbl(_u_sub(S2, Y1))
    V = _u_mul(X1, I)
    X3 = _u_sub(_u_sub(_u_mul(r, r), J), _u_dbl(V))
    Y3 = _u_sub(_u_mul(r, _u_sub(V, X3)), _u_dbl(_u_mul(Y1, J)))
    zh = _u_add(Z1, H)
    Z3 = _u_sub(_u_sub(_u_mul(zh, zh), Z1Z1), HH)

    h_zero = _u_is_zero(H)
    r_zero = _u_is_zero(r)
    inf1 = _u_is_zero(Z1)

    same = h_zero & r_zero & ~inf1 & valid
    neg = h_zero & ~r_zero & ~inf1

    one, zero = _u_one_zero(X1[0])
    X, Y, Z = X3, Y3, Z3
    Z = _u_sel(neg, zero, Z)
    X = _u_sel(inf1, x2, X)
    Y = _u_sel(inf1, y2, Y)
    Z = _u_sel(inf1, one, Z)
    keep = ~valid | same
    X = _u_sel(keep, X1, X)
    Y = _u_sel(keep, Y1, Y)
    Z = _u_sel(keep, Z1, Z)
    for j in range(N_LIMBS):
        ox_ref[j] = X[j]
        oy_ref[j] = Y[j]
        oz_ref[j] = Z[j]
    same_ref[:] = same.astype(jnp.uint32)


def _dbl_kernel_u(x_ref, y_ref, z_ref, mask_ref, ox_ref, oy_ref, oz_ref):
    X, Y, Z = (l_read(r, N_LIMBS) for r in (x_ref, y_ref, z_ref))
    m = mask_ref[:] != 0
    dX, dY, dZ = _u_double(X, Y, Z)
    oX = _u_sel(m, dX, X)
    oY = _u_sel(m, dY, Y)
    oZ = _u_sel(m, dZ, Z)
    for j in range(N_LIMBS):
        ox_ref[j] = oX[j]
        oy_ref[j] = oY[j]
        oz_ref[j] = oZ[j]


def _on_tpu():
    return jax.default_backend() != "cpu"


def _coord_spec():
    return pl.BlockSpec(
        (N_LIMBS, G1_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )


def _mask_spec():
    return pl.BlockSpec(
        (G1_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _shape3(N):
    return jax.ShapeDtypeStruct((N_LIMBS, N // 128, 128), jnp.uint32)


@jax.jit
def madd_soa(acc, q, valid):
    """acc (X,Y,Z SoA [24,N]) + affine q (x,y SoA), masked by valid [N]
    (uint32/bool; 0 lanes keep acc). N must be a multiple of G1_BLOCK."""
    X, Y, Z = acc
    x2, y2 = q
    N = X.shape[1]
    assert N % G1_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    vmask = valid.astype(jnp.uint32).reshape(N // 128, 128)
    cs, ms = _coord_spec(), _mask_spec()
    out = pl.pallas_call(
        _madd_kernel_u if _on_tpu() else _madd_kernel,
        out_shape=(_shape3(N),) * 3,
        grid=(N // G1_BLOCK,),
        in_specs=[cs, cs, cs, cs, cs, ms],
        out_specs=(cs, cs, cs),
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G1_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(r3(X), r3(Y), r3(Z), r3(x2), r3(y2), vmask)
    return tuple(t.reshape(N_LIMBS, N) for t in out)


@jax.jit
def madd_nodbl_soa(acc, q, valid):
    """Fast mixed add (no doubling path). Returns (X, Y, Z, same) where
    `same` [N] uint32 flags P==Q lanes that were passed through and must
    be doubled by the caller (dbl_soa). ~40% fewer montmuls than
    madd_soa; bit-identical on all non-collision lanes."""
    X, Y, Z = acc
    x2, y2 = q
    N = X.shape[1]
    assert N % G1_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    vmask = valid.astype(jnp.uint32).reshape(N // 128, 128)
    cs, ms = _coord_spec(), _mask_spec()
    out = pl.pallas_call(
        _madd_nodbl_kernel_u if _on_tpu() else _madd_nodbl_kernel,
        out_shape=(_shape3(N),) * 3
        + (jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),),
        grid=(N // G1_BLOCK,),
        in_specs=[cs, cs, cs, cs, cs, ms],
        out_specs=(cs, cs, cs, ms),
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G1_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(r3(X), r3(Y), r3(Z), r3(x2), r3(y2), vmask)
    return tuple(t.reshape(N_LIMBS, N) for t in out[:3]) + (
        out[3].reshape(N),
    )


@jax.jit
def dbl_soa(p, mask):
    """Double the lanes where mask != 0, pass the rest through."""
    X, Y, Z = p
    N = X.shape[1]
    assert N % G1_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    mmask = mask.astype(jnp.uint32).reshape(N // 128, 128)
    cs, ms = _coord_spec(), _mask_spec()
    out = pl.pallas_call(
        _dbl_kernel_u if _on_tpu() else _dbl_kernel,
        out_shape=(_shape3(N),) * 3,
        grid=(N // G1_BLOCK,),
        in_specs=[cs, cs, cs, ms],
        out_specs=(cs, cs, cs),
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G1_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(r3(X), r3(Y), r3(Z), mmask)
    return tuple(t.reshape(N_LIMBS, N) for t in out)


@jax.jit
def add_soa(p, q):
    """Full Jacobian add of two SoA batches [24, N] (X,Y,Z each)."""
    N = p[0].shape[1]
    assert N % G1_BLOCK == 0
    r3 = lambda t: t.reshape(N_LIMBS, N // 128, 128)
    cs = _coord_spec()
    out = pl.pallas_call(
        _add_kernel_u if _on_tpu() else _add_kernel,
        out_shape=(_shape3(N),) * 3,
        grid=(N // G1_BLOCK,),
        in_specs=[cs] * 6,
        out_specs=(cs, cs, cs),
        scratch_shapes=[] if _on_tpu() else [
            pltpu.VMEM((N_LIMBS, G1_ROWS, 128), jnp.uint32)
        ],
        interpret=not _on_tpu(),
    )(*map(r3, p), *map(r3, q))
    return tuple(t.reshape(N_LIMBS, N) for t in out)
