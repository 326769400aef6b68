"""Batched BLS12-381 G2 arithmetic on TPU (Jacobian over Fq2 limb lanes).

G2 points back the Groth16 B commitment (one G2 MSM per proof —
reference consumed crypto3-zk r1cs_gg_ppzsnark; SURVEY.md §2.9 P5).

An Fq2 element is a pair (c0, c1) of Fq limb arrays [..., 24]; points
are (X, Y, Z) tuples of Fq2 pairs. Same branch-free formula style as
ops/g1_jax (validated against ops/bls12_381 host G2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bls12_381 import g2_to_affine
from .fr_limbs import FQ, fq_ops

_N = FQ.n


# ---------------------------------------------------------------------------
# Fq2 limb ops (c0 + c1*u, u^2 = -1)
# ---------------------------------------------------------------------------


def f2_add(a, b):
    return (fq_ops.add(a[0], b[0]), fq_ops.add(a[1], b[1]))


def f2_sub(a, b):
    return (fq_ops.sub(a[0], b[0]), fq_ops.sub(a[1], b[1]))


def f2_dbl(a):
    return f2_add(a, a)


def f2_mul(a, b):
    """Karatsuba: 3 Fq muls."""
    t0 = fq_ops.mont_mul(a[0], b[0])
    t1 = fq_ops.mont_mul(a[1], b[1])
    t2 = fq_ops.mont_mul(fq_ops.add(a[0], a[1]), fq_ops.add(b[0], b[1]))
    return (fq_ops.sub(t0, t1), fq_ops.sub(t2, fq_ops.add(t0, t1)))


def f2_sq(a):
    """(a0+a1)(a0-a1) + 2 a0 a1 u — 2 Fq muls."""
    c0 = fq_ops.mont_mul(fq_ops.add(a[0], a[1]), fq_ops.sub(a[0], a[1]))
    t = fq_ops.mont_mul(a[0], a[1])
    return (c0, fq_ops.add(t, t))


def f2_is_zero(a):
    return fq_ops.is_zero(a[0]) & fq_ops.is_zero(a[1])


def f2_select(cond, a, b):
    return (fq_ops.select(cond, a[0], b[0]), fq_ops.select(cond, a[1], b[1]))


def f2_zeros_like(a):
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))


# ---------------------------------------------------------------------------
# G2 Jacobian (mirrors g1_jax with Fq2 coordinates)
# ---------------------------------------------------------------------------


def infinity(shape=()):
    zero = jnp.zeros(shape + (_N,), dtype=jnp.uint32)
    one = jnp.broadcast_to(fq_ops.encode(1), shape + (_N,))
    f2_one = (one, zero)
    f2_zero = (zero, zero)
    return f2_one, f2_one, f2_zero


def is_infinity(p):
    return f2_is_zero(p[2])


def double(p):
    X1, Y1, Z1 = p
    A = f2_sq(X1)
    B = f2_sq(Y1)
    C = f2_sq(B)
    t = f2_sub(f2_sub(f2_sq(f2_add(X1, B)), A), C)
    D = f2_dbl(t)
    E = f2_add(f2_dbl(A), A)
    F = f2_sq(E)
    X3 = f2_sub(F, f2_dbl(D))
    eight_c = f2_dbl(f2_dbl(f2_dbl(C)))
    Y3 = f2_sub(f2_mul(E, f2_sub(D, X3)), eight_c)
    Z3 = f2_dbl(f2_mul(Y1, Z1))
    return X3, Y3, Z3


def add(p, q):
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = f2_sq(Z1)
    Z2Z2 = f2_sq(Z2)
    U1 = f2_mul(X1, Z2Z2)
    U2 = f2_mul(X2, Z1Z1)
    S1 = f2_mul(f2_mul(Y1, Z2), Z2Z2)
    S2 = f2_mul(f2_mul(Y2, Z1), Z1Z1)
    H = f2_sub(U2, U1)
    r = f2_dbl(f2_sub(S2, S1))
    I = f2_sq(f2_dbl(H))
    J = f2_mul(H, I)
    V = f2_mul(U1, I)
    X3 = f2_sub(f2_sub(f2_sq(r), J), f2_dbl(V))
    Y3 = f2_sub(f2_mul(r, f2_sub(V, X3)), f2_dbl(f2_mul(S1, J)))
    Z3 = f2_mul(H, f2_sub(f2_sub(f2_sq(f2_add(Z1, Z2)), Z1Z1), Z2Z2))

    h_zero = f2_is_zero(H)
    r_zero = f2_is_zero(r)
    inf1 = is_infinity(p)
    inf2 = is_infinity(q)
    dX, dY, dZ = double(p)

    same = h_zero & r_zero & ~inf1 & ~inf2
    neg = h_zero & ~r_zero & ~inf1 & ~inf2
    X = f2_select(same, dX, X3)
    Y = f2_select(same, dY, Y3)
    Z = f2_select(same, dZ, Z3)
    Z = f2_select(neg, f2_zeros_like(Z), Z)
    X = f2_select(inf1, X2, f2_select(inf2, X1, X))
    Y = f2_select(inf1, Y2, f2_select(inf2, Y1, Y))
    Z = f2_select(inf1, Z2, f2_select(inf2, Z1, Z))
    return X, Y, Z


def add_mixed(p, q_affine, q_valid=None):
    X1, Y1, Z1 = p
    x2, y2 = q_affine
    Z1Z1 = f2_sq(Z1)
    U2 = f2_mul(x2, Z1Z1)
    S2 = f2_mul(f2_mul(y2, Z1), Z1Z1)
    H = f2_sub(U2, X1)
    HH = f2_sq(H)
    I = f2_dbl(f2_dbl(HH))
    J = f2_mul(H, I)
    r = f2_dbl(f2_sub(S2, Y1))
    V = f2_mul(X1, I)
    X3 = f2_sub(f2_sub(f2_sq(r), J), f2_dbl(V))
    Y3 = f2_sub(f2_mul(r, f2_sub(V, X3)), f2_dbl(f2_mul(Y1, J)))
    Z3 = f2_sub(f2_sub(f2_sq(f2_add(Z1, H)), Z1Z1), HH)

    h_zero = f2_is_zero(H)
    r_zero = f2_is_zero(r)
    inf1 = is_infinity(p)
    dX, dY, dZ = double(p)
    one = jnp.broadcast_to(fq_ops.encode(1), X1[0].shape)
    f2_one = (one, jnp.zeros_like(one))

    same = h_zero & r_zero & ~inf1
    neg = h_zero & ~r_zero & ~inf1
    X = f2_select(same, dX, X3)
    Y = f2_select(same, dY, Y3)
    Z = f2_select(same, dZ, Z3)
    Z = f2_select(neg, f2_zeros_like(Z), Z)
    X = f2_select(inf1, x2, X)
    Y = f2_select(inf1, y2, Y)
    Z = f2_select(inf1, f2_one, Z)
    if q_valid is not None:
        X = f2_select(q_valid, X, X1)
        Y = f2_select(q_valid, Y, Y1)
        Z = f2_select(q_valid, Z, Z1)
    return X, Y, Z


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def points_to_device(points):
    """Host G2 points -> affine Fq2 Montgomery limb arrays + valid mask."""
    x0, x1, y0, y1, valid = [], [], [], [], []
    for pt in points:
        aff = g2_to_affine(pt) if (pt is not None and len(pt) == 3) else pt
        if aff is None:
            x0.append(0), x1.append(0), y0.append(0), y1.append(0)
            valid.append(False)
        else:
            (a0, a1), (b0, b1) = aff
            x0.append(a0), x1.append(a1), y0.append(b0), y1.append(b1)
            valid.append(True)
    enc = fq_ops.encode
    return (
        ((enc(x0), enc(x1)), (enc(y0), enc(y1))),
        jnp.asarray(np.array(valid)),
    )


def points_from_device(p):
    X0 = fq_ops.decode(p[0][0])
    X1 = fq_ops.decode(p[0][1])
    Y0 = fq_ops.decode(p[1][0])
    Y1 = fq_ops.decode(p[1][1])
    Z0 = fq_ops.decode(p[2][0])
    Z1 = fq_ops.decode(p[2][1])
    return [
        ((a, b), (c, d), (e, f))
        for a, b, c, d, e, f in zip(X0, X1, Y0, Y1, Z0, Z1)
    ]


# ---------------------------------------------------------------------------
# Device batch normalization (Jacobian -> staged affine, no host loops)
# ---------------------------------------------------------------------------


@jax.jit
def _fq2_zinv_pieces(Z):
    """Fq2 inversion reduces to Fq: 1/(a+bi) = (a-bi)/(a^2+b^2).
    Returns (norm [n, 24], conj) for the batch-inverted norm path."""
    a, b = Z
    norm = fq_ops.add(fq_ops.mont_mul(a, a), fq_ops.mont_mul(b, b))
    return norm, (a, fq_ops.neg(b))


@jax.jit
def _affine_from_zinv2(X, Y, zinv, valid):
    zinv2 = f2_sq(zinv)
    zinv3 = f2_mul(zinv2, zinv)
    x = f2_mul(X, zinv2)
    y = f2_mul(Y, zinv3)
    m = valid[:, None]
    zero = lambda pair: tuple(jnp.where(m, c, 0) for c in pair)
    return zero(x), zero(y)


def normalize_batch(X, Y, Z):
    """Device G2 Jacobian batch -> staged affine (((x0,x1),(y0,y1)),
    valid) with one host Fq inversion for the whole batch (mirrors
    g1_jax.normalize_batch; Fq2 inverse via the conjugate/norm identity
    so the batch scan stays in Fq)."""
    from .g1_jax import batch_fq_inverse

    valid = ~is_infinity((X, Y, Z))
    norm, conj = _fq2_zinv_pieces(Z)
    norm_inv = batch_fq_inverse(norm, valid)
    zinv = (
        fq_ops.mont_mul(conj[0], norm_inv),
        fq_ops.mont_mul(conj[1], norm_inv),
    )
    x, y = _affine_from_zinv2(X, Y, zinv, valid)
    return (x, y), valid
