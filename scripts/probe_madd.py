"""Probe: G1 mixed-add kernel throughput — scratch-ref fori CIOS
(current ops/pallas/g1.py) vs fully-unrolled list-based CIOS (the NTT
kernel's _cios style: limb shifts as trace-time list renames, b limbs
as values).

The madd kernel measures 31M adds/s while the dedicated montmul kernel
does 2.64G/s (HBM-bound); at ~11 montmuls + ~25 addsubs per madd the
compute bound is ~200-300M adds/s, so ~10x is on the table if the
scratch round-trips and concatenate-shifts are what's eating it.

Usage: python scripts/probe_madd.py [log_n] [rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.fr_limbs import FQ, LIMB_BITS, LIMB_MASK
from crypto3_fil_proofs_tpu.ops.pallas import g1 as pg1

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 1 << LOG_N
NL = FQ.n
N0INV = int(FQ.n0inv)
P_LIMBS = [int(v) for v in FQ.p_np]
_mask = LIMB_MASK  # plain int: folds into the instruction stream
ONE_MONT = pg1._ONE_MONT


# ---- list-based helpers (ntt-kernel style, FQ width) ----------------------


def u_sub_if_ge(t):
    borrow = jnp.zeros_like(t[0])
    diff = []
    for j in range(NL):
        s = jnp.uint32(P_LIMBS[j]) + borrow
        d = t[j] - s
        borrow = (t[j] < s).astype(jnp.uint32)
        diff.append(d & _mask)
    ge = borrow == 0
    return [jnp.where(ge, diff[j], t[j]) for j in range(NL)]


def u_add(a, b):
    limbs, carry = [], jnp.zeros_like(a[0])
    for j in range(NL):
        v = a[j] + b[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    return u_sub_if_ge(limbs)


def u_sub(a, b):
    borrow = jnp.zeros_like(a[0])
    pb = []
    for j in range(NL):
        s = b[j] + borrow
        d = jnp.uint32(P_LIMBS[j]) - s
        borrow = (jnp.uint32(P_LIMBS[j]) < s).astype(jnp.uint32)
        pb.append(d & _mask)
    return u_add(a, pb)


def u_mul(a, b):
    t = [jnp.zeros_like(a[0]) for _ in range(NL + 1)]
    for i in range(NL):
        bi = b[i]
        t0 = t[0] + ((a[0] * bi) & _mask)
        m = (t0 * jnp.uint32(N0INV)) & _mask
        for j in range(NL):
            prod = a[j] * bi
            q = m * jnp.uint32(P_LIMBS[j])
            t[j] = t[j] + ((prod & _mask) + (q & _mask))
            t[j + 1] = t[j + 1] + ((prod >> LIMB_BITS) + (q >> LIMB_BITS))
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t[0])]
        t[0] = t[0] + carry
    limbs, carry = [], jnp.zeros_like(t[0])
    for j in range(NL):
        v = t[j] + carry
        limbs.append(v & _mask)
        carry = v >> LIMB_BITS
    return u_sub_if_ge(limbs)


def u_dbl(a):
    return u_add(a, a)


def u_is_zero(x):
    acc = x[0]
    for j in range(1, NL):
        acc = acc | x[j]
    return acc == 0


def u_sel(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _madd_nodbl_unrolled_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                                valid_ref, ox_ref, oy_ref, oz_ref, same_ref):
    X1 = [x1_ref[j] for j in range(NL)]
    Y1 = [y1_ref[j] for j in range(NL)]
    Z1 = [z1_ref[j] for j in range(NL)]
    x2 = [x2_ref[j] for j in range(NL)]
    y2 = [y2_ref[j] for j in range(NL)]
    valid = valid_ref[:] != 0

    Z1Z1 = u_mul(Z1, Z1)
    U2 = u_mul(x2, Z1Z1)
    S2 = u_mul(u_mul(y2, Z1), Z1Z1)
    H = u_sub(U2, X1)
    HH = u_mul(H, H)
    I = u_dbl(u_dbl(HH))
    J = u_mul(H, I)
    r = u_dbl(u_sub(S2, Y1))
    V = u_mul(X1, I)
    X3 = u_sub(u_sub(u_mul(r, r), J), u_dbl(V))
    Y3 = u_sub(u_mul(r, u_sub(V, X3)), u_dbl(u_mul(Y1, J)))
    zh = u_add(Z1, H)
    Z3 = u_sub(u_sub(u_mul(zh, zh), Z1Z1), HH)

    h_zero = u_is_zero(H)
    r_zero = u_is_zero(r)
    inf1 = u_is_zero(Z1)

    same = h_zero & r_zero & ~inf1 & valid
    neg = h_zero & ~r_zero & ~inf1

    one = [jnp.full_like(X1[0], jnp.uint32(v)) for v in ONE_MONT]
    zero = [jnp.zeros_like(X1[0]) for _ in range(NL)]
    X, Y, Z = X3, Y3, Z3
    Z = u_sel(neg, zero, Z)
    X = u_sel(inf1, x2, X)
    Y = u_sel(inf1, y2, Y)
    Z = u_sel(inf1, one, Z)
    keep = ~valid | same
    X = u_sel(keep, X1, X)
    Y = u_sel(keep, Y1, Y)
    Z = u_sel(keep, Z1, Z)
    for j in range(NL):
        ox_ref[j] = X[j]
        oy_ref[j] = Y[j]
        oz_ref[j] = Z[j]
    same_ref[:] = same.astype(jnp.uint32)


BLOCK = ROWS * 128


@jax.jit
def madd_nodbl_unrolled(acc, q, valid):
    X, Y, Z = acc
    x2, y2 = q
    n = X.shape[1]
    r3 = lambda t: t.reshape(NL, n // 128, 128)
    vmask = valid.astype(jnp.uint32).reshape(n // 128, 128)
    cs = pl.BlockSpec((NL, ROWS, 128), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _madd_nodbl_unrolled_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n // 128, 128), jnp.uint32),) * 3
        + (jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32),),
        grid=(n // BLOCK,),
        in_specs=[cs, cs, cs, cs, cs, ms],
        out_specs=(cs, cs, cs, ms),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * (1 << 20)
        ),
        interpret=jax.default_backend() == "cpu",
    )(r3(X), r3(Y), r3(Z), r3(x2), r3(y2), vmask)
    return tuple(t.reshape(NL, n) for t in out[:3]) + (out[3].reshape(n),)


def main():
    rng = np.random.default_rng(0)
    print(f"N=2^{LOG_N} rows={ROWS} backend={jax.default_backend()}")
    # random field-ish values (correctness separately vs current kernel)
    def mk():
        # canonical inputs (< p): the sub formulations only agree on
        # canonical operands
        raw = rng.integers(0, 1 << 16, size=(NL, N), dtype=np.uint32)
        raw[NL - 1] %= int(FQ.p_np[NL - 1])  # strictly below p's top limb
        return jnp.asarray(raw)
    X, Y, Z, x2, y2 = mk(), mk(), mk(), mk(), mk()
    valid = jnp.ones(N, jnp.uint32)

    # correctness: unrolled == current kernel on the same inputs
    cur = pg1.madd_nodbl_soa((X, Y, Z), (x2, y2), valid)
    new = madd_nodbl_unrolled((X, Y, Z), (x2, y2), valid)
    for a, b in zip(cur, new):
        assert np.array_equal(np.asarray(a), np.asarray(b)), "MISMATCH"
    print("parity OK")

    def bench(name, fn):
        s = (X, Y, Z)
        out = fn(s, (x2, y2), valid)
        fetch_sync(out[0])
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fn(out[:3], (x2, y2), valid)
        fetch_sync(out[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {N/dt/1e6:8.1f} M adds/s  ({dt*1e3:.1f} ms)")

    bench("current", pg1.madd_nodbl_soa)
    bench("unrolled", madd_nodbl_unrolled)


if __name__ == "__main__":
    main()


# ---- variant: current scratch-CIOS structure, parameterized rows ----------


def make_madd_rows(rows):
    from crypto3_fil_proofs_tpu.ops.pallas.g1 import _madd_nodbl_kernel

    block = rows * 128

    @jax.jit
    def madd(acc, q, valid):
        X, Y, Z = acc
        x2, y2 = q
        n = X.shape[1]
        r3 = lambda t: t.reshape(NL, n // 128, 128)
        vmask = valid.astype(jnp.uint32).reshape(n // 128, 128)
        cs = pl.BlockSpec((NL, rows, 128), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
        ms = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _madd_nodbl_kernel,
            out_shape=(jax.ShapeDtypeStruct((NL, n // 128, 128), jnp.uint32),) * 3
            + (jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32),),
            grid=(n // block,),
            in_specs=[cs, cs, cs, cs, cs, ms],
            out_specs=(cs, cs, cs, ms),
            scratch_shapes=[pltpu.VMEM((NL, rows, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * (1 << 20)
            ),
            interpret=jax.default_backend() == "cpu",
        )(r3(X), r3(Y), r3(Z), r3(x2), r3(y2), vmask)
        return tuple(t.reshape(NL, n) for t in out[:3]) + (out[3].reshape(n),)

    return madd


def sweep():
    rng = np.random.default_rng(0)
    def mk():
        raw = rng.integers(0, 1 << 16, size=(NL, N), dtype=np.uint32)
        raw[NL - 1] %= int(FQ.p_np[NL - 1])
        return jnp.asarray(raw)
    X, Y, Z, x2, y2 = mk(), mk(), mk(), mk(), mk()
    valid = jnp.ones(N, jnp.uint32)
    for rows in (8, 16, 32, 64):
        fn = make_madd_rows(rows)
        try:
            out = fn((X, Y, Z), (x2, y2), valid)
            fetch_sync(out[0])
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(out[:3], (x2, y2), valid)
            fetch_sync(out[0])
            dt = (time.perf_counter() - t0) / 5
            print(f"rows={rows:3d}  {N/dt/1e6:8.1f} M adds/s ({dt*1e3:.1f} ms)")
        except Exception as e:
            print(f"rows={rows:3d}  FAIL {str(e)[-120:]}")


if __name__ == "__main__" and os.environ.get("SWEEP"):
    sweep()


def make_unrolled_rows(rows, subv=2):
    block = rows * 128

    def u_sub2(a, b):
        # borrow-style: 2 carry chains (sub, +p fixup) vs 3 for add(a,p-b)
        diff = []
        borrow = jnp.zeros_like(a[0])
        for j in range(NL):
            s = b[j] + borrow
            d = a[j] - s
            borrow = (a[j] < s).astype(jnp.uint32)
            diff.append(d & _mask)
        neg = borrow != 0
        out = []
        carry = jnp.zeros_like(a[0])
        for j in range(NL):
            v = diff[j] + jnp.uint32(P_LIMBS[j]) + carry
            out.append(v & _mask)
            carry = v >> LIMB_BITS
        return [jnp.where(neg, o, d) for o, d in zip(out, diff)]

    sub = u_sub2 if subv == 2 else u_sub

    def kern(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
             valid_ref, ox_ref, oy_ref, oz_ref, same_ref):
        X1 = [x1_ref[j] for j in range(NL)]
        Y1 = [y1_ref[j] for j in range(NL)]
        Z1 = [z1_ref[j] for j in range(NL)]
        x2 = [x2_ref[j] for j in range(NL)]
        y2 = [y2_ref[j] for j in range(NL)]
        valid = valid_ref[:] != 0
        Z1Z1 = u_mul(Z1, Z1)
        U2 = u_mul(x2, Z1Z1)
        S2 = u_mul(u_mul(y2, Z1), Z1Z1)
        H = sub(U2, X1)
        HH = u_mul(H, H)
        I = u_dbl(u_dbl(HH))
        J = u_mul(H, I)
        r = u_dbl(sub(S2, Y1))
        V = u_mul(X1, I)
        X3 = sub(sub(u_mul(r, r), J), u_dbl(V))
        Y3 = sub(u_mul(r, sub(V, X3)), u_dbl(u_mul(Y1, J)))
        zh = u_add(Z1, H)
        Z3 = sub(sub(u_mul(zh, zh), Z1Z1), HH)
        h_zero = u_is_zero(H)
        r_zero = u_is_zero(r)
        inf1 = u_is_zero(Z1)
        same = h_zero & r_zero & ~inf1 & valid
        neg = h_zero & ~r_zero & ~inf1
        one = [jnp.full_like(X1[0], jnp.uint32(v)) for v in ONE_MONT]
        zero = [jnp.zeros_like(X1[0]) for _ in range(NL)]
        X, Y, Z = X3, Y3, Z3
        Z = u_sel(neg, zero, Z)
        X = u_sel(inf1, x2, X)
        Y = u_sel(inf1, y2, Y)
        Z = u_sel(inf1, one, Z)
        keep = ~valid | same
        X = u_sel(keep, X1, X)
        Y = u_sel(keep, Y1, Y)
        Z = u_sel(keep, Z1, Z)
        for j in range(NL):
            ox_ref[j] = X[j]
            oy_ref[j] = Y[j]
            oz_ref[j] = Z[j]
        same_ref[:] = same.astype(jnp.uint32)

    @jax.jit
    def madd(acc, q, valid):
        X, Y, Z = acc
        x2, y2 = q
        n = X.shape[1]
        r3 = lambda t: t.reshape(NL, n // 128, 128)
        vmask = valid.astype(jnp.uint32).reshape(n // 128, 128)
        cs = pl.BlockSpec((NL, rows, 128), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
        ms = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((NL, n // 128, 128), jnp.uint32),) * 3
            + (jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32),),
            grid=(n // block,),
            in_specs=[cs, cs, cs, cs, cs, ms],
            out_specs=(cs, cs, cs, ms),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * (1 << 20)
            ),
            interpret=jax.default_backend() == "cpu",
        )(r3(X), r3(Y), r3(Z), r3(x2), r3(y2), vmask)
        return tuple(t.reshape(NL, n) for t in out[:3]) + (out[3].reshape(n),)

    return madd


def sweep2():
    rng = np.random.default_rng(0)
    def mk():
        raw = rng.integers(0, 1 << 16, size=(NL, N), dtype=np.uint32)
        raw[NL - 1] %= int(FQ.p_np[NL - 1])
        return jnp.asarray(raw)
    X, Y, Z, x2, y2 = mk(), mk(), mk(), mk(), mk()
    valid = jnp.ones(N, jnp.uint32)
    ref = pg1.madd_nodbl_soa((X, Y, Z), (x2, y2), valid)
    for rows in (2, 4, 8, 16):
        for subv in (2,):
            fn = make_unrolled_rows(rows, subv)
            try:
                out = fn((X, Y, Z), (x2, y2), valid)
                for a, b in zip(ref, out):
                    assert np.array_equal(np.asarray(a), np.asarray(b)), "MISMATCH"
                fetch_sync(out[0])
                t0 = time.perf_counter()
                for _ in range(5):
                    out = fn(out[:3], (x2, y2), valid)
                fetch_sync(out[0])
                dt = (time.perf_counter() - t0) / 5
                print(f"unrolled rows={rows:3d} sub{subv}  {N/dt/1e6:8.1f} M adds/s ({dt*1e3:.1f} ms)")
            except AssertionError:
                print(f"unrolled rows={rows:3d} sub{subv}  MISMATCH")
            except Exception as e:
                print(f"unrolled rows={rows:3d} sub{subv}  FAIL {str(e)[-100:]}")


if __name__ == "__main__" and os.environ.get("SWEEP2"):
    sweep2()
