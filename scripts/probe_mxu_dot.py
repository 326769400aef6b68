"""Probe: exact integer matmuls on the MXU from inside a Pallas kernel.

The poseidon kernel's dense/sparse linear maps (MDS mix, w_hat columns,
partial-round accumulation rows) are constant matrices applied to the
state's limbs — a matmul in a small-limb basis. If the MXU can do
int8 x int8 -> int32 (exact), the whole linear side of the permutation
leaves the VPU (which today spends ~60% of its ops there: PLAN r4).

Measures/validates, in order:
  1. pallas kernel: jnp.dot(A_i8[M,K], B_i8[K,N], preferred=int32)
     vs numpy int32 reference (exactness + support).
  2. same with bf16 inputs / f32 accumulate (7-bit-limb fallback).
  3. throughput of the int8 dot at poseidon-mix shapes
     (M=896, K=384, N=1024 per block, grid over blocks).

Run on the TPU: python scripts/probe_mxu_dot.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, a_np, b_np, out_dtype, pref):
    M, K = a_np.shape
    K2, N = b_np.shape

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=pref
        )

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a_np), jnp.asarray(b_np))
        got = np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED to lower/run: {type(e).__name__}: {str(e)[:300]}")
        return False
    want = a_np.astype(np.int64) @ b_np.astype(np.int64)
    ok = np.array_equal(got.astype(np.int64), want)
    print(f"{name}: ran, exact={ok}  (max|diff|={np.abs(got.astype(np.int64)-want).max()})")
    return ok


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # 1. int8 x int8 -> int32
    a8 = rng.integers(0, 127, size=(256, 384), dtype=np.int8)
    b8 = rng.integers(0, 127, size=(384, 1024), dtype=np.int8)
    i8_ok = run_case("int8->int32", a8, b8, jnp.int32, jnp.int32)

    # 1b. uint8 operands (limbs are unsigned)
    au = rng.integers(0, 255, size=(256, 384), dtype=np.uint8)
    bu = rng.integers(0, 255, size=(384, 1024), dtype=np.uint8)
    try:
        run_case("uint8->int32", au.view(np.int8), bu.view(np.int8), jnp.int32, jnp.int32)
    except Exception as e:  # noqa: BLE001
        print("uint8 via int8 view: n/a", e)

    # 2. bf16 (7-bit limbs) -> f32
    a7 = rng.integers(0, 127, size=(256, 384)).astype(jnp.bfloat16)
    b7 = rng.integers(0, 127, size=(384, 1024)).astype(jnp.bfloat16)
    def bf16_case():
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a7, b7)
        got = np.asarray(out).astype(np.int64)
        want = np.asarray(a7, dtype=np.float64).astype(np.int64) @ np.asarray(
            b7, dtype=np.float64
        ).astype(np.int64)
        print("bf16->f32: ran, exact=", np.array_equal(got, want))
        return np.array_equal(got, want)
    try:
        bf_ok = bf16_case()
    except Exception as e:  # noqa: BLE001
        print("bf16->f32: FAILED", type(e).__name__, str(e)[:300])
        bf_ok = False

    # 2b. dot_general with 3-D B [K, R, 128] (kernel-native lane layout)
    a_np = rng.integers(0, 127, size=(256, 384)).astype(np.float32)
    b_np = rng.integers(0, 255, size=(384, 8, 128)).astype(np.float32)

    def kernel3(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16),
            b_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try:
        out = pl.pallas_call(
            kernel3,
            out_shape=jax.ShapeDtypeStruct((256, 8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a_np), jnp.asarray(b_np))
        got = np.asarray(out).astype(np.int64)
        want = np.einsum(
            "mk,krl->mrl", a_np.astype(np.int64), b_np.astype(np.int64)
        )
        # exactness only guaranteed for K<=192 chunks; this probes K=384
        # with 7-bit x 8-bit terms (sum < 384*127*255 = 1.2e7 < 2^24: ok)
        print("dot_general 3D-B bf16: ran, exact=", np.array_equal(got, want))
    except Exception as e:  # noqa: BLE001
        print("dot_general 3D-B bf16: FAILED", type(e).__name__, str(e)[:300])

    # 3. throughput at poseidon-mix shape
    if i8_ok or bf_ok:
        M, K, N, G = 896, 384, 1024, 64
        if i8_ok:
            A = jnp.asarray(rng.integers(0, 127, size=(M, K), dtype=np.int8))
            B = jnp.asarray(rng.integers(0, 127, size=(G, K, N), dtype=np.int8))
            pref, odt = jnp.int32, jnp.int32
        else:
            A = jnp.asarray(rng.integers(0, 127, size=(M, K))).astype(jnp.bfloat16)
            B = jnp.asarray(rng.integers(0, 127, size=(G, K, N))).astype(jnp.bfloat16)
            pref, odt = jnp.float32, jnp.float32

        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=pref)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, M, N), odt),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, M, K), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        f = jax.jit(lambda a, b: f(a[None], b))
        out = f(A, B)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(A, B)
        np.asarray(out[0, :1, :1])  # fetch barrier
        dt = (time.perf_counter() - t0) / 4
        macs = 2 * M * K * N * G
        print(f"dot blocks: {dt*1e3:.2f} ms for {G} blocks -> {macs/dt/1e12:.2f} Tops")


if __name__ == "__main__":
    main()
