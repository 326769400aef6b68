"""Validate + bench the pallas four-step NTT on the live chip.

Checks (vs the XLA transform + host bit-reversal algebra):
  1. fwd == NTT[P] at 2^14 and 2^16 (P = bitrev-block permutation)
  2. inv(fwd(x)) == x
  3. h-pipeline parity: pallas h_pipeline == the XLA intt/coset_ntt/
     coset_intt chain in zk/groth16.py, element for element
  4. throughput at 2^20 (fwd, inv, and a full h-pipeline) vs the XLA
     ntt leg the bench reports (~148 ms/transform)

Run: python scripts/val_pallas_ntt.py [--big]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crypto3_fil_proofs_tpu.ops import ntt as xntt
from crypto3_fil_proofs_tpu.ops.bls12_381 import FR_MULT_GEN, R as MOD
from crypto3_fil_proofs_tpu.ops.devsync import fetch_sync
from crypto3_fil_proofs_tpu.ops.fr_limbs import FR, fr_ops
from crypto3_fil_proofs_tpu.ops.pallas import ntt as pntt

rng = np.random.default_rng(3)


def rand_mont(n):
    vals = [int(rng.integers(0, 1 << 62)) % MOD for _ in range(n)]
    return vals, [(v * FR.mont_r) % MOD for v in vals]


def perm_P(log_n):
    p = pntt._plan(log_n)
    logR, logC = p["logR"], p["logC"]
    R_, C_ = 1 << logR, 1 << logC
    brR = xntt._bit_reverse_indices(logR)
    brC = xntt._bit_reverse_indices(logC)
    P = np.zeros(R_ * C_, np.int64)
    for kc in range(C_):
        for kr in range(R_):
            P[kc * R_ + kr] = brR[kr] + R_ * brC[kc]
    return P


def check(log_n):
    n = 1 << log_n
    _, mont = rand_mont(n)
    limbs = FR.to_limbs(mont)
    x = jnp.asarray(limbs)
    x_soa = jnp.asarray(limbs.T.copy())
    y = np.asarray(pntt.ntt_fwd_p(x_soa, log_n)).T
    want = np.asarray(xntt.ntt(x, log_n))
    P = perm_P(log_n)
    ok_f = np.array_equal(y, want[P])
    back = pntt.ntt_inv_p(
        pntt.ntt_fwd_p(jnp.asarray(limbs.T.copy()), log_n), log_n
    )
    ok_r = np.array_equal(np.asarray(back).T, limbs)
    print(f"2^{log_n}: fwd==NTT[P] {ok_f}  roundtrip {ok_r}", flush=True)
    assert ok_f and ok_r


def check_h(log_n):
    n = 1 << log_n
    m = n  # full-domain test
    mk = lambda seed: jnp.asarray(
        FR.to_limbs(rand_mont(n)[1])
    )
    a_m, b_m, c_m = mk(1), mk(2), mk(3)
    # XLA reference chain (zk/groth16.py:618-632)
    a_cos = xntt.coset_ntt(xntt.intt(a_m, log_n), log_n)
    b_cos = xntt.coset_ntt(xntt.intt(b_m, log_n), log_n)
    c_cos = xntt.coset_ntt(xntt.intt(c_m, log_n), log_n)
    ab = fr_ops.mont_mul(a_cos, b_cos)
    num = fr_ops.sub(ab, c_cos)
    z_inv = pow((pow(FR_MULT_GEN, m, MOD) - 1) % MOD, MOD - 2, MOD)
    z_inv_m = fr_ops.encode(z_inv)
    h_want = np.asarray(
        xntt.coset_intt(fr_ops.mont_mul(num, z_inv_m), log_n)
    )
    z_limbs = jnp.asarray(
        FR.to_limbs([(z_inv * FR.mont_r) % MOD])[0]
    )
    h_got = np.asarray(pntt.h_pipeline(a_m, b_m, c_m, log_n, z_limbs))
    ok = np.array_equal(h_got, h_want)
    print(f"2^{log_n}: h-pipeline parity {ok}", flush=True)
    assert ok


def bench(log_n, iters=4):
    n = 1 << log_n
    _, mont = rand_mont(min(n, 1 << 16))
    reps = n // len(mont)
    limbs = np.tile(FR.to_limbs(mont).T, (1, reps)).copy()
    x = jnp.asarray(limbs)
    y = pntt.ntt_fwd_p(x, log_n)
    fetch_sync(y)
    t0 = time.perf_counter()
    state = y
    for _ in range(iters):
        state = pntt.ntt_fwd_p(state, log_n)
    fetch_sync(state)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"2^{log_n} fwd: {dt:.1f} ms/transform", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = pntt.ntt_inv_p(state, log_n)
    fetch_sync(state)
    dti = (time.perf_counter() - t0) / iters * 1e3
    print(f"2^{log_n} inv: {dti:.1f} ms/transform", flush=True)
    return dt


if __name__ == "__main__":
    print(jax.devices())
    for ln in (14, 16):
        check(ln)
    check_h(14)
    bench(20)
    if "--big" in sys.argv:
        bench(22, iters=2)
