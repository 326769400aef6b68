"""Radix-2 NTT over BLS12-381 Fr on TPU (JAX limb lanes).

Replaces the reference's consumed `crypto3-fft`/`crypto3-math` FFT
domain used by the Groth16 QAP reduction (reference: SURVEY.md §2.9 P6;
.gitmodules:22-24,67-69 — the polynomial h(x) = (A*B - C)/Z_H is
computed by coset FFTs inside the consumed r1cs_gg_ppzsnark prover).

TPU-first shape: iterative Cooley-Tukey DIT. The input is bit-reverse
permuted (one gather), then each of the log2(n) stages is one batched
Montgomery multiply + modular add/sub over the whole vector — pure
VPU work with static shapes per stage. Twiddle tables are built on
device with log2(n) doubling concatenations (host supplies only the
per-stage roots).

Fr has 2-adicity 32 (ops/bls12_381.FR_TWO_ADICITY), so any size up to
2^32 is supported.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .bls12_381 import FR_MULT_GEN, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R
from .fr_limbs import FR, fr_ops


def _root_of_unity(log_n: int) -> int:
    assert log_n <= FR_TWO_ADICITY
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - log_n), R)


def _bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _twiddle_table(omega: int, count: int) -> np.ndarray:
    """[count, 16] Montgomery powers omega^0..omega^(count-1).

    Host-staged (plain numpy): NttPlan may be first constructed inside
    a jit trace, where device-side staging would leak tracers through
    the plan cache.
    """
    powers = []
    acc = FR.mont_r % R  # 1 in Montgomery form
    omega_mont_step = omega % R
    for _ in range(count):
        powers.append(acc)
        acc = (acc * omega_mont_step) % R
    return FR.to_limbs(powers)


@lru_cache(maxsize=None)
class NttPlan:
    """Precomputed domain of size 2^log_n (twiddles forward/inverse)."""

    def __init__(self, log_n: int):
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = _root_of_unity(log_n)
        self.omega_inv = pow(self.omega, R - 2, R)
        self.n_inv = pow(self.n, R - 2, R)
        self.bitrev = _bit_reverse_indices(log_n)
        self.tw_fwd = _twiddle_table(self.omega, max(self.n // 2, 1))
        self.tw_inv = _twiddle_table(self.omega_inv, max(self.n // 2, 1))
        self.n_inv_mont = FR.to_limbs((self.n_inv * FR.mont_r) % R)
        # coset generator (Fr multiplicative generator) powers, for the
        # Groth16 h(x) evaluation on gH
        self.gen = FR_MULT_GEN
        self.gen_inv = pow(FR_MULT_GEN, R - 2, R)
        self.coset_fwd = _twiddle_table(self.gen, self.n)
        self.coset_inv = _twiddle_table(self.gen_inv, self.n)


def _transform(a: jnp.ndarray, plan: NttPlan, twiddles: jnp.ndarray,
               bitrev=None):
    """Core DIT butterflies over [..., n, 16] Montgomery coefficients."""
    n = plan.n
    a = jnp.take(a, plan.bitrev if bitrev is None else bitrev, axis=-2)
    for s in range(1, plan.log_n + 1):
        m = 1 << s
        tw = twiddles[:: n // m][: m // 2]  # omega_m^j, j < m/2
        shape = a.shape[:-2] + (n // m, m, FR.n)
        blocks = a.reshape(shape)
        even = blocks[..., : m // 2, :]
        odd = blocks[..., m // 2 :, :]
        t = fr_ops.mont_mul(odd, tw)
        a = jnp.concatenate(
            [fr_ops.add(even, t), fr_ops.sub(even, t)], axis=-2
        ).reshape(a.shape)
    return a


from functools import partial

# Plan tables are passed as device ARGUMENTS, not captured constants:
# at log_n=22 the twiddle/coset tables are ~100-270 MB each and
# embedding them in the HLO makes the program too large to compile
# (the axon tunnel rejects it outright with HTTP 413).
_DEV_PLANS: dict = {}


def _dev_plan(log_n: int):
    entry = _DEV_PLANS.get(log_n)
    if entry is None:
        plan = NttPlan(log_n)
        entry = {
            "bitrev": jnp.asarray(plan.bitrev),
            "tw_fwd": jnp.asarray(plan.tw_fwd),
            "tw_inv": jnp.asarray(plan.tw_inv),
            "n_inv": jnp.asarray(plan.n_inv_mont),
            "coset_fwd": jnp.asarray(plan.coset_fwd),
            "coset_inv": jnp.asarray(plan.coset_inv),
        }
        _DEV_PLANS[log_n] = entry
    return entry


@partial(jax.jit, static_argnames=("log_n",))
def _ntt_run(a, bitrev, tw, log_n):
    return _transform(a, NttPlan(log_n), tw, bitrev)


@partial(jax.jit, static_argnames=("log_n",))
def _intt_run(a, bitrev, tw, n_inv, log_n):
    out = _transform(a, NttPlan(log_n), tw, bitrev)
    return fr_ops.mont_mul(out, n_inv)


@partial(jax.jit, static_argnames=("log_n",))
def _coset_ntt_run(a, bitrev, tw, coset, log_n):
    return _transform(
        fr_ops.mont_mul(a, coset), NttPlan(log_n), tw, bitrev
    )


@partial(jax.jit, static_argnames=("log_n",))
def _coset_intt_run(a, bitrev, tw, n_inv, coset_inv, log_n):
    out = _transform(a, NttPlan(log_n), tw, bitrev)
    out = fr_ops.mont_mul(out, n_inv)
    return fr_ops.mont_mul(out, coset_inv)


def release_plan(log_n: int) -> None:
    """Drop the device-resident plan tables for a size (at log_n=22 they
    hold ~1 GB of HBM — callers that are done transforming should free
    them before launching other large device work)."""
    entry = _DEV_PLANS.pop(log_n, None)
    if entry:
        for arr in entry.values():
            try:
                arr.delete()
            except Exception:
                pass


def ntt(a: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """Forward NTT of [..., n, 16] Montgomery-form coefficients."""
    d = _dev_plan(log_n)
    return _ntt_run(a, d["bitrev"], d["tw_fwd"], log_n)


def intt(a: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """Inverse NTT (includes the 1/n scale)."""
    d = _dev_plan(log_n)
    return _intt_run(a, d["bitrev"], d["tw_inv"], d["n_inv"], log_n)


def coset_ntt(a: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """Evaluate on the coset gH: scale coefficients by g^i, then NTT."""
    d = _dev_plan(log_n)
    return _coset_ntt_run(a, d["bitrev"], d["tw_fwd"], d["coset_fwd"], log_n)


def coset_intt(a: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """Inverse of coset_ntt: iNTT then scale by g^-i."""
    d = _dev_plan(log_n)
    return _coset_intt_run(
        a, d["bitrev"], d["tw_inv"], d["n_inv"], d["coset_inv"], log_n
    )


# ---------------------------------------------------------------------------
# Host helpers
# ---------------------------------------------------------------------------


def ntt_host(values: list[int], inverse: bool = False) -> list[int]:
    """O(n log n) host reference (python ints) for golden tests."""
    n = len(values)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    omega = _root_of_unity(log_n)
    if inverse:
        omega = pow(omega, R - 2, R)
    a = [values[i] % R for i in _bit_reverse_indices(log_n)]
    m = 2
    while m <= n:
        wm = pow(omega, n // m, R)
        for k in range(0, n, m):
            w = 1
            for j in range(m // 2):
                t = (w * a[k + j + m // 2]) % R
                u = a[k + j]
                a[k + j] = (u + t) % R
                a[k + j + m // 2] = (u - t) % R
                w = (w * wm) % R
        m *= 2
    if inverse:
        n_inv = pow(n, R - 2, R)
        a = [(v * n_inv) % R for v in a]
    return a
