"""Groth16 zkSNARK over BLS12-381 (r1cs_gg_ppzsnark equivalent).

Replaces the reference's consumed crypto3-zk `r1cs_gg_ppzsnark` +
bellperson semantics (reference: core/proof/multi_proof.hpp:34 proof
type, core/proof/compound_proof.hpp:89-137 prove/verify plumbing,
SINGLE_PARTITION_PROOF_LEN=192 constants.hpp:93).

TPU split:
- setup: QAP Lagrange evaluation at tau on host bigints; the O(n)
  fixed-base scalar multiplications run on device (bit-sliced batched
  mixed-adds over the precomputed 2^k*G table).
- prove: QAP witness reduction h(x) via device coset NTTs (ops/ntt),
  commitments via device Pippenger MSMs (ops/msm, G1 + one G2).
- verify: host optimal-ate pairing (ops/bls12_381) — verification is
  cheap and latency-bound, not worth a device round-trip.

Proof serialization is the zcash-compressed 192-byte layout
(a:G1 48 | b:G2 96 | c:G1 48), matching the reference's
multi_proof 192 B/partition wire format.
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import g1_jax, g2_jax, msm as msm_mod
from ..ops.bls12_381 import (
    G1_GEN,
    G1_INF,
    G2_GEN_X,
    G2_GEN_Y,
    R,
    g1_add,
    g1_from_affine,
    g1_mul,
    g1_neg,
    g1_to_affine,
    g1_to_compressed,
    g1_from_compressed,
    g2_add,
    g2_from_affine,
    g2_mul,
    g2_to_affine,
    g2_to_compressed,
    g2_from_compressed,
    fq_inv,
    multi_pairing,
    FQ12_ONE,
)
from ..ops.fr_limbs import FR, fq_ops
from ..ops.ntt import NttPlan, coset_intt, coset_ntt, intt, ntt_host
from .r1cs import ConstraintSystem

P_MOD = g1_jax.FQ.modulus


# ---------------------------------------------------------------------------
# Key / proof types
# ---------------------------------------------------------------------------


@dataclass
class Proof:
    a: tuple  # host G1 Jacobian
    b: tuple  # host G2 Jacobian
    c: tuple

    def to_bytes(self) -> bytes:
        return (
            g1_to_compressed(self.a)
            + g2_to_compressed(self.b)
            + g1_to_compressed(self.c)
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "Proof":
        assert len(data) == 192, "Groth16 proof must be 192 bytes"
        return cls(
            g1_from_compressed(data[:48]),
            g2_from_compressed(data[48:144]),
            g1_from_compressed(data[144:192]),
        )


@dataclass
class VerifyingKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    ic: list  # G1 points, len = num_inputs

    def to_npz_dict(self) -> dict:
        enc = _points_to_bytes
        return {
            "vk_alpha": enc([self.alpha_g1], g1_to_compressed),
            "vk_beta": enc([self.beta_g2], g2_to_compressed),
            "vk_gamma": enc([self.gamma_g2], g2_to_compressed),
            "vk_delta": enc([self.delta_g2], g2_to_compressed),
            "vk_ic": enc(self.ic, g1_to_compressed),
        }

    @classmethod
    def from_npz_dict(cls, d) -> "VerifyingKey":
        return cls(
            _points_from_bytes(d["vk_alpha"], g1_from_compressed, 48)[0],
            _points_from_bytes(d["vk_beta"], g2_from_compressed, 96)[0],
            _points_from_bytes(d["vk_gamma"], g2_from_compressed, 96)[0],
            _points_from_bytes(d["vk_delta"], g2_from_compressed, 96)[0],
            _points_from_bytes(d["vk_ic"], g1_from_compressed, 48),
        )


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: tuple
    delta_g1: tuple
    # device-ready affine query tables (numpy uint32 limb arrays, mont form)
    a_query: tuple  # (x[N,24], y[N,24], valid[N])
    b_g1_query: tuple
    b_g2_query: tuple  # (((x0,x1),(y0,y1)), valid)
    h_query: tuple
    l_query: tuple
    log_n: int


def _points_to_bytes(points, compress) -> np.ndarray:
    return np.frombuffer(b"".join(compress(p) for p in points), dtype=np.uint8)


def _points_from_bytes(data, decompress, size) -> list:
    raw = bytes(np.asarray(data, dtype=np.uint8))
    return [decompress(raw[i : i + size]) for i in range(0, len(raw), size)]


# ---------------------------------------------------------------------------
# Device fixed-base batch scalar multiplication (setup workhorse)
# ---------------------------------------------------------------------------


def _window_table(gen, add, inf):
    """Host [d * 16^k * G for k in 0..63, d in 0..15], row-major flat.

    4-bit windowed fixed-base: the device loop runs 64 gather+mixed-add
    iterations instead of 256 bit-serial ones (4x fewer point adds —
    the CRS generation workhorse, reference paramcache main.cpp:121-149).
    The d=0 entries are infinity and masked off by digit != 0.
    """
    flat, p = [], gen
    for _ in range(64):
        cur = inf
        flat.append(inf)
        for _ in range(15):
            cur = add(cur, p)
            flat.append(cur)
        for _ in range(4):
            p = add(p, p)
    return flat


# Below this size host bigint arithmetic beats the device path: the
# bit-sliced fori bodies are ~15k (G1) / ~45k (G2) equation XLA
# programs whose first compile costs minutes (G1) to the better part of
# an hour (G2) on CPU — far more than small batches ever repay.
HOST_FALLBACK_N = 16384


def batch_fixed_base_g1(scalars: list[int]) -> list:
    """[s_i * G] for many scalars, device bit-sliced accumulation.

    Padded to a power of two so different query lengths share one
    compiled program (zero scalars produce infinity rows, sliced off).
    """
    n_real = len(scalars)
    if n_real == 0:
        return []
    if n_real <= HOST_FALLBACK_N:
        g = g1_from_affine(G1_GEN)
        return [g1_mul(g, s % R) for s in scalars]
    table = _window_table(g1_from_affine(G1_GEN), g1_add, G1_INF)
    tx, ty, _ = g1_jax.points_to_device(table)
    tx = tx.reshape(64, 16, -1)
    ty = ty.reshape(64, 16, -1)
    all_limbs = FR.to_limbs([s % R for s in scalars])
    out = []
    # chunked so the while-body's live temps ([chunk, 24] u32 each) fit
    # HBM at any query length; every chunk reuses one compiled program
    for limbs in _fixed_base_chunks(all_limbs):
        X, Y, Z = _fixed_base_g1_run(jnp.asarray(limbs), tx, ty)
        out.extend(_g1_batch_to_host_affine(X, Y, Z))
    return out[:n_real]


# 2^20 rows/launch: ~5 GB of fused while-body temps on a 16 GB chip
# (measured: 2^22 rows wants ~22 GB and OOMs the v5e)
FIXED_BASE_CHUNK = 1 << 20


def _fixed_base_chunks(all_limbs: np.ndarray, chunk_size: int = FIXED_BASE_CHUNK):
    n_real = all_limbs.shape[0]
    chunk = min(chunk_size, max(16, 1 << (n_real - 1).bit_length()))
    for lo in range(0, n_real, chunk):
        part = all_limbs[lo : lo + chunk]
        if part.shape[0] < chunk:
            part = np.concatenate(
                [part, np.zeros((chunk - part.shape[0], 16), dtype=np.uint32)]
            )
        yield part


@jax.jit
def _fixed_base_g1_run(limbs, tx, ty):
    n = limbs.shape[0]
    acc = g1_jax.infinity((n,))

    def body(k, acc):
        digit = (limbs[:, k // 4] >> (4 * (k % 4))) & 0xF
        q = (tx[k][digit], ty[k][digit])
        return g1_jax.add_mixed(acc, q, digit != 0)

    return jax.lax.fori_loop(0, 64, body, acc)


def batch_fixed_base_g1_staged(scalars: list[int]) -> tuple:
    """[s_i * G] staged directly in the ProvingKey query layout
    (px [N,24], py [N,24], valid [N]) — Jacobian results are normalized
    ON DEVICE (g1_jax.normalize_batch: batch-inverse scans + one host
    inversion per chunk), so CRS generation never walks points through
    host bigints. Bit-identical to _stage_g1(batch_fixed_base_g1(...));
    at the 11M-point scale of a mid-size window-PoSt query the host
    normalization loop alone cost minutes (VERDICT r5 item 1)."""
    n_real = len(scalars)
    if n_real <= HOST_FALLBACK_N:
        return _stage_g1(batch_fixed_base_g1(scalars))
    table = _window_table(g1_from_affine(G1_GEN), g1_add, G1_INF)
    tx, ty, _ = g1_jax.points_to_device(table)
    tx = tx.reshape(64, 16, -1)
    ty = ty.reshape(64, 16, -1)
    all_limbs = FR.to_limbs([s % R for s in scalars])
    xs, ys, vs = [], [], []
    for limbs in _fixed_base_chunks(all_limbs):
        X, Y, Z = _fixed_base_g1_run(jnp.asarray(limbs), tx, ty)
        x, y, v = g1_jax.normalize_batch(X, Y, Z)
        xs.append(np.asarray(x))
        ys.append(np.asarray(y))
        vs.append(np.asarray(v))
    return (
        np.concatenate(xs)[:n_real],
        np.concatenate(ys)[:n_real],
        np.concatenate(vs)[:n_real],
    )


def batch_fixed_base_g2_staged(scalars: list[int]) -> tuple:
    """G2 twin of batch_fixed_base_g1_staged (Fq2 normalization via the
    conjugate/norm identity, g2_jax.normalize_batch)."""
    n_real = len(scalars)
    if n_real <= HOST_FALLBACK_N:
        return _stage_g2(batch_fixed_base_g2(scalars))
    from ..ops.bls12_381 import G2_INF

    table = _window_table(g2_from_affine((G2_GEN_X, G2_GEN_Y)), g2_add, G2_INF)
    aff, _ = g2_jax.points_to_device(table)
    aff = jax.tree_util.tree_map(lambda t: t.reshape(64, 16, -1), aff)
    all_limbs = FR.to_limbs([s % R for s in scalars])
    x0s, x1s, y0s, y1s, vs = [], [], [], [], []
    for limbs in _fixed_base_chunks(all_limbs, FIXED_BASE_CHUNK // 2):
        X, Y, Z = _fixed_base_g2_run(jnp.asarray(limbs), aff)
        (x, y), v = g2_jax.normalize_batch(X, Y, Z)
        x0s.append(np.asarray(x[0]))
        x1s.append(np.asarray(x[1]))
        y0s.append(np.asarray(y[0]))
        y1s.append(np.asarray(y[1]))
        vs.append(np.asarray(v))
    cat = lambda parts: np.concatenate(parts)[:n_real]
    return (
        ((cat(x0s), cat(x1s)), (cat(y0s), cat(y1s))),
        cat(vs),
    )


def batch_fixed_base_g2(scalars: list[int]) -> list:
    """[s_i * G2] for many scalars, device bit-sliced accumulation."""
    n_real = len(scalars)
    if n_real == 0:
        return []
    if n_real <= HOST_FALLBACK_N:
        g = g2_from_affine((G2_GEN_X, G2_GEN_Y))
        return [g2_mul(g, s % R) for s in scalars]
    from ..ops.bls12_381 import G2_INF

    table = _window_table(g2_from_affine((G2_GEN_X, G2_GEN_Y)), g2_add, G2_INF)
    aff, _ = g2_jax.points_to_device(table)
    aff = jax.tree_util.tree_map(lambda t: t.reshape(64, 16, -1), aff)
    all_limbs = FR.to_limbs([s % R for s in scalars])
    out = []
    for limbs in _fixed_base_chunks(all_limbs, FIXED_BASE_CHUNK // 2):
        res = _fixed_base_g2_run(jnp.asarray(limbs), aff)
        out.extend(g2_jax.points_from_device(res))
    return out[:n_real]


@jax.jit
def _fixed_base_g2_run(limbs, aff):
    n = limbs.shape[0]
    acc = g2_jax.infinity((n,))

    def body(k, acc):
        digit = (limbs[:, k // 4] >> (4 * (k % 4))) & 0xF
        q = jax.tree_util.tree_map(lambda t: t[k][digit], aff)
        return g2_jax.add_mixed(acc, q, digit != 0)

    return jax.lax.fori_loop(0, 64, body, acc)


def _g1_batch_to_host_affine(X, Y, Z) -> list:
    """Device Jacobian batch -> host Jacobian int points (affine Z=1).

    Z-inversions use Montgomery batch inversion (one fq_inv for the
    whole batch instead of one per point — the per-point pow() loop was
    minutes of host time per 4M-entry CRS query)."""
    xs = fq_ops.decode(X)
    ys = fq_ops.decode(Y)
    zs = fq_ops.decode(Z)
    # batch-invert the nonzero Zs
    prefix = [1] * (len(zs) + 1)
    for i, z in enumerate(zs):
        prefix[i + 1] = prefix[i] * (z if z else 1) % P_MOD
    inv_all = fq_inv(prefix[-1])
    invs = [0] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        invs[i] = prefix[i] * inv_all % P_MOD
        inv_all = inv_all * (zs[i] if zs[i] else 1) % P_MOD
    out = []
    for x, y, z, zi in zip(xs, ys, zs, invs):
        if z == 0:
            out.append(G1_INF)
        else:
            zi2 = zi * zi % P_MOD
            out.append((x * zi2 % P_MOD, y * zi2 * zi % P_MOD, 1))
    return out


# ---------------------------------------------------------------------------
# QAP evaluation helpers
# ---------------------------------------------------------------------------


def _qap_tau_evals(constraints, n_in, num_vars, tau, log_n):
    """u_i(tau), v_i(tau), w_i(tau) for every variable i.

    Constraint rows are the evaluation domain points; the input
    consistency rows (one per public input: x_i * 0 = 0) follow the
    real constraints, mirroring bellperson's assembly.
    """
    m = 1 << log_n
    plan = NttPlan(log_n)
    omega = plan.omega
    # Lagrange coefficients L_j(tau) = Z(tau) * omega^j / (m * (tau - omega^j))
    z_tau = (pow(tau, m, R) - 1) % R
    u = [0] * num_vars
    v = [0] * num_vars
    w = [0] * num_vars
    n_rows = len(constraints) + n_in
    assert n_rows <= m
    # batch-invert (tau - omega^j)
    omega_pows, cur = [], 1
    for _ in range(n_rows):
        omega_pows.append(cur)
        cur = cur * omega % R
    denoms = [(tau - wj) % R for wj in omega_pows]
    inv_denoms = _batch_inverse(denoms)
    m_inv = pow(m, R - 2, R)
    lag = [
        z_tau * wj % R * inv % R * m_inv % R
        for wj, inv in zip(omega_pows, inv_denoms)
    ]
    def _accumulate_dicts(rows, base):
        for j, (a, b, c) in enumerate(rows):
            lj = lag[base + j]
            for var, coeff in a.items():
                u[var] = (u[var] + coeff * lj) % R
            for var, coeff in b.items():
                v[var] = (v[var] + coeff * lj) % R
            for var, coeff in c.items():
                w[var] = (w[var] + coeff * lj) % R

    def _accumulate_block(block, base):
        if hasattr(block, "pool"):  # FieldBlock or tiled.TiledBlock
            return _accumulate_field_block(block, base)
        for indptr, cols, coeffs, target in (
            (block.a_indptr, block.a_cols, block.a_coeffs, u),
            (block.b_indptr, block.b_cols, block.b_coeffs, v),
            (block.c_indptr, block.c_cols, block.c_coeffs, w),
        ):
            lens = np.diff(indptr)
            rows = np.repeat(np.arange(block.n, dtype=np.int64), lens)
            for var, coeff, row in zip(
                cols.tolist(), coeffs.tolist(), rows.tolist()
            ):
                target[var] = (target[var] + coeff * lag[base + row]) % R

    def _accumulate_field_block(block, base):
        """u[var] += pool[idx] * lag[row] mod R, vectorized: products in
        limb space, then per-var segment sums over a col-sorted order —
        python-int work is one add per DISTINCT var, not per nnz."""
        from ..ops import fr_vec as fv

        lag_v = fv.to_v(lag[base : base + block.n])
        lag_m = fv.to_mont(lag_v)
        pool_v = block.pool_limbs()
        for indptr, cols, idx, target in (
            (block.a_indptr, block.a_cols, block.a_idx, u),
            (block.b_indptr, block.b_cols, block.b_idx, v),
            (block.c_indptr, block.c_cols, block.c_idx, w),
        ):
            if len(cols) == 0:
                continue
            lens = np.diff(indptr)
            rows = np.repeat(np.arange(block.n, dtype=np.int64), lens)
            terms = fv.mont_mul(pool_v[idx], lag_m[rows])
            order = np.argsort(cols, kind="stable")
            sorted_cols = cols[order]
            boundaries = np.nonzero(
                np.diff(sorted_cols, prepend=sorted_cols[0] - 1)
            )[0]
            seg_ptr = np.concatenate(
                [boundaries, [len(sorted_cols)]]
            ).astype(np.int64)
            sums = fv.sum_mod_csr(terms[order], seg_ptr)
            for var, s in zip(
                sorted_cols[boundaries].tolist(), fv.from_v(sums)
            ):
                target[var] = (target[var] + s) % R

    if hasattr(constraints, "segments"):
        for kind, seg, base in constraints.segments():
            if kind == "d":
                _accumulate_dicts(seg, base)
            else:
                _accumulate_block(seg, base)
    else:
        _accumulate_dicts(constraints, 0)
    # input consistency rows: A = x_i, B = 0, C = 0
    for i in range(n_in):
        u[i] = (u[i] + lag[len(constraints) + i]) % R
    return u, v, w, z_tau


def _batch_inverse(values: list[int]) -> list[int]:
    """Montgomery batch inversion over Fr."""
    n = len(values)
    prefix = [1] * (n + 1)
    for i, val in enumerate(values):
        prefix[i + 1] = prefix[i] * val % R
    inv_all = pow(prefix[n], R - 2, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % R
        inv_all = inv_all * values[i] % R
    return out


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------


def setup(cs: ConstraintSystem, seed: bytes = b"fil-tpu-setup") -> ProvingKey:
    """Generate a CRS for the circuit (deterministic from seed).

    Production Filecoin parameters come from the trusted-setup ceremony
    (phase2 CLI); this generates structurally identical parameters for
    caches and tests (reference: bin/paramcache generates params the
    same way via `generate_random_parameters`).
    """
    import random as _random

    rng = _random.Random(hashlib.sha256(seed).digest())
    tau = rng.randrange(1, R)
    alpha = rng.randrange(1, R)
    beta = rng.randrange(1, R)
    gamma = rng.randrange(1, R)
    delta = rng.randrange(1, R)

    import time as _time

    def _progress(msg):
        if os.environ.get("FIL_PROOFS_SETUP_PROGRESS"):
            print(f"[setup {_time.strftime('%H:%M:%S')}] {msg}", flush=True)

    n_in, n_aux, constraints, inputs, aux = cs.finalize()
    num_vars = n_in + n_aux
    n_rows = len(constraints) + n_in
    log_n = max(1, (n_rows - 1).bit_length())
    _progress(f"finalized: {len(constraints)} constraints, {num_vars} vars")
    u, v, w, _ = _qap_tau_evals(constraints, n_in, num_vars, tau, log_n)
    _progress("QAP tau evaluations done")

    gamma_inv = pow(gamma, R - 2, R)
    delta_inv = pow(delta, R - 2, R)

    ic_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * gamma_inv % R
        for i in range(n_in)
    ]
    l_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * delta_inv % R
        for i in range(n_in, num_vars)
    ]
    m = 1 << log_n
    z_tau = (pow(tau, m, R) - 1) % R
    h_scalars = []
    cur = z_tau * delta_inv % R
    for _ in range(m - 1):
        h_scalars.append(cur)
        cur = cur * tau % R

    # device fixed-base batches, staged straight into the query layout
    # (device normalization — the host per-point conversion was the CRS
    # wall at >4M constraints)
    a_query = batch_fixed_base_g1_staged(u)
    _progress("a_query done")
    b_g1_query = batch_fixed_base_g1_staged(v)
    _progress("b_g1_query done")
    ic_pts = batch_fixed_base_g1(ic_scalars)
    l_query = batch_fixed_base_g1_staged(l_scalars)
    _progress("ic+l queries done")
    h_query = batch_fixed_base_g1_staged(h_scalars)
    _progress("h_query done")
    b_g2_query = batch_fixed_base_g2_staged(v)
    _progress("b_g2_query done")
    g2_gen = g2_from_affine((G2_GEN_X, G2_GEN_Y))

    g1 = g1_from_affine(G1_GEN)
    vk = VerifyingKey(
        alpha_g1=g1_mul(g1, alpha),
        beta_g2=g2_mul(g2_gen, beta),
        gamma_g2=g2_mul(g2_gen, gamma),
        delta_g2=g2_mul(g2_gen, delta),
        ic=ic_pts,
    )
    return ProvingKey(
        vk=vk,
        beta_g1=g1_mul(g1, beta),
        delta_g1=g1_mul(g1, delta),
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        log_n=log_n,
    )


def _stage_g1(points):
    px, py, valid = g1_jax.points_to_device(points)
    return (np.asarray(px), np.asarray(py), np.asarray(valid))


def _stage_g2(points):
    aff, valid = g2_jax.points_to_device(points)
    ((x0, x1), (y0, y1)) = aff
    return (
        (
            (np.asarray(x0), np.asarray(x1)),
            (np.asarray(y0), np.asarray(y1)),
        ),
        np.asarray(valid),
    )


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


def _ints_to_limbs_fast(values: list[int]) -> np.ndarray:
    """Vectorized python-int -> [N, 16] uint32 limb conversion."""
    raw = b"".join((v % R).to_bytes(32, "little") for v in values)
    return (
        np.frombuffer(raw, dtype="<u2").astype(np.uint32).reshape(-1, 16)
    )


def _limbs_to_ints(arr) -> list[int]:
    raw = np.asarray(arr, dtype=np.uint32).astype("<u2").tobytes()
    return [
        int.from_bytes(raw[i : i + 32], "little") for i in range(0, len(raw), 32)
    ]


def _compute_h(cs_finalized, assignment, log_n):
    """h(x) = (a(x) b(x) - c(x)) / Z(x) coefficients via device NTTs."""
    n_in, _, constraints, _, _ = cs_finalized
    m = 1 << log_n
    a_evals = [0] * m
    b_evals = [0] * m
    c_evals = [0] * m

    def _eval_dicts(rows, base):
        for j, (a, b, c) in enumerate(rows):
            a_evals[base + j] = (
                sum(co * assignment[v] for v, co in a.items()) % R
            )
            b_evals[base + j] = (
                sum(co * assignment[v] for v, co in b.items()) % R
            )
            c_evals[base + j] = (
                sum(co * assignment[v] for v, co in c.items()) % R
            )

    def _eval_block(block, base):
        from .r1cs import FieldBlock

        if hasattr(block, "pool"):  # FieldBlock or tiled.TiledBlock
            from ..ops import fr_vec as fv

            cols = np.concatenate(
                [block.a_cols, block.b_cols, block.c_cols]
            )
            uniq = np.unique(cols) if len(cols) else np.zeros(0, np.int64)
            # compact the assignment: limb-ify only referenced vars
            comp = np.full(int(uniq.max()) + 1 if len(uniq) else 1, -1,
                           dtype=np.int64)
            comp[uniq] = np.arange(len(uniq))
            vals_v = fv.to_v([assignment[int(c)] for c in uniq.tolist()])
            view = FieldBlock(
                block.n,
                block.a_indptr, comp[block.a_cols], block.a_idx,
                block.b_indptr, comp[block.b_cols], block.b_idx,
                block.c_indptr, comp[block.c_cols], block.c_idx,
                block.pool,
            )
            av, bv, cv = view.eval_rows_v(vals_v)
            n = block.n
            a_evals[base : base + n] = fv.from_v(av)
            b_evals[base : base + n] = fv.from_v(bv)
            c_evals[base : base + n] = fv.from_v(cv)
            return
        # vectorized rows reference int64-safe values (gadget contract)
        cols = np.concatenate([block.a_cols, block.b_cols, block.c_cols])
        uniq = np.unique(cols) if len(cols) else np.zeros(0, np.int64)
        lut = np.zeros(int(uniq.max()) + 1 if len(uniq) else 1, np.int64)
        for cvar in uniq.tolist():
            lut[cvar] = assignment[cvar]
        av, bv, cv = block.eval_rows(lut)
        n = block.n
        a_evals[base : base + n] = [x + R if x < 0 else x for x in av.tolist()]
        b_evals[base : base + n] = [x + R if x < 0 else x for x in bv.tolist()]
        c_evals[base : base + n] = [x + R if x < 0 else x for x in cv.tolist()]

    if hasattr(constraints, "segments"):
        for kind, seg, seg_base in constraints.segments():
            if kind == "d":
                _eval_dicts(seg, seg_base)
            else:
                _eval_block(seg, seg_base)
    else:
        _eval_dicts(constraints, 0)
    base = len(constraints)
    for i in range(n_in):
        a_evals[base + i] = assignment[i]

    from ..ops.fr_limbs import fr_ops as frops

    to_mont = lambda vals: frops.to_mont(jnp.asarray(_ints_to_limbs_fast(vals)))
    a_m = to_mont(a_evals)
    b_m = to_mont(b_evals)
    c_m = to_mont(c_evals)

    # Z on the coset is constant: g^m - 1
    from ..ops.ntt import FR_MULT_GEN

    z_inv = pow((pow(FR_MULT_GEN, m, R) - 1) % R, R - 2, R)
    use_pallas = os.environ.get("FIL_PROOFS_NTT_BACKEND", "auto")
    if use_pallas == "auto":
        import jax as _jax

        use_pallas = (
            "pallas" if _jax.default_backend() != "cpu" and log_n >= 14
            else "xla"
        )
    if use_pallas == "pallas":
        # four-step pallas path (ops/pallas/ntt.py): bit-identical to
        # the XLA chain below (val_pallas_ntt h-parity leg), ~12x less
        # wall on the 7 transforms of a 2^20 domain
        from ..ops.fr_limbs import FR as _FRF
        from ..ops.pallas.ntt import h_pipeline, release as _prelease

        z_limbs = jnp.asarray(
            _FRF.to_limbs([(z_inv * _FRF.mont_r) % R])[0]
        )
        h_coeff = h_pipeline(a_m, b_m, c_m, log_n, z_limbs)
        if log_n >= 20:
            _prelease(log_n)
    else:
        a_coeff = intt(a_m, log_n)
        b_coeff = intt(b_m, log_n)
        c_coeff = intt(c_m, log_n)
        a_cos = coset_ntt(a_coeff, log_n)
        b_cos = coset_ntt(b_coeff, log_n)
        c_cos = coset_ntt(c_coeff, log_n)
        ab = frops.mont_mul(a_cos, b_cos)
        num = frops.sub(ab, c_cos)
        z_inv_m = frops.encode(z_inv)
        h_cos = frops.mont_mul(num, z_inv_m)
        h_coeff = coset_intt(h_cos, log_n)
    h_plain = np.asarray(frops.from_mont(h_coeff))
    if log_n >= 20:
        # free the ~1 GB of device twiddle tables before the MSMs — the
        # combined residency crashed the v5e worker mid-prove
        from ..ops.ntt import release_plan

        release_plan(log_n)
    return _limbs_to_ints(h_plain)[: m - 1]


def _pad_pow2(limbs: np.ndarray, points_tree):
    """Pad scalars with zeros and points with row-0 copies to the next
    power of two (>= 16): zero scalars never enter buckets, and padded
    sizes share one compiled MSM program across query lengths."""
    n = limbs.shape[0]
    target = max(16, 1 << (n - 1).bit_length())
    if target == n:
        return limbs, points_tree
    pad = target - n
    limbs = np.concatenate([limbs, np.zeros((pad, 16), dtype=np.uint32)])
    points_tree = jax.tree_util.tree_map(
        lambda t: np.concatenate(
            [np.asarray(t), np.broadcast_to(np.asarray(t)[:1], (pad,) + t.shape[1:])]
        ),
        points_tree,
    )
    return limbs, points_tree


# Per-launch MSM segment: 2^22-point single-launch programs crashed the
# v5e worker in the aggregation stage; 2^20 segments reuse one proven
# compiled program and the partial results add on the host (MSM is
# linear over point-disjoint segments).
MSM_CHUNK = 1 << 20


def _msm_g1_native(query, scalars: list[int]):
    """Native multicore CPU Pippenger (ops/native_msm) over a staged G1
    query. Crash-isolated prove backend (FIL_PROOFS_MSM_BACKEND=native,
    or automatic when a device MSM launch dies mid-prove — an axon
    worker fault poisons the whole client) and an independent
    cross-check of the device kernels. Montgomery decode + byte packing
    happen fully on the host so no device call is needed."""
    from ..ops import native_msm

    if native_msm.get_lib() is None:
        return None
    px, py, valid = query
    valid = np.asarray(valid).astype(bool)
    xs = g1_jax.FQ.from_limbs(np.asarray(px))
    ys = g1_jax.FQ.from_limbs(np.asarray(py))
    rinv = pow(1 << (16 * 24), -1, P_MOD)
    zero48 = bytes(48)
    xb = b"".join(
        ((v * rinv) % P_MOD).to_bytes(48, "little") if ok else zero48
        for v, ok in zip(xs, valid)
    )
    yb = b"".join(
        ((v * rinv) % P_MOD).to_bytes(48, "little") if ok else zero48
        for v, ok in zip(ys, valid)
    )
    n = len(xs)
    enc = np.empty((n, 96), dtype=np.uint8)
    enc[:, :48] = np.frombuffer(xb, np.uint8).reshape(n, 48)
    enc[:, 48:] = np.frombuffer(yb, np.uint8).reshape(n, 48)
    return native_msm.msm_g1_cpu(enc, scalars)


def _msm_backend() -> str:
    """MSM backend: FIL_PROOFS_MSM_BACKEND overrides; default is the
    fused Pallas kernels on an accelerator (measured 282k pts/s at 2^24
    on v5e vs ~52k for the XLA path) and XLA on CPU."""
    backend = os.environ.get("FIL_PROOFS_MSM_BACKEND")
    if backend:
        return backend
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "xla"


def _pallas_buckets(n: int) -> int:
    """Window size for the Pallas MSM: c=16 amortizes by ~2^20 lanes
    (measured v5e crossover; the [W,65536] aggregation scans dominate
    below that)."""
    return (1 << 16) if n >= (1 << 20) else 256


def _msm_g1_staged(query, scalars: list[int], n_buckets):
    px, py, valid = query
    assert px.shape[0] == len(scalars)
    s = [sc if ok else 0 for sc, ok in zip(scalars, np.asarray(valid))]
    if len(s) <= HOST_FALLBACK_N:  # device compile not worth it (see above)
        xs = fq_ops.decode(np.asarray(px))
        ys = fq_ops.decode(np.asarray(py))
        acc = G1_INF
        for x, y, k in zip(xs, ys, s):
            if k:
                acc = g1_add(acc, g1_mul((x, y, 1), k))
        return acc
    backend = _msm_backend()
    if backend == "native":
        out = _msm_g1_native(query, s)
        if out is not None:
            return out
    if backend == "pallas":
        from ..ops.pallas.msm import msm_pallas, sum_points_g1

        # density split (bellperson density-map analog): Groth16
        # witness scalars are mostly bits. 0s contribute nothing; 1s
        # are summed directly by contiguous tree reduction; only the
        # arbitrary-value remainder goes through Pippenger — bit-heavy
        # scalars pile ~N/2 points into bucket 1 and degenerate the
        # rank passes into a serial chain otherwise.
        ones_idx, rest_idx = [], []
        for i, v in enumerate(s):
            if v == 1:
                ones_idx.append(i)
            elif v:
                rest_idx.append(i)
        px_np, py_np = np.asarray(px), np.asarray(py)
        acc = G1_INF
        if len(ones_idx) > 4096:
            acc = g1_add(
                acc, sum_points_g1(px_np[ones_idx], py_np[ones_idx])
            )
        else:
            rest_idx.extend(ones_idx)
            rest_idx.sort()
        if rest_idx:
            rest_s = [s[i] for i in rest_idx]
            rpx, rpy = px_np[rest_idx], py_np[rest_idx]
            for lo in range(0, len(rest_s), MSM_CHUNK):
                seg = rest_s[lo : lo + MSM_CHUNK]
                limbs, (sx, sy) = _pad_pow2(
                    _ints_to_limbs_fast(seg),
                    (rpx[lo : lo + MSM_CHUNK], rpy[lo : lo + MSM_CHUNK]),
                )
                out = msm_pallas(
                    (np.asarray(sx), np.asarray(sy)),
                    np.asarray(limbs),
                    n_buckets=_pallas_buckets(limbs.shape[0]),
                )
                acc = g1_add(acc, out)
        return acc
    acc = G1_INF
    for lo in range(0, len(s), MSM_CHUNK):
        seg = s[lo : lo + MSM_CHUNK]
        limbs, (sx, sy) = _pad_pow2(
            _ints_to_limbs_fast(seg),
            (px[lo : lo + MSM_CHUNK], py[lo : lo + MSM_CHUNK]),
        )
        try:
            out = msm_mod.msm_device(
                (jnp.asarray(sx), jnp.asarray(sy)),
                jnp.asarray(limbs),
                n_buckets=n_buckets,
                curve_name="g1",
            )
        except Exception:
            # device fault mid-MSM: redo the whole MSM on the native
            # CPU backend (a worker fault poisons the client)
            host = _msm_g1_native(query, s)
            if host is None:
                raise
            return host
        X = fq_ops.decode(out[0][None])[0]
        Y = fq_ops.decode(out[1][None])[0]
        Z = fq_ops.decode(out[2][None])[0]
        acc = g1_add(acc, (X, Y, Z))
    return acc


def _msm_g2_native(query, scalars: list[int]):
    """Native multicore CPU Pippenger over a staged G2 query (see
    _msm_g1_native). Returns a host Jacobian G2 tuple or None if the
    native library is unavailable."""
    from ..ops import native_msm

    if native_msm.get_lib() is None:
        return None
    aff, valid = query
    valid = np.asarray(valid).astype(bool)
    ((x0, x1), (y0, y1)) = aff
    rinv = pow(1 << (16 * 24), -1, P_MOD)
    coords = [g1_jax.FQ.from_limbs(np.asarray(t)) for t in (x0, x1, y0, y1)]
    zero48 = bytes(48)
    n = len(coords[0])
    enc = np.empty((n, 192), dtype=np.uint8)
    for j, vals in enumerate(coords):
        blob = b"".join(
            ((v * rinv) % P_MOD).to_bytes(48, "little") if ok else zero48
            for v, ok in zip(vals, valid)
        )
        enc[:, 48 * j : 48 * (j + 1)] = np.frombuffer(blob, np.uint8).reshape(
            n, 48
        )
    return native_msm.msm_g2_cpu(enc, scalars)


def _msm_g2_staged(query, scalars: list[int], n_buckets):
    aff, valid = query
    s = [sc if ok else 0 for sc, ok in zip(scalars, np.asarray(valid))]
    if len(s) <= HOST_FALLBACK_N:  # Fq2 device program compile is hour-scale
        ((x0, x1), (y0, y1)) = aff
        xs0 = fq_ops.decode(np.asarray(x0))
        xs1 = fq_ops.decode(np.asarray(x1))
        ys0 = fq_ops.decode(np.asarray(y0))
        ys1 = fq_ops.decode(np.asarray(y1))
        from ..ops.bls12_381 import G2_INF, g2_add

        acc = G2_INF
        for a0, a1, b0, b1, k in zip(xs0, xs1, ys0, ys1, s):
            if k:
                acc = g2_add(acc, g2_mul(((a0, a1), (b0, b1), (1, 0)), k))
        return acc
    from ..ops.bls12_381 import G2_INF

    backend = _msm_backend()
    if backend == "native":
        out = _msm_g2_native(query, s)
        if out is not None:
            return out
    if backend == "pallas":
        from ..ops.bls12_381 import g2_add as _g2_add
        from ..ops.pallas.msm import msm_pallas_g2, sum_points_g2

        aff_np = jax.tree_util.tree_map(np.asarray, aff)
        # density split — see _msm_g1_staged
        ones_idx, rest_idx = [], []
        for i, v in enumerate(s):
            if v == 1:
                ones_idx.append(i)
            elif v:
                rest_idx.append(i)
        acc = G2_INF
        if len(ones_idx) > 2048:
            acc = _g2_add(
                acc,
                sum_points_g2(
                    jax.tree_util.tree_map(lambda t: t[ones_idx], aff_np)
                ),
            )
        else:
            rest_idx.extend(ones_idx)
            rest_idx.sort()
        if rest_idx:
            rest_s = [s[i] for i in rest_idx]
            rest_aff = jax.tree_util.tree_map(
                lambda t: t[rest_idx], aff_np
            )
            for lo in range(0, len(rest_s), MSM_CHUNK):
                seg = rest_s[lo : lo + MSM_CHUNK]
                limbs, seg_aff = _pad_pow2(
                    _ints_to_limbs_fast(seg),
                    jax.tree_util.tree_map(
                        lambda t: t[lo : lo + MSM_CHUNK], rest_aff
                    ),
                )
                out = msm_pallas_g2(
                    seg_aff,
                    np.asarray(limbs),
                    n_buckets=_pallas_buckets(limbs.shape[0]),
                )
                acc = _g2_add(acc, out)
        return acc
    acc = G2_INF
    for lo in range(0, len(s), MSM_CHUNK):
        seg = s[lo : lo + MSM_CHUNK]
        limbs, seg_aff = _pad_pow2(
            _ints_to_limbs_fast(seg),
            jax.tree_util.tree_map(lambda t: t[lo : lo + MSM_CHUNK], aff),
        )
        aff_dev = jax.tree_util.tree_map(jnp.asarray, seg_aff)
        try:
            out = msm_mod.msm_device(
                aff_dev,
                jnp.asarray(limbs),
                n_buckets=n_buckets,
                curve_name="g2",
            )
        except Exception:
            host = _msm_g2_native(query, s)
            if host is None:
                raise
            return host
        flat = jax.tree_util.tree_map(lambda t: t[None], out)
        acc = g2_add(acc, g2_jax.points_from_device(flat)[0])
    return acc


def prove(
    pk: ProvingKey,
    cs: ConstraintSystem,
    randomness: bytes = b"fil-tpu-prove",
    n_buckets: int | None = 256,
) -> Proof:
    # n_buckets=256 (c=8): the c=16 bucket-aggregation program ([16,
    # 65536] roll scans) reproducibly crashes the v5e TPU worker; c=8
    # is the measured-safe configuration (52.6k pts/s at 2^20).
    """Groth16 prove. Deterministic for fixed `randomness` (the r/s
    blinding factors derive from it), so proofs are byte-reproducible
    under fixed inputs — the BASELINE bit-exactness requirement."""
    import time as _time

    def _mark(msg):
        if os.environ.get("FIL_PROOFS_SETUP_PROGRESS"):
            print(f"[prove {_time.strftime('%H:%M:%S')}] {msg}", flush=True)

    fin = cs.finalize()
    n_in, n_aux, constraints, inputs, aux = fin
    assignment_ordered = inputs + aux
    _mark(f"finalized ({len(constraints)} constraints)")
    h = _compute_h(fin, assignment_ordered, pk.log_n)
    _mark("h coefficients done")
    return prove_from_assignment(
        pk, inputs, aux, h, randomness=randomness, n_buckets=n_buckets
    )


def prove_from_assignment(
    pk: ProvingKey,
    inputs: list[int],
    aux: list[int],
    h: list[int],
    randomness: bytes = b"fil-tpu-prove",
    n_buckets: int | None = 256,
) -> Proof:
    """MSM + assembly half of `prove`, taking the finalized assignment
    and precomputed h(x) coefficients. Lets big proofs run the QAP/NTT
    stage and the MSM stage in separate processes (fresh TPU client
    each — the v5e worker has crashed when both phases' device state
    coexisted)."""
    import random as _random
    import time as _time

    def _mark(msg):
        if os.environ.get("FIL_PROOFS_SETUP_PROGRESS"):
            print(f"[prove {_time.strftime('%H:%M:%S')}] {msg}", flush=True)

    rng = _random.Random(hashlib.sha256(randomness).digest())
    r = rng.randrange(R)
    s = rng.randrange(R)
    assignment_ordered = inputs + aux

    ev_a = _msm_g1_staged(pk.a_query, assignment_ordered, n_buckets)
    _mark("A commitment done")
    ev_b_g1 = _msm_g1_staged(pk.b_g1_query, assignment_ordered, n_buckets)
    _mark("B1 commitment done")
    ev_b_g2 = _msm_g2_staged(pk.b_g2_query, assignment_ordered, n_buckets)
    _mark("B2 commitment done")
    ev_h = _msm_g1_staged(pk.h_query, h, n_buckets)
    _mark("H commitment done")
    ev_l = _msm_g1_staged(pk.l_query, aux, n_buckets)
    _mark("L commitment done")

    g_a = g1_add(
        g1_add(pk.vk.alpha_g1, ev_a), g1_mul(pk.delta_g1, r)
    )
    g_b = g2_add(
        g2_add(pk.vk.beta_g2, ev_b_g2), g2_mul(pk.vk.delta_g2, s)
    )
    g_b_g1 = g1_add(
        g1_add(pk.beta_g1, ev_b_g1), g1_mul(pk.delta_g1, s)
    )
    # C = l + h + s*A + r*B1 - rs*delta
    g_c = g1_add(ev_l, ev_h)
    g_c = g1_add(g_c, g1_mul(g_a, s))
    g_c = g1_add(g_c, g1_mul(g_b_g1, r))
    g_c = g1_add(g_c, g1_neg(g1_mul(pk.delta_g1, r * s % R)))
    return Proof(g_a, g_b, g_c)


def prove_many(
    pk: ProvingKey,
    cs_list: list[ConstraintSystem],
    randomness: bytes = b"fil-tpu-prove",
    devices: list | None = None,
) -> list[Proof]:
    """Partition-parallel Groth16 (SURVEY §2.9 P4): the k independent
    partition SNARKs of a seal/window-PoSt (reference
    compound_proof.hpp:85-137, POREP_PARTITIONS=10 constants.hpp:70-73)
    prove concurrently, each partition's device work (h-NTTs + 5 MSMs)
    dispatched to mesh device k mod D. On one chip the async dispatch
    pipelines partitions; on a multi-chip mesh they run side by side.
    Proof bytes are identical to the serial loop (randomness derivation
    per partition is unchanged)."""
    import jax as _jax

    devs = devices or _jax.devices()

    def run(k: int) -> Proof:
        with _jax.default_device(devs[k % len(devs)]):
            return prove(pk, cs_list[k], randomness=randomness + bytes([k]))

    if len(cs_list) <= 1:
        return [run(k) for k in range(len(cs_list))]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(cs_list), len(devs), 8)) as ex:
        return list(ex.map(run, range(len(cs_list))))


# ---------------------------------------------------------------------------
# Verifier (host pairing)
# ---------------------------------------------------------------------------


def verify(vk: VerifyingKey, proof: Proof, public_inputs: list[int]) -> bool:
    """public_inputs excludes the leading constant-1 (ic[0])."""
    if len(public_inputs) + 1 != len(vk.ic):
        return False
    acc = vk.ic[0]
    for x, pt in zip(public_inputs, vk.ic[1:]):
        acc = g1_add(acc, g1_mul(pt, x % R))
    # e(A, B) * e(-acc, gamma) * e(-C, delta) * e(-alpha, beta) == 1
    result = multi_pairing(
        [
            (proof.a, proof.b),
            (g1_neg(acc), vk.gamma_g2),
            (g1_neg(proof.c), vk.delta_g2),
            (g1_neg(vk.alpha_g1), vk.beta_g2),
        ]
    )
    return result == FQ12_ONE
