"""MXU poseidon kernel: component-level exactness on CPU.

The MXU variant (ops/pallas/poseidon.py permute_soa_mxu) moves every
constant linear map of the permutation — dense MDS mix, sparse-round
out0 row, w_hat column — onto the systolic array as matmuls over 8-bit
limb planes (bf16 operands, f32 accumulation, K-chunked at 192 rows so
every partial sum stays an exact integer < 2^24). The full pallas_call
is validated on the live chip (scripts/val_pallas_poseidon.py); these
tests pin the weight construction + recombine + shared-REDC algebra on
CPU without the (hour-scale interpret-mode) kernel wrapper.

Reference semantics: stacked/vanilla/hash.hpp:33-52 (Poseidon column /
node hashing), proof.hpp:385-646 (GPU tree builder the pallas kernels
replace).
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from crypto3_fil_proofs_tpu.ops.pallas import poseidon as pp
from crypto3_fil_proofs_tpu.ops.poseidon import (
    optimized_partial_schedule,
    poseidon_constants,
)

P = pp.P_INT
LANES = 128


def _rand_elems(rng, t):
    vals = [
        [int(rng.integers(0, 1 << 62)) % P for _ in range(LANES)]
        for _ in range(t)
    ]
    elems = [
        jnp.asarray(pp.FR.to_limbs(v).T.reshape(pp.N_LIMBS, 1, LANES))
        for v in vals
    ]
    return vals, elems


def _decode(acc_limbs):
    return pp.FR.from_limbs(
        np.asarray(acc_limbs).reshape(pp.N_LIMBS, LANES).T
    )


@pytest.mark.parametrize("arity", [2, 8, 11])
def test_dense_mix_exact(arity, rng_seed):
    rng = np.random.default_rng(rng_seed)
    c = poseidon_constants(arity)
    t = c.t
    mont_r = pp.FR.mont_r
    r_inv = pow(mont_r, -1, P)
    vals, elems = _rand_elems(rng, t)
    wf = pp._staged_mxu(arity)[0]
    B = pp._to_bytes_bf16(elems)
    o8 = pp._mxu_matmul(wf, B)
    mds_mont = [[(m * mont_r) % P for m in row] for row in c.mds]
    for i in range(t):
        got = _decode(pp._redc_wide(pp._recombine16(o8, i)))
        for lane in range(0, LANES, 17):
            want = (
                sum(mds_mont[i][j] * vals[j][lane] for j in range(t))
                * r_inv
                % P
            )
            assert got[lane] == want, (arity, i, lane)


@pytest.mark.parametrize("arity", [8, 11])
def test_sparse_round_exact(arity, rng_seed):
    rng = np.random.default_rng(rng_seed + 1)
    c = poseidon_constants(arity)
    t = c.t
    mont_r = pp.FR.mont_r
    r_inv = pow(mont_r, -1, P)
    _, m00s, vs, w_hats, _ = optimized_partial_schedule(arity)
    vals, elems = _rand_elems(rng, t)
    _, _, w1, w2 = pp._staged_mxu(arity)
    B = pp._to_bytes_bf16(elems)
    for k in (0, c.r_p // 2, c.r_p - 1):
        o1 = pp._mxu_matmul(w1[k], B)
        got0 = _decode(pp._redc_wide(pp._recombine16(o1, 0)))
        m00m = (m00s[k] * mont_r) % P
        vsm = [(v * mont_r) % P for v in vs[k]]
        b2 = jnp.concatenate(
            [B[:32], jnp.zeros((96,) + B.shape[1:], B.dtype)], axis=0
        )
        o2 = pp._mxu_matmul(w2[k], b2)
        for lane in range(0, LANES, 31):
            want0 = (
                (
                    m00m * vals[0][lane]
                    + sum(vsm[j] * vals[j + 1][lane] for j in range(t - 1))
                )
                * r_inv
                % P
            )
            assert got0[lane] == want0, (arity, k, lane)
        for i in (0, t - 2):
            wi = pp._redc_wide(pp._recombine16(o2, i))
            got = _decode(pp._add_mod(wi, elems[i + 1]))
            whm = (w_hats[k][i] * mont_r) % P
            for lane in range(0, LANES, 31):
                want = (
                    whm * vals[0][lane] * r_inv + vals[i + 1][lane]
                ) % P
                assert got[lane] == want, (arity, k, i, lane)


def test_byte_plane_bound():
    """Worst-case f32 partial sums stay exact: K_CHUNK * 255 * 255 <
    2^24 (mantissa-exact integer range)."""
    assert pp._K_CHUNK * 255 * 255 < 1 << 24
