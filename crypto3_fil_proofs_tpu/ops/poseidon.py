"""Poseidon hash over BLS12-381 Fr — host-reference implementation.

Replaces the reference's consumed `crypto3::hashes::poseidon<Field, Arity>`
(reference: libs/storage/.../porep/stacked/vanilla/hash.hpp:33-52 hashes
columns with arity 2/11 Poseidon; .../core/hasher/types.hpp:34-42 defines
PoseidonBinaryArity=2, QuadArity=4, OctArity=8, MDArity=36).

Parameterization follows the Filecoin/neptune conventions:
- width t = arity + 1, S-box x^5, security level 128 bits, 255-bit field
- round numbers R_F / R_P from the Poseidon-paper security inequalities
  with neptune's 7.5% / +2 security margin
- round constants from the Grain LFSR of the Poseidon reference script
  (80-bit state, parameters packed MSB-first, 160 bootstrap bits, pair
  filter, big-endian 255-bit rejection sampling)
- MDS = Cauchy matrix M[i][j] = 1/(x_i + y_j), x_i = i, y_j = t + j
- Merkle-tree domain tag = 2^arity - 1 in the first state element; the
  digest is state[1] after one permutation.

The batched TPU path lives in ops/poseidon_jax.py and is validated
bit-exactly against this module.
"""
from __future__ import annotations

import math
from functools import lru_cache

from .bls12_381 import R

ALPHA = 5
SECURITY_BITS = 128
FIELD_BITS = 255

# Arities used by the protocols (reference: core/hasher/types.hpp:34-42)
POSEIDON_BINARY_ARITY = 2
POSEIDON_QUAD_ARITY = 4
POSEIDON_OCT_ARITY = 8
POSEIDON_MD_ARITY = 36


# ---------------------------------------------------------------------------
# Round numbers (Poseidon paper security inequalities, neptune margins)
# ---------------------------------------------------------------------------


def _round_numbers_are_secure(t: int, rf: int, rp: int) -> bool:
    n, m = float(FIELD_BITS), float(SECURITY_BITS)
    rf_stat = 6.0 if m <= (n - 3.0) * (t + 1.0) else 10.0
    rf_interp = 0.43 * m + math.log2(t) - rp
    rf_grob_1 = 0.21 * n - rp
    rf_grob_2 = (0.14 * n - 1.0 - rp) / (t - 1.0)
    rf_max = max(math.ceil(v) for v in (rf_stat, rf_interp, rf_grob_1, rf_grob_2))
    return rf >= rf_max


def round_numbers(arity: int) -> tuple[int, int]:
    """(R_F, R_P) for a given arity, with security margin applied."""
    t = arity + 1
    rf_out, rp_out, n_sboxes_min = 0, 0, None
    for rf_test in range(2, 1001, 2):
        for rp_test in range(4, 200):
            if _round_numbers_are_secure(t, rf_test, rp_test):
                rf_m = rf_test + 2
                rp_m = math.ceil(1.075 * rp_test)
                n_sboxes = t * rf_m + rp_m
                if n_sboxes_min is None or n_sboxes < n_sboxes_min or (
                    n_sboxes == n_sboxes_min and rf_m < rf_out
                ):
                    rf_out, rp_out, n_sboxes_min = rf_m, rp_m, n_sboxes
    return rf_out, rp_out


# ---------------------------------------------------------------------------
# Grain LFSR round-constant generation (Poseidon reference script semantics)
# ---------------------------------------------------------------------------


class _GrainLFSR:
    def __init__(self, field: int, sbox: int, n: int, t: int, r_f: int, r_p: int):
        bits: list[int] = []

        def append(value: int, width: int):
            for i in range(width - 1, -1, -1):
                bits.append((value >> i) & 1)

        append(field, 2)
        append(sbox, 4)
        append(n, 12)
        append(t, 12)
        append(r_f, 10)
        append(r_p, 10)
        append((1 << 30) - 1, 30)
        assert len(bits) == 80
        self.state = bits
        # bootstrap: discard 160 raw bits
        for _ in range(160):
            self._update()

    def _update(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(new)
        return new

    def _filtered_bit(self) -> int:
        # pair filter: emit second bit of a pair only when the first is 1
        while True:
            b1 = self._update()
            b2 = self._update()
            if b1 == 1:
                return b2

    def get_bits(self, count: int) -> int:
        """`count` filtered bits as a big-endian integer."""
        v = 0
        for _ in range(count):
            v = (v << 1) | self._filtered_bit()
        return v


def generate_round_constants(t: int, r_f: int, r_p: int) -> list[int]:
    grain = _GrainLFSR(field=1, sbox=0, n=FIELD_BITS, t=t, r_f=r_f, r_p=r_p)
    out = []
    for _ in range((r_f + r_p) * t):
        v = grain.get_bits(FIELD_BITS)
        while v >= R:
            v = grain.get_bits(FIELD_BITS)
        out.append(v)
    return out


def generate_mds(t: int) -> list[list[int]]:
    return [[pow(i + t + j, R - 2, R) for j in range(t)] for i in range(t)]


# ---------------------------------------------------------------------------
# Constants container + permutation
# ---------------------------------------------------------------------------


class PoseidonConstants:
    def __init__(self, arity: int, precomputed=None):
        self.arity = arity
        self.t = arity + 1
        if precomputed is not None:
            self.r_f, self.r_p, self.round_constants, self.mds = precomputed
        else:
            self.r_f, self.r_p = round_numbers(arity)
            self.round_constants = generate_round_constants(
                self.t, self.r_f, self.r_p
            )
            self.mds = generate_mds(self.t)
        # Merkle-tree domain tag (neptune HashType::MerkleTree)
        self.domain_tag = (1 << arity) - 1


def _constants_path():
    import os

    return os.path.join(os.path.dirname(__file__), "poseidon_constants.npz")


@lru_cache(maxsize=None)
def poseidon_constants(arity: int) -> PoseidonConstants:
    """Constants for an arity, loaded from the precomputed package file.

    The Grain LFSR generation is deterministic but slow in Python, so
    the protocol arities ship precomputed (see save_precomputed_constants);
    unknown arities fall back to live generation.
    """
    import os

    import numpy as np

    path = _constants_path()
    if os.path.exists(path):
        with np.load(path) as data:
            key = f"a{arity}"
            if f"{key}_rc" in data:
                r_f, r_p = (int(v) for v in data[f"{key}_rounds"])
                rc = [
                    int.from_bytes(row.tobytes(), "little")
                    for row in data[f"{key}_rc"]
                ]
                t = arity + 1
                mds_flat = [
                    int.from_bytes(row.tobytes(), "little")
                    for row in data[f"{key}_mds"]
                ]
                mds = [mds_flat[i * t : (i + 1) * t] for i in range(t)]
                return PoseidonConstants(arity, (r_f, r_p, rc, mds))
    return PoseidonConstants(arity)


def save_precomputed_constants(arities=(2, 4, 8, 11, 36)) -> None:
    """Generate + persist constants for the protocol arities
    (reference: core/hasher/types.hpp:34-42)."""
    import numpy as np

    payload = {}
    for arity in arities:
        c = PoseidonConstants(arity)
        payload[f"a{arity}_rounds"] = np.array([c.r_f, c.r_p], dtype=np.int64)
        payload[f"a{arity}_rc"] = np.stack(
            [
                np.frombuffer(v.to_bytes(32, "little"), dtype=np.uint8)
                for v in c.round_constants
            ]
        )
        payload[f"a{arity}_mds"] = np.stack(
            [
                np.frombuffer(v.to_bytes(32, "little"), dtype=np.uint8)
                for row in c.mds
                for v in row
            ]
        )
    np.savez_compressed(_constants_path(), **payload)


def permutation(state: list[int], consts: PoseidonConstants) -> list[int]:
    t, mds, rc = consts.t, consts.mds, consts.round_constants
    half_f = consts.r_f // 2
    s = [x % R for x in state]
    c = 0

    def mix(vec):
        return [sum(mds[i][j] * vec[j] for j in range(t)) % R for i in range(t)]

    for _ in range(half_f):
        s = [(x + rc[c + i]) % R for i, x in enumerate(s)]
        c += t
        s = [pow(x, ALPHA, R) for x in s]
        s = mix(s)
    for _ in range(consts.r_p):
        s = [(x + rc[c + i]) % R for i, x in enumerate(s)]
        c += t
        s[0] = pow(s[0], ALPHA, R)
        s = mix(s)
    for _ in range(half_f):
        s = [(x + rc[c + i]) % R for i, x in enumerate(s)]
        c += t
        s = [pow(x, ALPHA, R) for x in s]
        s = mix(s)
    return s


def _mat_inv_mod(m: list[list[int]]) -> list[list[int]]:
    """Inverse of a matrix mod R by Gauss-Jordan (t <= 12, exact ints)."""
    n = len(m)
    a = [row[:] + [1 if i == j else 0 for j in range(n)] for i, row in enumerate(m)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % R != 0)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], R - 2, R)
        a[col] = [(x * inv) % R for x in a[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(x - f * y) % R for x, y in zip(a[r], a[col])]
    return [row[n:] for row in a]


def _mat_mul(a, b):
    n, k, m = len(a), len(b), len(b[0])
    return [
        [sum(a[i][x] * b[x][j] for x in range(k)) % R for j in range(m)]
        for i in range(n)
    ]


def _mat_vec(a, v):
    return [sum(a[i][j] * v[j] for j in range(len(v))) % R for i in range(len(a))]


@lru_cache(maxsize=None)
def optimized_partial_schedule(arity: int):
    """Sparse-MDS factorization of the partial-round chain (the standard
    Poseidon appendix-B optimization, as used by neptune for the GPU
    tree builders the reference consumes — stacked/vanilla/proof.hpp
    column/tree hashing). The P partial rounds x -> M.S(x + c_k) are
    rewritten as P sparse rounds x -> E_k.S(x + c'_k) followed by ONE
    dense mix D: each E_k has 2t-1 non-trivial entries
    ([[m00, v], [w_hat, I]]), so the per-round mix drops from t^2 to
    2t-1 field muls. Returns (c_prime[P][t], m00[P], v[P][t-1],
    w_hat[P][t-1], d_last[t][t]) as python ints mod R.

    Derivation: M = M'.M'' with M' = [[1,0],[0,Mhat]] and
    M'' = [[M00, v],[Mhat^-1 w, I]]; S commutes with M'-shaped maps
    after transforming the constants by Mhat^-1, so the dense residue
    M' is pushed left through the whole chain, re-decomposing
    N_k = M.D_{k-1} at each step. Verified bit-exact against the plain
    permutation in tests/test_poseidon.py."""
    consts = poseidon_constants(arity)
    t, mds, rc = consts.t, consts.mds, consts.round_constants
    half_f, P = consts.r_f // 2, consts.r_p
    c_prime, m00s, vs, w_hats = [], [], [], []
    d = [[1 if i == j else 0 for j in range(t)] for i in range(t)]
    for k in range(P):
        c = rc[(half_f + k) * t : (half_f + k + 1) * t]
        dhat_inv = _mat_inv_mod([row[1:] for row in d[1:]])
        c_prime.append([c[0]] + _mat_vec(dhat_inv, c[1:]))
        n_mat = _mat_mul(mds, d)
        mhat = [row[1:] for row in n_mat[1:]]
        m00s.append(n_mat[0][0])
        vs.append(n_mat[0][1:])
        w_hats.append(_mat_vec(_mat_inv_mod(mhat), [row[0] for row in n_mat[1:]]))
        d = [[1] + [0] * (t - 1)] + [[0] + row for row in mhat]
    return c_prime, m00s, vs, w_hats, d


def permutation_optimized(state: list[int], consts: PoseidonConstants) -> list[int]:
    """Host reference for the sparse-partial-round schedule (golden
    check for the Pallas kernel; must equal `permutation` exactly)."""
    t, mds, rc = consts.t, consts.mds, consts.round_constants
    half_f = consts.r_f // 2
    c_prime, m00s, vs, w_hats, d_last = optimized_partial_schedule(consts.arity)
    s = [x % R for x in state]

    def mix(vec):
        return [sum(mds[i][j] * vec[j] for j in range(t)) % R for i in range(t)]

    c = 0
    for _ in range(half_f):
        s = [pow((x + rc[c + i]) % R, ALPHA, R) for i, x in enumerate(s)]
        c += t
        s = mix(s)
    for k in range(consts.r_p):
        s = [(x + c_prime[k][i]) % R for i, x in enumerate(s)]
        s[0] = pow(s[0], ALPHA, R)
        out0 = (m00s[k] * s[0] + sum(vs[k][j] * s[j + 1] for j in range(t - 1))) % R
        s = [out0] + [(w_hats[k][i] * s[0] + s[i + 1]) % R for i in range(t - 1)]
        c += t
    s = _mat_vec(d_last, s)
    for _ in range(half_f):
        s = [pow((x + rc[c + i]) % R, ALPHA, R) for i, x in enumerate(s)]
        c += t
        s = mix(s)
    return s


def poseidon_hash(preimage: list[int], arity: int | None = None) -> int:
    """Hash `arity` field elements to one (Merkle-tree domain tag)."""
    if arity is None:
        arity = len(preimage)
    if len(preimage) != arity:
        raise ValueError(f"preimage length {len(preimage)} != arity {arity}")
    consts = poseidon_constants(arity)
    state = [consts.domain_tag] + [x % R for x in preimage]
    return permutation(state, consts)[1]


def hash2(a: int, b: int) -> int:
    """Poseidon-2 of two elements; used for comm_r = H(comm_c, comm_r_last)
    (reference: .../stacked/vanilla/proof.hpp:943-945)."""
    return poseidon_hash([a, b], 2)


def hash_md(elements: list[int]) -> int:
    """Merkle-Damgard style fold with the MD-arity constants.

    Mirrors rust-fil-proofs PoseidonFunction::hash_md (consumed by the
    reference's election PoSt partial_ticket,
    post/election/vanilla.hpp `hash_md` over PoseidonMDArity).
    """
    arity = POSEIDON_MD_ARITY
    if len(elements) == 1:
        return elements[0] % R
    acc = elements[0] % R
    for chunk_start in range(1, len(elements), arity - 1):
        chunk = elements[chunk_start : chunk_start + arity - 1]
        preimage = [acc] + [x % R for x in chunk]
        preimage += [0] * (arity - len(preimage))
        acc = poseidon_hash(preimage, arity)
    return acc


def column_hash(rows: list[int]) -> int:
    """Hash a column of per-layer labels (reference:
    .../stacked/vanilla/hash.hpp:37-52 — Poseidon over `layers` elements
    with arity = layer count, e.g. 2 for test sizes, 11 for 32GiB)."""
    return poseidon_hash(rows, len(rows))
