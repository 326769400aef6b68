"""Batched prime-field arithmetic in 16-bit limbs for TPU (JAX/XLA).

This is the TPU-native replacement for the reference's consumed
`crypto3-algebra` / `crypto3-multiprecision` submodules (reference:
SURVEY.md L0; libs/storage/.../core/proof/multi_proof.hpp:32-39,
.../stacked/vanilla/challenges.hpp:33 consume `cpp_int` / `Fr`): every
hot field operation (Poseidon rounds, MSM point adds, NTT butterflies)
runs as batched limb arithmetic on the VPU.

Design (TPU-first):
- A field element is a little-endian vector of 16-bit limbs stored in
  uint32 lanes: shape ``[..., n_limbs]``. LE byte strings reinterpret
  directly as limb vectors (no bit twiddling).
- Multiplication is row-parallel CIOS Montgomery: for each of the
  ``n`` rows we add ``a * b_i`` and ``m * N`` as exact uint32 products
  split into lo/hi halves, with carries deferred. Column growth is
  bounded by 4*(2^16-1) per row, so after n<=24 rows every column is
  < 2^26 + carries — no intermediate normalization is needed, and all
  arithmetic stays in native uint32 (TPUs have no 64-bit integer
  units; this layout never needs one).
- After the row loop a single carry-propagation pass and one
  conditional subtract return a canonical element (< modulus, 16-bit
  limbs). Canonical-in/canonical-out is the module invariant.
- Everything is branch-free and shape-static: `jnp.where` selects,
  python loops over the (static) limb count unroll at trace time.

Fr (255-bit scalar field) uses 16 limbs; Fq (381-bit base field) uses
24. Values are usually kept in Montgomery form (x * 2^(16n) mod p);
`to_mont` / `from_mont` convert.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bls12_381 import P as _FQ_MODULUS
from .bls12_381 import R as _FR_MODULUS

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs_np(x: int, n: int) -> np.ndarray:
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], dtype=np.uint32
    )


class Field:
    """Static per-field data: modulus limbs, Montgomery constants."""

    def __init__(self, modulus: int, n_limbs: int, name: str):
        self.name = name
        self.modulus = modulus
        self.n = n_limbs
        self.mont_r = (1 << (LIMB_BITS * n_limbs)) % modulus
        self.mont_r2 = (self.mont_r * self.mont_r) % modulus
        # -modulus^{-1} mod 2^16
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) & LIMB_MASK
        self.p_np = _int_to_limbs_np(modulus, n_limbs)
        self.p = jnp.asarray(self.p_np)
        self.r2 = jnp.asarray(_int_to_limbs_np(self.mont_r2, n_limbs))
        self.one_mont = jnp.asarray(_int_to_limbs_np(self.mont_r, n_limbs))
        self.zero = jnp.zeros((n_limbs,), dtype=jnp.uint32)

    # -- host conversions ---------------------------------------------------

    def to_limbs(self, values) -> np.ndarray:
        """Python ints / iterable of ints -> uint32 limb array [..., n].

        Bulk path goes through int.to_bytes + one frombuffer reinterpret
        (the per-int limb loop cost minutes per 4M-entry CRS query)."""
        if isinstance(values, int):
            return _int_to_limbs_np(values % self.modulus, self.n)
        m = self.modulus
        nbytes = self.n * (LIMB_BITS // 8)
        raw = b"".join((v % m).to_bytes(nbytes, "little") for v in values)
        return (
            np.frombuffer(raw, dtype="<u2").astype(np.uint32).reshape(-1, self.n)
        )

    def from_limbs(self, limbs) -> list[int]:
        """uint32 limb array [..., n] -> list of python ints."""
        arr = np.asarray(limbs, dtype=np.uint64).reshape(-1, self.n)
        if arr.size and int(arr.max()) <= LIMB_MASK:
            # reduced limbs: one reinterpret + fast int.from_bytes rows
            raw = arr.astype("<u2").tobytes()
            nbytes = self.n * (LIMB_BITS // 8)
            return [
                int.from_bytes(raw[i : i + nbytes], "little")
                for i in range(0, len(raw), nbytes)
            ]
        shifts = np.uint64(LIMB_BITS) * np.arange(self.n, dtype=np.uint64)
        out = []
        for row in arr:
            out.append(sum(int(v) << int(s) for v, s in zip(row, shifts)))
        return out

    def bytes_to_limbs(self, data: np.ndarray) -> np.ndarray:
        """(N, n*2) LE uint8 array -> (N, n) uint32 limbs (pure reinterpret)."""
        assert data.dtype == np.uint8 and data.shape[-1] == self.n * 2
        return np.ascontiguousarray(data).view("<u2").astype(np.uint32)

    def limbs_to_bytes(self, limbs: np.ndarray) -> np.ndarray:
        arr = np.ascontiguousarray(
            np.asarray(limbs, dtype=np.uint32).astype("<u2")
        )
        return arr.view(np.uint8).reshape(*limbs.shape[:-1], self.n * 2)


FR = Field(_FR_MODULUS, 16, "Fr")
FQ = Field(_FQ_MODULUS, 24, "Fq")


# ---------------------------------------------------------------------------
# Core limb kernels (pure jnp; batched over leading axes)
# ---------------------------------------------------------------------------


def _carry_normalize(t: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Propagate deferred carries -> canonical 16-bit limbs [..., n_out].

    Sequential over the (static) limb count; vectorized over the batch.
    """
    limbs = []
    carry = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for j in range(t.shape[-1]):
        v = t[..., j] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    for _ in range(t.shape[-1], n_out):
        limbs.append(carry & LIMB_MASK)
        carry = carry >> LIMB_BITS
    return jnp.stack(limbs[:n_out], axis=-1)


def _sub_if_ge(t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """t - p if t >= p else t, canonical limbs in/out. p broadcasts."""
    n = t.shape[-1]
    diff = []
    borrow = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for j in range(n):
        pj = p[..., j] if p.ndim == t.ndim else p[j]
        sub = pj + borrow
        d = t[..., j] - sub
        borrow = (t[..., j] < sub).astype(jnp.uint32)
        diff.append(d & LIMB_MASK)
    ge = (borrow == 0)[..., None]
    return jnp.where(ge, jnp.stack(diff, axis=-1), t)


def _compact_field_mode() -> bool:
    """Trace-time switch to the compile-compact (fori_loop) CIOS row
    loop. The unrolled form traces ~n x more HLO per multiply, which is
    what XLA:CPU chokes on (an 8-device shard_map MSM program took >10
    minutes to compile cold — the MULTICHIP_r02 timeout); the rolled
    form compiles ~an order of magnitude faster at a small runtime cost
    that only ever applies to tiny CPU test/dryrun shapes. TPU keeps
    the fully unrolled form (XLA:TPU fuses it, and runtime rules).

    FIL_PROOFS_COMPACT_FIELD: "auto" (default: on iff the default
    backend is cpu) | "1" | "0".
    """
    import os

    mode = os.environ.get("FIL_PROOFS_COMPACT_FIELD", "auto")
    if mode == "auto":
        import jax as _jax

        return _jax.default_backend() == "cpu"
    return mode == "1"


def _make_mont_mul(field: Field):
    n = field.n
    n0inv = jnp.uint32(field.n0inv)
    p = field.p

    def _row_step(t, bi, a, zero_col, pad_hi):
        """One CIOS row: add a*b_i and m*N, divide by 2^16."""
        prod = a * bi  # exact in uint32
        t0 = t[..., 0] + (prod[..., 0] & LIMB_MASK)
        m = (t0 * n0inv) & LIMB_MASK
        q = m[..., None] * p
        # accumulate a*b_i and m*N (lo in place, hi shifted one limb up);
        # pure pad/concat + adds — no scatters, XLA fuses these.
        lo = jnp.concatenate(
            [(prod & LIMB_MASK) + (q & LIMB_MASK), zero_col], axis=-1
        )
        hi = jnp.pad((prod >> LIMB_BITS) + (q >> LIMB_BITS), pad_hi)
        t = t + lo + hi
        carry = t[..., 0:1] >> LIMB_BITS
        # divide by 2^16: limb 0 is now ≡ 0 mod 2^16 — drop and shift
        return jnp.concatenate(
            [t[..., 1:2] + carry, t[..., 2:], zero_col], axis=-1
        )

    def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*2^(-16n) mod p. Canonical in/out.

        Row-parallel CIOS: per row, products are exact uint32 (16x16),
        split lo/hi and accumulated with deferred carries. Bound:
        each column grows <= 4*(2^16-1) per row, < 2^26 total for n=24.
        """
        a, b = jnp.broadcast_arrays(a, b)
        nd = a.ndim
        pad_hi = [(0, 0)] * (nd - 1) + [(1, 0)]  # shift up one limb
        # derive the zero accumulator from BOTH operands (not jnp.zeros)
        # so it inherits their varying-manual-axes inside shard_map — a
        # fresh unvarying constant breaks the fori_loop carry type check
        # (and one operand alone may be an unvarying closed-over const)
        zero_col = (a[..., :1] ^ a[..., :1]) | (b[..., :1] ^ b[..., :1])
        t = jnp.repeat(zero_col, n + 1, axis=-1)
        if _compact_field_mode():
            t = jax.lax.fori_loop(
                0,
                n,
                lambda i, tt: _row_step(
                    tt,
                    jax.lax.dynamic_index_in_dim(b, i, axis=-1, keepdims=True),
                    a,
                    zero_col,
                    pad_hi,
                ),
                t,
            )
        else:
            for i in range(n):
                t = _row_step(t, b[..., i : i + 1], a, zero_col, pad_hi)
        t = _carry_normalize(t, n)
        return _sub_if_ge(t, p)

    return mont_mul


def _make_add(field: Field):
    n, p = field.n, field.p

    def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        t = _carry_normalize(a + b, n)
        return _sub_if_ge(t, p)

    return add


def _make_sub(field: Field):
    n, p = field.n, field.p

    def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        # a - b, borrowing; then add p back where it went negative.
        diff = []
        borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
        for j in range(n):
            s = b[..., j] + borrow
            d = a[..., j] - s
            borrow = (a[..., j] < s).astype(jnp.uint32)
            diff.append(d & LIMB_MASK)
        d = jnp.stack(diff, axis=-1)
        neg = borrow.astype(bool)[..., None]
        d_plus_p = _carry_normalize(d + p, n)
        return jnp.where(neg, d_plus_p, d)

    return sub


class FieldOps:
    """Bundle of jitted limb kernels for one field."""

    def __init__(self, field: Field):
        self.field = field
        self.n = field.n
        self.mont_mul = _make_mont_mul(field)
        self.add = _make_add(field)
        self.sub = _make_sub(field)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.field.r2)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros((self.n,), jnp.uint32).at[0].set(1)
        return self.mont_mul(a, one)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a) + self.field.zero, a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """where(cond, a, b) with cond shaped [...] (no limb axis)."""
        return jnp.where(cond[..., None], a, b)

    # host-side helpers (ints in normal domain <-> mont limbs) --------------

    def encode(self, values) -> jnp.ndarray:
        """Python ints -> Montgomery limb array (host precompute path)."""
        f = self.field
        if isinstance(values, int):
            return jnp.asarray(
                f.to_limbs((values * f.mont_r) % f.modulus), dtype=jnp.uint32
            )
        return jnp.asarray(
            f.to_limbs([(v * f.mont_r) % f.modulus for v in values]),
            dtype=jnp.uint32,
        )

    def decode(self, limbs) -> list[int]:
        """Montgomery limb array -> python ints (normal domain)."""
        f = self.field
        rinv = pow(f.mont_r, -1, f.modulus)
        return [(v * rinv) % f.modulus for v in f.from_limbs(np.asarray(limbs))]


fr_ops = FieldOps(FR)
fq_ops = FieldOps(FQ)


# ---------------------------------------------------------------------------
# Struct-of-arrays (SoA) kernels: a field element batch is a TUPLE of
# n_limbs flat [batch] uint32 arrays. Limb shifts become python list
# reindexing (free at trace time) and every op runs on a contiguous
# full-width vector — no concat/pad materialization, which measures
# ~8x faster than the packed [batch, n] form on TPU (the packed ops
# were HBM-copy-bound, not multiply-bound).
# ---------------------------------------------------------------------------


def soa_unpack(packed: jnp.ndarray) -> tuple:
    """[..., n] packed limbs -> tuple of n [...] arrays."""
    return tuple(packed[..., j] for j in range(packed.shape[-1]))


def soa_pack(limbs: tuple) -> jnp.ndarray:
    return jnp.stack(limbs, axis=-1)


def _soa_norm(t: tuple, n_out: int, field: Field) -> tuple:
    limbs = []
    carry = None
    for j in range(len(t)):
        v = t[j] if carry is None else t[j] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    for _ in range(len(t), n_out):
        limbs.append(carry & LIMB_MASK)
        carry = carry >> LIMB_BITS
    return tuple(limbs[:n_out])


def _soa_sub_if_ge(t: tuple, field: Field) -> tuple:
    p = field.p_np
    diff = []
    borrow = None
    for j in range(field.n):
        pj = jnp.uint32(int(p[j]))
        sub = pj if borrow is None else pj + borrow
        d = t[j] - sub
        borrow = (t[j] < sub).astype(jnp.uint32)
        diff.append(d & LIMB_MASK)
    ge = borrow == 0
    return tuple(jnp.where(ge, d, orig) for d, orig in zip(diff, t))


def _soa_sub_if_ge_wide(t: tuple, value: int) -> tuple:
    """t - value if t >= value, over an arbitrary-width canonical limb
    tuple (e.g. the 17-limb REDC output of the Poseidon MXU mix)."""
    width = len(t)
    vl = [(value >> (LIMB_BITS * j)) & LIMB_MASK for j in range(width)]
    diff = []
    borrow = None
    for j in range(width):
        vj = jnp.uint32(vl[j])
        sub = vj if borrow is None else vj + borrow
        d = t[j] - sub
        borrow = (t[j] < sub).astype(jnp.uint32)
        diff.append(d & LIMB_MASK)
    ge = borrow == 0
    return tuple(jnp.where(ge, d, orig) for d, orig in zip(diff, t))


def soa_mont_mul(a: tuple, b: tuple, field: Field) -> tuple:
    """Montgomery product over SoA limb tuples (canonical in/out)."""
    n = field.n
    n0inv = jnp.uint32(field.n0inv)
    p = [jnp.uint32(int(v)) for v in field.p_np]
    zero = jnp.zeros_like(a[0])
    t = [zero] * (n + 1)
    for i in range(n):
        bi = b[i]
        prod = [aj * bi for aj in a]  # exact u32 (16x16-bit)
        t0 = t[0] + (prod[0] & LIMB_MASK)
        m = (t0 * n0inv) & LIMB_MASK
        q = [m * pj for pj in p]
        # accumulate lo in place, hi shifted one limb up
        nt = [None] * (n + 1)
        nt[0] = t0 + (q[0] & LIMB_MASK)
        for j in range(1, n):
            nt[j] = (
                t[j]
                + (prod[j] & LIMB_MASK)
                + (q[j] & LIMB_MASK)
                + (prod[j - 1] >> LIMB_BITS)
                + (q[j - 1] >> LIMB_BITS)
            )
        nt[n] = t[n] + (prod[n - 1] >> LIMB_BITS) + (q[n - 1] >> LIMB_BITS)
        carry = nt[0] >> LIMB_BITS
        # divide by 2^16: drop limb 0 (= 0 mod 2^16), shift down
        t = [nt[1] + carry] + nt[2:] + [zero]
    out = _soa_norm(tuple(t), n, field)
    return _soa_sub_if_ge(out, field)


def soa_add(a: tuple, b: tuple, field: Field) -> tuple:
    s = tuple(x + y for x, y in zip(a, b))
    return _soa_sub_if_ge(_soa_norm(s, field.n, field), field)


def soa_mont_mul_const(a: tuple, const_limbs, field: Field) -> tuple:
    """Montgomery product with a per-limb-constant operand (MDS, RC)."""
    b = tuple(jnp.uint32(int(v)) for v in const_limbs)
    return soa_mont_mul(a, b, field)


def soa_add_const(a: tuple, const_limbs, field: Field) -> tuple:
    s = tuple(x + jnp.uint32(int(c)) for x, c in zip(a, const_limbs))
    return _soa_sub_if_ge(_soa_norm(s, field.n, field), field)


@partial(jax.jit, static_argnames=("which",))
def mont_mul(a, b, which: str = "fr"):
    return (fr_ops if which == "fr" else fq_ops).mont_mul(a, b)


__all__ = [
    "LIMB_BITS",
    "LIMB_MASK",
    "FR",
    "FQ",
    "Field",
    "FieldOps",
    "fr_ops",
    "fq_ops",
    "mont_mul",
]
