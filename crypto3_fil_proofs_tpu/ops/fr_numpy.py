"""Vectorized Fr arithmetic on (N, 32)-byte LE arrays via u64 limbs.

Host-side batch ops for sector-scale encode/decode (replica = data + key,
reference: stacked/vanilla/proof.hpp generate_tree_r_last encode-on-the-fly).
The TPU path does the same in u16 limbs (ops/fr_limbs.py).
"""
from __future__ import annotations

import numpy as np

from .bls12_381 import R

_R_LIMBS = np.frombuffer(R.to_bytes(32, "little"), dtype="<u8").astype(np.uint64)


def _to_limbs(a: np.ndarray) -> np.ndarray:
    assert a.dtype == np.uint8 and a.shape[1] == 32
    return np.ascontiguousarray(a).view("<u8").astype(np.uint64)


def _from_limbs(l: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(l.astype("<u8")).view(np.uint8).reshape(-1, 32)


def _ge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic a >= b over (N, 4) limb arrays (limb 3 most significant)."""
    n = a.shape[0]
    result = np.ones(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)
    for i in (3, 2, 1, 0):
        gt = (~decided) & (a[:, i] > b[:, i])
        lt = (~decided) & (a[:, i] < b[:, i])
        result[lt] = False
        decided |= gt | lt
    return result


def _add_limbs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    out = np.empty_like(a)
    carry = np.zeros(a.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(4):
            s = a[:, i] + b[:, i]
            c1 = s < a[:, i]
            s2 = s + carry
            c2 = s2 < s
            out[:, i] = s2
            carry = (c1 | c2).astype(np.uint64)
    return out, carry


def _sub_limbs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.empty_like(a)
    borrow = np.zeros(a.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(4):
            d = a[:, i] - b[:, i]
            b1 = a[:, i] < b[:, i]
            d2 = d - borrow
            b2 = d < borrow
            out[:, i] = d2
            borrow = (b1 | b2).astype(np.uint64)
    return out


def fr_add_bytes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a + b) mod R over (N, 32) LE byte arrays."""
    la, lb = _to_limbs(a), _to_limbs(b)
    s, carry = _add_limbs(la, lb)
    rb = np.broadcast_to(_R_LIMBS, s.shape)
    over = (carry.astype(bool)) | _ge(s, rb)
    s[over] = _sub_limbs(s[over], rb[over])
    return _from_limbs(s)


def fr_sub_bytes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a - b) mod R over (N, 32) LE byte arrays."""
    la, lb = _to_limbs(a), _to_limbs(b)
    rb = np.broadcast_to(_R_LIMBS, la.shape)
    need = ~_ge(la, lb)
    la2 = la.copy()
    s, _ = _add_limbs(la[need], rb[need])
    la2[need] = s
    return _from_limbs(_sub_limbs(la2, lb))
