"""Limb-field engine vs host bigint golden path.

Validates ops/fr_limbs.py (batched 16-bit-limb Montgomery arithmetic,
the TPU replacement for crypto3-algebra/multiprecision) bit-exactly
against python integer arithmetic.
"""
import random

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import fr_limbs as fl


@pytest.fixture(params=["fr", "fq"])
def ops(request):
    return fl.fr_ops if request.param == "fr" else fl.fq_ops


def _rand_elems(modulus, count, seed):
    rng = random.Random(seed)
    vals = [rng.randrange(modulus) for _ in range(count - 3)]
    return vals + [0, 1, modulus - 1]


def test_limb_roundtrip(ops, rng_seed):
    f = ops.field
    vals = _rand_elems(f.modulus, 16, rng_seed)
    limbs = f.to_limbs(vals)
    assert limbs.dtype == np.uint32
    assert ops.field.from_limbs(limbs) == vals


def test_bytes_reinterpret(ops, rng_seed):
    f = ops.field
    vals = _rand_elems(f.modulus, 8, rng_seed + 1)
    raw = np.stack(
        [
            np.frombuffer(v.to_bytes(f.n * 2, "little"), dtype=np.uint8)
            for v in vals
        ]
    )
    limbs = f.bytes_to_limbs(raw)
    assert f.from_limbs(limbs) == vals
    assert np.array_equal(f.limbs_to_bytes(limbs), raw)


def test_add_sub(ops, rng_seed):
    f = ops.field
    a = _rand_elems(f.modulus, 32, rng_seed + 2)
    b = _rand_elems(f.modulus, 32, rng_seed + 3)
    la, lb = f.to_limbs(a), f.to_limbs(b)
    got_add = f.from_limbs(np.asarray(ops.add(la, lb)))
    got_sub = f.from_limbs(np.asarray(ops.sub(la, lb)))
    assert got_add == [(x + y) % f.modulus for x, y in zip(a, b)]
    assert got_sub == [(x - y) % f.modulus for x, y in zip(a, b)]


def test_mont_mul(ops, rng_seed):
    f = ops.field
    a = _rand_elems(f.modulus, 32, rng_seed + 4)
    b = _rand_elems(f.modulus, 32, rng_seed + 5)
    ma, mb = ops.encode(a), ops.encode(b)
    got = ops.decode(ops.mont_mul(ma, mb))
    assert got == [(x * y) % f.modulus for x, y in zip(a, b)]


def test_mont_roundtrip_and_chain(ops, rng_seed):
    f = ops.field
    vals = _rand_elems(f.modulus, 8, rng_seed + 6)
    m = ops.encode(vals)
    assert ops.decode(m) == vals
    # x^8 via repeated squaring stays canonical
    acc = m
    for _ in range(3):
        acc = ops.mont_mul(acc, acc)
    assert ops.decode(acc) == [pow(v, 8, f.modulus) for v in vals]


def test_neg_and_zero(ops):
    f = ops.field
    vals = [0, 1, f.modulus - 1, 12345]
    limbs = f.to_limbs(vals)
    got = f.from_limbs(np.asarray(ops.neg(limbs)))
    assert got == [(-v) % f.modulus for v in vals]
    assert list(np.asarray(ops.is_zero(limbs))) == [True, False, False, False]


def test_compact_vs_unrolled_mont_mul(ops, rng_seed, monkeypatch):
    """The compile-compact (fori_loop) CIOS and the fully-unrolled CIOS
    are the same math: bit-identical products on the same inputs. The
    compact form is what the CPU test/dryrun backend runs by default
    (FIL_PROOFS_COMPACT_FIELD=auto); TPU keeps the unrolled form."""
    f = ops.field
    xs = _rand_elems(f.modulus, 16, rng_seed + 20)
    ys = _rand_elems(f.modulus, 16, rng_seed + 21)
    a, b = f.to_limbs(xs), f.to_limbs(ys)
    monkeypatch.setenv("FIL_PROOFS_COMPACT_FIELD", "1")
    compact = np.asarray(ops.mont_mul(a, b))
    monkeypatch.setenv("FIL_PROOFS_COMPACT_FIELD", "0")
    unrolled = np.asarray(ops.mont_mul(a, b))
    assert (compact == unrolled).all()
    rinv = pow(f.mont_r, -1, f.modulus)
    want = f.to_limbs([(x * y * rinv) % f.modulus for x, y in zip(xs, ys)])
    assert (compact == want).all()
