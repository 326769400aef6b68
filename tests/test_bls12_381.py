"""BLS12-381 host-reference tests: curve laws, pairing bilinearity, serialization."""
import random

import pytest

from crypto3_fil_proofs_tpu.ops import bls12_381 as bls


def test_field_moduli_structure():
    assert bls.P % 4 == 3
    assert (bls.R - 1) % (1 << 32) == 0
    # root of unity has exact order 2^32
    w = bls.FR_ROOT_OF_UNITY
    assert pow(w, 1 << 32, bls.R) == 1
    assert pow(w, 1 << 31, bls.R) == bls.R - 1


def test_g1_generator_on_curve():
    g = bls.g1_from_affine(bls.G1_GEN)
    assert bls.g1_is_on_curve(g)
    # prime order: r * G = inf
    assert bls.g1_is_inf(bls.g1_mul(g, bls.R))


def test_g2_generator_on_curve():
    g2 = bls.g2_from_affine((bls.G2_GEN_X, bls.G2_GEN_Y))
    assert bls.g2_is_on_curve(g2)
    assert bls.g2_is_inf(bls.g2_mul(g2, bls.R))


def test_g1_group_laws(rng_seed):
    rng = random.Random(rng_seed)
    g = bls.g1_from_affine(bls.G1_GEN)
    a, b = rng.randrange(bls.R), rng.randrange(bls.R)
    pa, pb = bls.g1_mul(g, a), bls.g1_mul(g, b)
    assert bls.g1_eq(bls.g1_add(pa, pb), bls.g1_mul(g, (a + b) % bls.R))
    assert bls.g1_eq(bls.g1_add(pa, bls.g1_neg(pa)), bls.G1_INF)
    assert bls.g1_eq(bls.g1_double(pa), bls.g1_mul(g, (2 * a) % bls.R))
    # affine roundtrip
    assert bls.g1_eq(bls.g1_from_affine(bls.g1_to_affine(pa)), pa)


def test_g2_group_laws(rng_seed):
    rng = random.Random(rng_seed + 1)
    g2 = bls.g2_from_affine((bls.G2_GEN_X, bls.G2_GEN_Y))
    a, b = rng.randrange(bls.R), rng.randrange(bls.R)
    pa, pb = bls.g2_mul(g2, a), bls.g2_mul(g2, b)
    assert bls.g2_eq(bls.g2_add(pa, pb), bls.g2_mul(g2, (a + b) % bls.R))
    assert bls.g2_eq(bls.g2_double(pa), bls.g2_mul(g2, (2 * a) % bls.R))


def test_fq2_tower():
    a = (1234567, 7654321)
    assert bls.fq2_mul(a, bls.fq2_inv(a)) == bls.FQ2_ONE
    a6 = (a, (5, 6), (7, 8))
    assert bls.fq6_mul(a6, bls.fq6_inv(a6)) == bls.FQ6_ONE
    a12 = (a6, ((9, 10), (11, 12), (13, 14)))
    assert bls.fq12_mul(a12, bls.fq12_inv(a12)) == bls.FQ12_ONE
    # frobenius is the p-power map
    assert bls.fq12_frobenius(a12, 1) == bls.fq12_pow(a12, bls.P)


def test_pairing_bilinearity():
    g1 = bls.g1_from_affine(bls.G1_GEN)
    g2 = bls.g2_from_affine((bls.G2_GEN_X, bls.G2_GEN_Y))
    e_ab = bls.pairing(bls.g1_mul(g1, 3), bls.g2_mul(g2, 5))
    e_ba = bls.pairing(bls.g1_mul(g1, 5), bls.g2_mul(g2, 3))
    e_15 = bls.fq12_pow(bls.pairing(g1, g2), 15)
    assert e_ab == e_ba == e_15
    assert bls.pairing(g1, g2) != bls.FQ12_ONE


def test_multi_pairing_product():
    g1 = bls.g1_from_affine(bls.G1_GEN)
    g2 = bls.g2_from_affine((bls.G2_GEN_X, bls.G2_GEN_Y))
    # e(2G1, G2) * e(-G1, 2G2) == e(G1, G2)^0? No: 2*1 + (-1)*2 = 0 -> == 1
    out = bls.multi_pairing([
        (bls.g1_mul(g1, 2), g2),
        (bls.g1_neg(g1), bls.g2_mul(g2, 2)),
    ])
    assert out == bls.FQ12_ONE


def test_g1_compressed_roundtrip(rng_seed):
    rng = random.Random(rng_seed + 2)
    g = bls.g1_from_affine(bls.G1_GEN)
    for _ in range(4):
        p = bls.g1_mul(g, rng.randrange(1, bls.R))
        b = bls.g1_to_compressed(p)
        assert len(b) == 48
        assert bls.g1_eq(bls.g1_from_compressed(b), p)
    # infinity
    assert bls.g1_is_inf(bls.g1_from_compressed(bls.g1_to_compressed(bls.G1_INF)))
    # zcash test vector: compressed generator starts with 0x97 (flag 0x80|0x10...)
    gen_bytes = bls.g1_to_compressed(g)
    assert gen_bytes.hex().startswith("97f1d3a73197d794")


def test_g2_compressed_roundtrip(rng_seed):
    rng = random.Random(rng_seed + 3)
    g2 = bls.g2_from_affine((bls.G2_GEN_X, bls.G2_GEN_Y))
    for _ in range(3):
        p = bls.g2_mul(g2, rng.randrange(1, bls.R))
        b = bls.g2_to_compressed(p)
        assert len(b) == 96
        assert bls.g2_eq(bls.g2_from_compressed(b), p)
    gen_bytes = bls.g2_to_compressed(g2)
    assert gen_bytes.hex().startswith("93e02b60")


def test_fr_bytes_safety():
    assert bls.fr_from_le_bytes(b"\x01" + b"\x00" * 31) == 1
    with pytest.raises(ValueError):
        bls.fr_from_le_bytes(b"\xff" * 32)
    assert bls.fr_from_le_bytes_safe(b"\xff" * 32) < bls.R


def test_msm_naive_matches_sum(rng_seed):
    rng = random.Random(rng_seed + 4)
    g = bls.g1_from_affine(bls.G1_GEN)
    pts = [bls.g1_mul(g, rng.randrange(1, 1000)) for _ in range(8)]
    scs = [rng.randrange(bls.R) for _ in range(8)]
    expect = bls.G1_INF
    for p, s in zip(pts, scs):
        expect = bls.g1_add(expect, bls.g1_mul(p, s))
    assert bls.g1_eq(bls.g1_msm_naive(pts, scs), expect)
