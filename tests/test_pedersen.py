"""Pedersen/Jubjub legacy hasher (reference pedersen.hpp:27-34 is an
empty stub; this implements the sapling construction it names — Zcash
protocol spec §5.4.1.7 / §5.4.9.5 — so the §2.3 hasher row is real).
Pure host math: no XLA programs, runs in the default gate."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import pedersen as ped


def test_jubjub_curve_params():
    # d = -(10240/10241): clearing the denominator must hold exactly
    assert (ped.D * 10241 + 10240) % ped.Q == 0
    # subgroup order is prime-ish sanity: odd, below q
    assert ped.SUBGROUP_ORDER & 1 and ped.SUBGROUP_ORDER < ped.Q


def test_generators_on_curve_distinct_and_prime_order():
    gens = [ped.pedersen_generator(i) for i in range(6)]
    assert len({g for g in gens}) == 6
    for g in gens:
        assert ped.is_on_curve(g)
        assert g != ped.IDENTITY
        # cofactor-cleared: the subgroup order annihilates it, and the
        # order is exactly SUBGROUP_ORDER (not a proper divisor check,
        # but [r]G == O validates the hard-coded order constant)
        assert ped.scalar_mul(ped.SUBGROUP_ORDER, g) == ped.IDENTITY
        assert ped.scalar_mul(2, g) != ped.IDENTITY


def test_edwards_group_laws():
    g = ped.pedersen_generator(0)
    h = ped.pedersen_generator(1)
    assert ped.add(g, ped.IDENTITY) == g
    assert ped.add(g, ped.negate(g)) == ped.IDENTITY
    assert ped.add(g, h) == ped.add(h, g)
    assert ped.add(ped.add(g, h), g) == ped.add(g, ped.add(h, g))
    # scalar distributivity
    assert ped.scalar_mul(5, g) == ped.add(
        ped.scalar_mul(2, g), ped.scalar_mul(3, g)
    )


def test_point_codec_roundtrip():
    g = ped.pedersen_generator(0)
    for k in (1, 2, 7, 12345):
        p = ped.scalar_mul(k, g)
        enc = ped.point_to_bytes(p)
        assert ped.point_from_bytes(enc) == p
    # identity round-trips too
    assert ped.point_from_bytes(ped.point_to_bytes(ped.IDENTITY)) == ped.IDENTITY


def test_pedersen_hash_determinism_and_sensitivity():
    a = ped.pedersen_hash(b"\x01" + b"\x00" * 31)
    b = ped.pedersen_hash(b"\x01" + b"\x00" * 31)
    c = ped.pedersen_hash(b"\x03" + b"\x00" * 31)
    assert a == b
    assert a != c
    assert 0 < a < ped.Q


def test_pedersen_multi_segment_uses_second_generator():
    # 64 bytes = 512 bits > 189 bits/segment: segments 0..2 engaged.
    # Manually recompute from the spec encoding and compare.
    data = bytes(range(64))
    bits = ped.bytes_to_bits(data)
    acc = ped.IDENTITY
    m = list(bits)
    while len(m) % 3:
        m.append(0)
    for si, off in enumerate(range(0, len(m), 189)):
        seg = m[off : off + 189]
        scalar = sum(
            (1 + seg[j] + 2 * seg[j + 1]) * (1 - 2 * seg[j + 2]) << (4 * (j // 3))
            for j in range(0, len(seg), 3)
        )
        acc = ped.add(
            acc,
            ped.scalar_mul(scalar % ped.SUBGROUP_ORDER, ped.pedersen_generator(si)),
        )
    assert acc[0] == ped.pedersen_hash(data)


def test_pedersen_md_no_padding_chains():
    blocks = bytes(range(96))  # 3 blocks -> one fold
    d0 = ped.pedersen_hash(blocks[:64])
    expect = ped.pedersen_hash(d0.to_bytes(32, "little") + blocks[64:96])
    assert ped.pedersen_md_no_padding(blocks) == expect


def test_tree_backend_level_matches_single():
    from crypto3_fil_proofs_tpu.ops.tree_hash import get_backend

    be = get_backend("pedersen")
    rng = np.random.default_rng(7)
    nodes = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    nodes[:, 31] &= 0x3F  # keep nodes < q like fr32 leaves
    lvl = be.hash_level(nodes, 2)
    assert lvl.shape == (4, 32)
    for i in range(4):
        single = be.hash_single(
            [nodes[2 * i].tobytes(), nodes[2 * i + 1].tobytes()]
        )
        assert lvl[i].tobytes() == single
    # arity-4 goes through the Merkle-Damgard fold
    lvl4 = be.hash_level(nodes, 4)
    assert lvl4.shape == (2, 32)
    assert (
        lvl4[0].tobytes()
        == ped.pedersen_md_no_padding(nodes[:4].tobytes()).to_bytes(32, "little")
    )


def test_pedersen_circuit_matches_vanilla(rng_seed):
    from crypto3_fil_proofs_tpu.zk.gadgets.boolean import Boolean
    from crypto3_fil_proofs_tpu.zk.gadgets.pedersen import pedersen_hash_circuit
    from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem

    rng = np.random.default_rng(rng_seed)
    for nbytes in (32, 64):
        data = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
        cs = ConstraintSystem()
        bits = [Boolean.alloc(cs, b) for b in ped.bytes_to_bits(data)]
        digest = pedersen_hash_circuit(cs, bits)
        assert digest.value == ped.pedersen_hash(data)
        assert cs.is_satisfied()


def test_pedersen_circuit_tamper_rejected(rng_seed):
    from crypto3_fil_proofs_tpu.zk.gadgets.boolean import Boolean
    from crypto3_fil_proofs_tpu.zk.gadgets.pedersen import pedersen_hash_circuit
    from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem
    from crypto3_fil_proofs_tpu.zk.r1cs import LinearCombination, lc_one

    cs = ConstraintSystem()
    bits = [Boolean.alloc(cs, b) for b in ped.bytes_to_bits(b"\x05" * 32)]
    digest = pedersen_hash_circuit(cs, bits)
    # pin the digest to a wrong constant: system must become unsatisfiable
    cs.enforce(
        digest.lc() - LinearCombination.constant((digest.value + 1) % ped.Q),
        lc_one(),
        LinearCombination(),
        "pin_wrong",
    )
    assert not cs.is_satisfied()


def test_pedersen_generators_pinned_external():
    """ADVICE r3: pinned vectors. Generator 0 equals Zcash's published
    PEDERSEN_HASH_GENERATORS[0] (librustzcash zcash_primitives constants,
    u-coordinate externally confirmed); generators 1-3 and the digests
    are frozen from the same BLAKE2s "Zcash_PH" GroupHash derivation so
    any regression in GroupHash/encoding trips immediately rather than
    being re-derived by the test with the implementation's own formula."""
    pinned = [
        (
            0x73C016A42DED9578B5EA25DE7EC0E3782F0C718F6F0FBADD194E42926F661B51,
            0x289E87A2D3521B5779C9166B837EDC5EF9472E8BC04E463277BFABD432243CCA,
        ),
        (
            0x15A36D1F0F390D8852A35A8C1908DD87A361EE3FD48FDF77B9819DC82D90607E,
            0x015D8C7F5B43FE33F7891142C001D9251F3ABEEB98FAD3E87B0DC53C4EBF1891,
        ),
        (
            0x664321A58246E2F6EB69AE39F5C84210BAE8E5C46641AE5C76D6F7C2B67FC475,
            0x362E1500D24EEE9EE000A46C8E8CE8538BB22A7F1784B49880ED502C9793D457,
        ),
        (
            0x323A6548CE9D9876EDC5F4A9CFF29FD57D02D50E654B87F24C767804C1C4A2CC,
            0x2F7EE40C4B56CAD891070ACBD8D947B75103AFA1A11F6A8584714BECA33570E9,
        ),
    ]
    for i, (x, y) in enumerate(pinned):
        assert ped.pedersen_generator(i) == (x, y), f"generator {i} drifted"


def test_pedersen_hash_frozen_vectors():
    assert ped.pedersen_hash(b"\x01" * 64) == (
        0x61604968258B66EEE5323997D8D6F3FD22E0F75C65A8B58B5ACA7A3090733B6F
    )
    assert ped.pedersen_hash(b"abc" + b"\x00" * 61) == (
        0x712FC298A5FB29D98702ABDB4C008BB5C23D0E7C2CA51FB7AE71942B6A7F39A5
    )
