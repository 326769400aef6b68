"""Poseidon spec tests: round numbers, constants determinism, permutation."""
from crypto3_fil_proofs_tpu.ops import poseidon as pos
from crypto3_fil_proofs_tpu.ops.bls12_381 import R


def test_round_numbers_match_known_values():
    """EXTERNAL ANCHOR: (R_F, R_P) for BLS12-381 Fr, 128-bit security,
    x^5 sbox, pinned to the published known-values table in neptune
    (filecoin's Poseidon) `src/round_numbers.rs` test
    `round_numbers_matches_known_values`:
    arity (full, partial) = (2,(8,55)) (4,(8,56)) (8,(8,57))
    (11,(8,57)) (16,(8,59)) (24,(8,59)) (36,(8,60)).
    A wrong security-inequality term or margin in round_numbers()
    cannot reproduce this whole table."""
    assert pos.round_numbers(2) == (8, 55)
    assert pos.round_numbers(4) == (8, 56)
    assert pos.round_numbers(8) == (8, 57)
    assert pos.round_numbers(11) == (8, 57)
    assert pos.round_numbers(16) == (8, 59)
    assert pos.round_numbers(24) == (8, 59)
    assert pos.round_numbers(36) == (8, 60)


def test_constants_shape_and_range():
    c = pos.poseidon_constants(2)
    assert len(c.round_constants) == (8 + 55) * 3
    assert all(0 <= x < R for x in c.round_constants)
    assert c.domain_tag == 3
    # MDS is a Cauchy matrix: invertible, symmetric here
    assert c.mds[0][1] == c.mds[1][0]
    assert c.mds[0][0] == pow(3, R - 2, R)


def test_constants_deterministic():
    a = pos.generate_round_constants(3, 8, 55)
    b = pos.generate_round_constants(3, 8, 55)
    assert a == b
    # different t gives different stream
    c = pos.generate_round_constants(5, 8, 56)
    assert a[0] != c[0]


def test_permutation_changes_state_and_is_deterministic():
    c = pos.poseidon_constants(2)
    s1 = pos.permutation([1, 2, 3], c)
    s2 = pos.permutation([1, 2, 3], c)
    assert s1 == s2
    assert s1 != [1, 2, 3]
    assert all(0 <= x < R for x in s1)
    # sensitivity
    s3 = pos.permutation([1, 2, 4], c)
    assert s1 != s3


def test_hash_apis():
    h2 = pos.hash2(7, 9)
    assert 0 < h2 < R
    assert h2 == pos.poseidon_hash([7, 9], 2)
    h8 = pos.poseidon_hash(list(range(1, 9)), 8)
    assert 0 < h8 < R
    assert pos.column_hash([5, 6]) == pos.poseidon_hash([5, 6], 2)


def test_hash_md_folding():
    xs = [i + 1 for i in range(80)]  # > one 36-arity chunk
    h = pos.hash_md(xs)
    assert 0 < h < R
    # manual fold must agree
    acc = xs[0]
    rest = xs[1:]
    for i in range(0, len(rest), 35):
        chunk = rest[i : i + 35]
        pre = [acc] + chunk
        pre += [0] * (36 - len(pre))
        acc = pos.poseidon_hash(pre, 36)
    assert h == acc
    assert pos.hash_md([42]) == 42


def test_sparse_partial_schedule_matches_plain():
    """The appendix-B sparse-MDS factorization (used by the Pallas
    kernel's partial rounds) must be bit-identical to the plain
    permutation at every supported arity."""
    import random

    rng = random.Random(0x5EED)
    for arity in (2, 4, 8, 11, 36):
        c = pos.poseidon_constants(arity)
        for _ in range(2):
            state = [rng.getrandbits(253) for _ in range(c.t)]
            assert pos.permutation_optimized(state, c) == pos.permutation(
                state, c
            ), arity
