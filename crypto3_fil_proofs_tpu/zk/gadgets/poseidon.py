"""In-circuit Poseidon matching ops/poseidon.py bit-exactly.

Replaces the reference's consumed `hash2_circuit` / POSEIDON_CONSTANTS
blueprint components (reference: stacked/circuit/hash.hpp:42-56 hashes
columns in-circuit with arity 2/11 constants; circuit/column.hpp:41-100).

Linear layers (round-constant add, MDS mix) are folded into the linear
combinations — only the x^5 S-boxes allocate variables (3 constraints
each), so a t=9 hash costs 3*(t*R_F + R_P) + 1 constraints.
"""
from __future__ import annotations

from ...ops.bls12_381 import R
from ...ops.poseidon import poseidon_constants
from ..r1cs import ConstraintSystem, LinearCombination, lc_one
from .num import AllocatedNum


def _sbox(cs, lc: LinearCombination, value: int):
    """x -> x^5 with 3 constraints; returns (lc', value')."""
    v2 = (value * value) % R
    x2 = cs.alloc(v2, "sbox_x2")
    cs.enforce(lc, lc, LinearCombination.from_var(x2), "x2")
    v4 = (v2 * v2) % R
    x4 = cs.alloc(v4, "sbox_x4")
    cs.enforce(
        LinearCombination.from_var(x2),
        LinearCombination.from_var(x2),
        LinearCombination.from_var(x4),
        "x4",
    )
    v5 = (v4 * value) % R
    x5 = cs.alloc(v5, "sbox_x5")
    cs.enforce(LinearCombination.from_var(x4), lc, LinearCombination.from_var(x5), "x5")
    return LinearCombination.from_var(x5), v5


def poseidon_hash_circuit(
    cs: ConstraintSystem, preimage: list[AllocatedNum], arity: int | None = None
) -> AllocatedNum:
    """Hash `arity` AllocatedNums to one (Merkle domain tag), returning
    the digest as an AllocatedNum. Matches ops/poseidon.poseidon_hash."""
    if arity is None:
        arity = len(preimage)
    assert len(preimage) == arity
    consts = poseidon_constants(arity)
    t, rc, mds = consts.t, consts.round_constants, consts.mds

    lcs = [LinearCombination.constant(consts.domain_tag)] + [
        n.lc() for n in preimage
    ]
    vals = [consts.domain_tag] + [n.value for n in preimage]
    c = 0
    half_f = consts.r_f // 2

    def add_rc():
        nonlocal c
        for i in range(t):
            lcs[i] = lcs[i] + rc[c + i]
            vals[i] = (vals[i] + rc[c + i]) % R
        c += t

    def mix():
        new_lcs, new_vals = [], []
        for i in range(t):
            acc_lc = LinearCombination()
            acc_v = 0
            for j in range(t):
                acc_lc = acc_lc + lcs[j].scale(mds[i][j])
                acc_v += mds[i][j] * vals[j]
            new_lcs.append(acc_lc)
            new_vals.append(acc_v % R)
        lcs[:], vals[:] = new_lcs, new_vals

    for _ in range(half_f):
        add_rc()
        for i in range(t):
            lcs[i], vals[i] = _sbox(cs, lcs[i], vals[i])
        mix()
    for _ in range(consts.r_p):
        add_rc()
        lcs[0], vals[0] = _sbox(cs, lcs[0], vals[0])
        mix()
    for _ in range(half_f):
        add_rc()
        for i in range(t):
            lcs[i], vals[i] = _sbox(cs, lcs[i], vals[i])
        mix()

    out = AllocatedNum.alloc(cs, vals[1], "poseidon_digest")
    cs.enforce(lcs[1] - out.lc(), lc_one(), LinearCombination(), "digest")
    return out


def hash2_circuit(cs, a: AllocatedNum, b: AllocatedNum) -> AllocatedNum:
    """comm_r = H2(comm_c, comm_r_last) in-circuit
    (reference: stacked/circuit/proof.hpp comm_r == H2 constraint)."""
    return poseidon_hash_circuit(cs, [a, b], 2)
