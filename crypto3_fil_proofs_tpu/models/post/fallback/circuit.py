"""Fallback PoSt circuit + compound public inputs.

Re-implements the reference's fallback circuit skeleton + empty
compound shell (reference: post/fallback/circuit.hpp:39-92 — Sector
sub-circuit: comm_r public, comm_c/comm_r_last private tied by
comm_r == H2(comm_c, comm_r_last), per-challenge PoR against
comm_r_last; post/fallback/compound.hpp is a stub, semantics per
rust-fil-proofs fallback compound).

Public-input order per partition (must match generate_public_inputs):
  per sector (sector_count, padded by duplicating the last):
    comm_r,
    then per challenge: packed PoR path bits (the leaf challenge).
"""
from __future__ import annotations

from crypto3_fil_proofs_tpu.zk.gadgets.num import AllocatedNum
from crypto3_fil_proofs_tpu.zk.gadgets.poseidon import hash2_circuit
from crypto3_fil_proofs_tpu.zk.gadgets.por import (
    pack_position_bits_into_inputs,
    packed_position_input_values,
    por_circuit,
)
from crypto3_fil_proofs_tpu.zk.r1cs import ConstraintSystem

from .vanilla import (
    NODE_SIZE,
    Proof,
    PublicInputs,
    PublicParams,
    generate_leaf_challenge,
)

_LE = lambda b: int.from_bytes(b, "little")


def synthesize_sector(
    cs: ConstraintSystem, comm_r: bytes, sector_proof
) -> None:
    """One sector's sub-circuit (reference circuit.hpp `Sector`)."""
    comm_r_num = AllocatedNum.alloc_input(cs, _LE(comm_r), "comm_r")
    comm_c_num = AllocatedNum.alloc(cs, _LE(sector_proof.comm_c), "comm_c")
    comm_r_last = sector_proof.inclusion_proofs[0].root
    comm_r_last_num = AllocatedNum.alloc(cs, _LE(comm_r_last), "comm_r_last")
    hashed = hash2_circuit(cs, comm_c_num, comm_r_last_num)
    AllocatedNum.equals(cs, hashed, comm_r_num)
    for incl in sector_proof.inclusion_proofs:
        leaf = AllocatedNum.alloc(cs, _LE(incl.leaf), "leaf")
        bits = por_circuit(
            cs, leaf, incl.as_options(), comm_r_last_num, hasher="poseidon"
        )
        pack_position_bits_into_inputs(cs, bits)


def circuit_from_vanilla(
    pub_params: PublicParams,
    pub_inputs: PublicInputs,
    partition_proof: Proof,
    k: int,
) -> ConstraintSystem:
    """Partition circuit: sector_count sector sub-circuits (reference
    FallbackPoStCircuit), padding sectors duplicated like the vanilla
    prover."""
    per_chunk = pub_params.sector_count
    pub_chunk = pub_inputs.sectors[k * per_chunk : (k + 1) * per_chunk]
    # padding: vanilla duplicates the last sector proof AND its comm_r
    comm_rs = [s.comm_r for s in pub_chunk]
    while len(comm_rs) < per_chunk:
        comm_rs.append(comm_rs[-1])
    cs = ConstraintSystem()
    for comm_r, sector_proof in zip(comm_rs, partition_proof.sectors):
        with cs.namespace("sector"):
            synthesize_sector(cs, comm_r, sector_proof)
    return cs


def generate_public_inputs(
    pub_params: PublicParams, pub_inputs: PublicInputs, k: int
) -> list[int]:
    """Verifier-side Fr input vector for partition k (reference compound
    semantics: per-sector comm_r + per-challenge packed leaf bits;
    padded sectors repeat the last real sector)."""
    per_chunk = pub_params.sector_count
    pub_chunk = pub_inputs.sectors[k * per_chunk : (k + 1) * per_chunk]
    sectors = list(pub_chunk)
    while len(sectors) < per_chunk:
        sectors.append(sectors[-1])
    leaves = pub_params.sector_size // NODE_SIZE
    leaf_bits = (leaves - 1).bit_length()
    # the padded duplicate of sector i repeats sector i's challenge
    # indices, so recompute with the ORIGINAL chunk position
    inputs: list[int] = []
    for i, sector in enumerate(sectors):
        real_i = min(i, len(pub_chunk) - 1)
        inputs.append(_LE(sector.comm_r))
        for n in range(pub_params.challenge_count):
            challenge_index = (
                (k * per_chunk + real_i) * pub_params.challenge_count + n
            )
            leaf = generate_leaf_challenge(
                pub_params, pub_inputs.randomness, sector.id, challenge_index
            )
            inputs.extend(packed_position_input_values(leaf, leaf_bits))
    return inputs
