"""Compound proof plumbing: vanilla scheme <-> circuit <-> Groth16.

Re-implements the reference's compound_proof / multi_proof layer
(reference: core/proof/compound_proof.hpp:40-205 — setup, per-partition
circuit proofs, generate_public_inputs dispatch, Groth16 prove/verify;
core/proof/multi_proof.hpp:38-58 — one 192-byte Groth16 proof per
partition + shared verifying key).

A protocol plugs in a `CircuitAdapter`: the stacked PoRep and fallback
PoSt adapters live next to their circuits (models/porep/stacked/circuit,
models/post/fallback).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..zk import groth16

SINGLE_PARTITION_PROOF_LEN = 192  # reference constants.hpp:93


@dataclass
class MultiProof:
    """Groth16 proof per partition (reference multi_proof.hpp)."""

    circuit_proofs: list[groth16.Proof]

    def to_bytes(self) -> bytes:
        return b"".join(p.to_bytes() for p in self.circuit_proofs)

    @classmethod
    def from_bytes(cls, data: bytes, partitions: int) -> "MultiProof":
        assert len(data) == partitions * SINGLE_PARTITION_PROOF_LEN, (
            "multi-proof length mismatch"
        )
        return cls(
            [
                groth16.Proof.from_bytes(
                    data[i * SINGLE_PARTITION_PROOF_LEN : (i + 1) * SINGLE_PARTITION_PROOF_LEN]
                )
                for i in range(partitions)
            ]
        )

    def __len__(self) -> int:
        return len(self.circuit_proofs)


class CompoundProof:
    """Generic compound prove/verify over a circuit adapter.

    Adapter interface (mirrors the reference compound_proof hooks):
    - circuit_from_vanilla(pub_params, pub_inputs, partition_proofs, k) -> cs
    - blank_circuit(pub_params) -> cs
    - generate_public_inputs(pub_params, pub_inputs, k) -> list[int]
    - cache_prefix(pub_params) -> str   (Groth16 parameter identity)
    """

    def __init__(self, adapter):
        self.adapter = adapter

    def get_params(self, pub_params, seed: bytes | None = None):
        """Groth16 CRS for this circuit identity (disk-cached)."""
        from .parameter_cache import get_groth_params

        return get_groth_params(
            self.adapter.cache_prefix(pub_params),
            lambda: self.adapter.blank_circuit(pub_params),
            seed=seed,
        )

    def prove(
        self,
        pub_params,
        pub_inputs,
        vanilla_partition_proofs: list,
        pk: groth16.ProvingKey,
        randomness: bytes = b"fil-tpu-prove",
    ) -> MultiProof:
        cs_list = []
        for k, partition_proofs in enumerate(vanilla_partition_proofs):
            cs = self.adapter.circuit_from_vanilla(
                pub_params, pub_inputs, partition_proofs, k
            )
            bad = cs.which_unsatisfied()
            assert bad is None, f"partition {k} circuit unsatisfied: {bad}"
            expected = self.adapter.generate_public_inputs(pub_params, pub_inputs, k)
            got = [v for v, i in zip(cs.values, cs.is_input) if i][1:]
            assert got == expected, f"partition {k} public-input mismatch"
            cs_list.append(cs)
        # partition-parallel Groth16 (SURVEY P4): one device per
        # partition group; byte-identical to the serial loop
        return MultiProof(groth16.prove_many(pk, cs_list, randomness=randomness))

    def verify(
        self,
        pub_params,
        pub_inputs,
        multi_proof: MultiProof,
        vk: groth16.VerifyingKey,
    ) -> bool:
        for k, proof in enumerate(multi_proof.circuit_proofs):
            inputs = self.adapter.generate_public_inputs(pub_params, pub_inputs, k)
            if not groth16.verify(vk, proof, inputs):
                return False
        return True
