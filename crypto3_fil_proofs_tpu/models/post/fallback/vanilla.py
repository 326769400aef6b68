"""Fallback PoSt (production Winning + Window PoSt) — vanilla prover/verifier.

Re-implements reference post/fallback/vanilla.hpp (433 LoC):
- challenge derivation: sector challenge = LE64(SHA-256(prover_id ||
  randomness || LE64(n))) mod set_len (:380-394); leaf challenge =
  LE64(SHA-256(randomness || LE64(sector_id) || LE64(index))) mod leaves
  (:396-411)
- prove_all_partitions: sectors chunked per partition (sector_count each),
  challenge_count cached LC-tree proofs per sector, partitions padded by
  duplicating the last sector proof (:188-251)
- verify_all_partitions: comm_r == H2(comm_c, comm_r_last) + inclusion
  proof validation per challenge (:253-323)
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

from crypto3_fil_proofs_tpu.core.merkle import MerkleProof
from crypto3_fil_proofs_tpu.ops.poseidon import hash2

NODE_SIZE = 32


@dataclass
class SetupParams:
    sector_size: int
    challenge_count: int
    sector_count: int


@dataclass
class PublicParams:
    sector_size: int
    challenge_count: int
    sector_count: int


@dataclass
class PublicSector:
    id: int
    comm_r: bytes


@dataclass
class PublicInputs:
    randomness: bytes
    prover_id: bytes
    sectors: list[PublicSector]
    k: int | None = None


@dataclass
class PrivateSector:
    tree: "object"  # LC CompoundMerkleTree | MerkleTree
    comm_c: bytes
    comm_r_last: bytes


@dataclass
class PrivateInputs:
    sectors: list[PrivateSector]


@dataclass
class SectorProof:
    inclusion_proofs: list[MerkleProof]
    comm_c: bytes
    comm_r_last: bytes


@dataclass
class Proof:
    sectors: list[SectorProof]


@dataclass
class ChallengeRequirements:
    minimum_challenge_count: int


class FallbackPoSt:
    @staticmethod
    def setup(sp: SetupParams) -> PublicParams:
        return PublicParams(sp.sector_size, sp.challenge_count, sp.sector_count)

    @staticmethod
    def prove_all_partitions(
        pub_params: PublicParams,
        pub_inputs: PublicInputs,
        priv_inputs: PrivateInputs,
        partition_count: int,
    ) -> list[Proof]:
        assert len(priv_inputs.sectors) == len(pub_inputs.sectors), (
            "inconsistent number of private and public sectors"
        )
        per_chunk = pub_params.sector_count
        num_sectors = len(pub_inputs.sectors)
        assert num_sectors <= partition_count * per_chunk, (
            "cannot prove the provided number of sectors"
        )
        partition_proofs = []
        for j in range(partition_count):
            pub_chunk = pub_inputs.sectors[j * per_chunk : (j + 1) * per_chunk]
            priv_chunk = priv_inputs.sectors[j * per_chunk : (j + 1) * per_chunk]
            proofs: list[SectorProof] = []
            for i, (pub_sector, priv_sector) in enumerate(zip(pub_chunk, priv_chunk)):
                inclusion_proofs = []
                for n in range(pub_params.challenge_count):
                    challenge_index = (j * per_chunk + i) * pub_params.challenge_count + n
                    leaf = generate_leaf_challenge(
                        pub_params, pub_inputs.randomness, pub_sector.id, challenge_index
                    )
                    inclusion_proofs.append(priv_sector.tree.gen_proof(leaf))
                proofs.append(
                    SectorProof(inclusion_proofs, priv_sector.comm_c, priv_sector.comm_r_last)
                )
            # pad the partition by duplicating the last sector proof
            while len(proofs) < per_chunk:
                proofs.append(proofs[-1])
            partition_proofs.append(Proof(sectors=proofs))
        return partition_proofs

    @staticmethod
    def verify_all_partitions(
        pub_params: PublicParams,
        pub_inputs: PublicInputs,
        partition_proofs: list[Proof],
    ) -> bool:
        per_chunk = pub_params.sector_count
        num_sectors = len(pub_inputs.sectors)
        if num_sectors > per_chunk * len(partition_proofs):
            return False
        for j, proof in enumerate(partition_proofs):
            pub_chunk = pub_inputs.sectors[j * per_chunk : (j + 1) * per_chunk]
            if len(proof.sectors) != per_chunk:
                return False
            for i, (pub_sector, sector_proof) in enumerate(zip(pub_chunk, proof.sectors)):
                comm_r_last = sector_proof.inclusion_proofs[0].root
                expect = hash2(
                    int.from_bytes(sector_proof.comm_c, "little"),
                    int.from_bytes(comm_r_last, "little"),
                ).to_bytes(32, "little")
                if expect != pub_sector.comm_r:
                    return False
                if len(sector_proof.inclusion_proofs) != pub_params.challenge_count:
                    return False
                for n, incl in enumerate(sector_proof.inclusion_proofs):
                    challenge_index = (j * per_chunk + i) * pub_params.challenge_count + n
                    leaf = generate_leaf_challenge(
                        pub_params, pub_inputs.randomness, pub_sector.id, challenge_index
                    )
                    if incl.root != comm_r_last:
                        return False
                    if not incl.validate():
                        return False
                    if not incl.proves_challenge(leaf):
                        return False
        return True

    @staticmethod
    def satisfies_requirements(
        pub_params: PublicParams, requirements: ChallengeRequirements, partitions: int
    ) -> bool:
        checked = partitions * pub_params.sector_count
        return checked * pub_params.challenge_count >= requirements.minimum_challenge_count


def generate_sector_challenge(
    randomness: bytes, n: int, sector_set_len: int, prover_id: bytes
) -> int:
    h = hashlib.sha256(prover_id + randomness + n.to_bytes(8, "little")).digest()
    return int.from_bytes(h[:8], "little") % sector_set_len


def generate_sector_challenges(
    randomness: bytes, challenge_count: int, sector_set_len: int, prover_id: bytes
) -> list[int]:
    return [
        generate_sector_challenge(randomness, n, sector_set_len, prover_id)
        for n in range(challenge_count)
    ]


def generate_leaf_challenge(
    pub_params: PublicParams, randomness: bytes, sector_id: int, leaf_challenge_index: int
) -> int:
    h = hashlib.sha256(
        randomness + sector_id.to_bytes(8, "little") + leaf_challenge_index.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(h[:8], "little") % (pub_params.sector_size // NODE_SIZE)
