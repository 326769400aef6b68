"""API types: configs, commitments, phase outputs, byte amounts.

Re-implements reference libs/filecoin types/ (types/mod.hpp:42-78,
porep_config.hpp, post_config.hpp, sector_class.hpp, bytes_amount.hpp,
piece_info.hpp, sector_size.hpp).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .constants import (
    LAYERS,
    POREP_MINIMUM_CHALLENGES,
    POREP_PARTITIONS,
    SINGLE_PARTITION_PROOF_LEN,
    WINDOW_POST_CHALLENGE_COUNT,
    WINDOW_POST_SECTOR_COUNT,
    WINNING_POST_CHALLENGE_COUNT,
    WINNING_POST_SECTOR_COUNT,
)
from .core.fr32 import to_unpadded_bytes

# 32-byte aliases (reference types/mod.hpp:42-46)
Commitment = bytes
ChallengeSeed = bytes
ProverId = bytes
Ticket = bytes


class PoStType(Enum):
    WINNING = "winning"
    WINDOW = "window"


@dataclass(frozen=True)
class SectorSize:
    value: int


@dataclass
class PoRepConfig:
    """(reference types/porep_config.hpp:34-70)"""

    sector_size: int
    partitions: int
    porep_id: bytes

    @classmethod
    def for_sector_size(cls, sector_size: int, porep_id: bytes = bytes(32)):
        return cls(sector_size, POREP_PARTITIONS[sector_size], porep_id)

    @property
    def layers(self) -> int:
        return LAYERS[self.sector_size]

    @property
    def minimum_challenges(self) -> int:
        return POREP_MINIMUM_CHALLENGES[self.sector_size]

    def padded_bytes_amount(self) -> int:
        return self.sector_size

    def unpadded_bytes_amount(self) -> int:
        return to_unpadded_bytes(self.sector_size)

    def proof_bytes(self) -> int:
        return self.partitions * SINGLE_PARTITION_PROOF_LEN


@dataclass
class PoStConfig:
    """(reference types/post_config.hpp:33-80)"""

    sector_size: int
    challenge_count: int
    sector_count: int
    typ: PoStType
    priority: bool = False

    @classmethod
    def winning(cls, sector_size: int):
        return cls(
            sector_size,
            WINNING_POST_CHALLENGE_COUNT,
            WINNING_POST_SECTOR_COUNT,
            PoStType.WINNING,
        )

    @classmethod
    def window(cls, sector_size: int):
        return cls(
            sector_size,
            WINDOW_POST_CHALLENGE_COUNT,
            WINDOW_POST_SECTOR_COUNT[sector_size],
            PoStType.WINDOW,
        )

    def padded_sector_size(self) -> int:
        return self.sector_size

    def unpadded_sector_size(self) -> int:
        return to_unpadded_bytes(self.sector_size)


@dataclass
class SectorClass:
    sector_size: int
    partitions: int
    porep_id: bytes

    def as_porep_config(self) -> PoRepConfig:
        return PoRepConfig(self.sector_size, self.partitions, self.porep_id)


# -- phase outputs (reference types/mod.hpp:48-78) --------------------------


@dataclass
class SealPreCommitPhase1Output:
    labels_config: dict
    config: dict  # tree_d store config
    comm_d: Commitment


@dataclass
class SealPreCommitOutput:
    comm_r: Commitment
    comm_d: Commitment


@dataclass
class SealCommitPhase1Output:
    vanilla_proofs: list
    comm_r: Commitment
    comm_d: Commitment
    replica_id: bytes
    seed: Ticket
    ticket: Ticket


@dataclass
class SealCommitOutput:
    proof: bytes


@dataclass
class PieceInfo:
    commitment: Commitment
    size: int  # unpadded bytes


@dataclass
class PrivateReplicaInfo:
    """(reference api/post.hpp PrivateReplicaInfo)"""

    replica_path: str
    comm_r: Commitment
    cache_dir: str
    aux: dict = field(default_factory=dict)


@dataclass
class PublicReplicaInfo:
    comm_r: Commitment
