"""Setup-parameter factories for PoRep and PoSt.

Re-implements reference libs/filecoin parameters.hpp:38-100:
`setup_params` / `public_params` (sector -> nodes/degree/porep_id/layer
challenges), `select_challenges` (grow per-partition count until
partitions * count >= minimum), winning/window PoSt setup params.
"""
from __future__ import annotations

from .constants import (
    DRG_DEGREE,
    EXP_DEGREE,
    LAYERS,
    NODE_SIZE,
    POREP_MINIMUM_CHALLENGES,
    WINDOW_POST_CHALLENGE_COUNT,
    WINDOW_POST_SECTOR_COUNT,
    WINNING_POST_CHALLENGE_COUNT,
    WINNING_POST_SECTOR_COUNT,
)
from .models.porep.stacked.vanilla.params import LayerChallenges, SetupParams
from .models.porep.stacked.vanilla.proof import StackedDrg
from .models.post.fallback import vanilla as fallback
from .types import PoRepConfig, PoStConfig, PoStType


def select_challenges(
    partitions: int, minimum_total_challenges: int, layers: int
) -> LayerChallenges:
    """(reference parameters.hpp select_challenges: grow count until
    partitions * count >= minimum)"""
    count = 1
    while count * partitions < minimum_total_challenges:
        count += 1
    return LayerChallenges(layers=layers, max_count=count)


def setup_params(config: PoRepConfig) -> SetupParams:
    nodes = config.sector_size // NODE_SIZE
    return SetupParams(
        nodes=nodes,
        degree=DRG_DEGREE,
        expansion_degree=EXP_DEGREE,
        porep_id=config.porep_id,
        layer_challenges=select_challenges(
            config.partitions,
            POREP_MINIMUM_CHALLENGES[config.sector_size],
            LAYERS[config.sector_size],
        ),
    )


def public_params(config: PoRepConfig):
    return StackedDrg.setup(setup_params(config))


def winning_post_setup_params(config: PoStConfig) -> fallback.SetupParams:
    """The config carries the registered counts (types/post_config.hpp);
    PoStConfig.winning() fills WINNING_POST_* for production use."""
    assert config.typ == PoStType.WINNING
    return fallback.SetupParams(
        sector_size=config.sector_size,
        challenge_count=config.challenge_count,
        sector_count=config.sector_count,
    )


def window_post_setup_params(config: PoStConfig) -> fallback.SetupParams:
    assert config.typ == PoStType.WINDOW
    return fallback.SetupParams(
        sector_size=config.sector_size,
        challenge_count=config.challenge_count,
        sector_count=config.sector_count,
    )


def winning_post_public_params(config: PoStConfig) -> fallback.PublicParams:
    return fallback.FallbackPoSt.setup(winning_post_setup_params(config))


def window_post_public_params(config: PoStConfig) -> fallback.PublicParams:
    return fallback.FallbackPoSt.setup(window_post_setup_params(config))
