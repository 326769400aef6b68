"""Global tunables backed by FIL_PROOFS_* environment variables.

Mirrors the reference `configuration` struct
(reference: core/configuration.hpp:34-66). GPU toggles become TPU kernel
selection flags (SURVEY.md P9): `use_tpu_column_builder` /
`use_tpu_tree_builder` select the batched JAX/Pallas hash path over the
host path.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return default if v is None else int(v)


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass
class Settings:
    # TPU batched-builder toggles (reference GPU toggles, configuration.hpp:50-56)
    use_tpu_column_builder: bool = field(
        default_factory=lambda: _env_bool("FIL_PROOFS_USE_TPU_COLUMN_BUILDER", True)
    )
    max_tpu_column_batch_size: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_MAX_TPU_COLUMN_BATCH_SIZE", 400_000)
    )
    column_write_batch_size: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_COLUMN_WRITE_BATCH_SIZE", 262_144)
    )
    use_tpu_tree_builder: bool = field(
        default_factory=lambda: _env_bool("FIL_PROOFS_USE_TPU_TREE_BUILDER", True)
    )
    max_tpu_tree_batch_size: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_MAX_TPU_TREE_BATCH_SIZE", 700_000)
    )
    # Merkle cache shape (configuration.hpp:57-59)
    rows_to_discard: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_ROWS_TO_DISCARD", 2)
    )
    # SDR labeling (configuration.hpp:60-65)
    sdr_parents_cache_size: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_SDR_PARENTS_CACHE_SIZE", 2048)
    )
    use_multicore_sdr: bool = field(
        default_factory=lambda: _env_bool("FIL_PROOFS_USE_MULTICORE_SDR", True)
    )
    multicore_sdr_producers: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_MULTICORE_SDR_PRODUCERS", 3)
    )
    multicore_sdr_producer_stride: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_MULTICORE_SDR_PRODUCER_STRIDE", 128)
    )
    multicore_sdr_lookahead: int = field(
        default_factory=lambda: _env_int("FIL_PROOFS_MULTICORE_SDR_LOOKAHEAD", 800)
    )
    # Directories
    parameter_cache: str = field(
        default_factory=lambda: _env_str(
            "FIL_PROOFS_PARAMETER_CACHE", "/var/tmp/filecoin-proof-parameters"
        )
    )
    parent_cache: str = field(
        default_factory=lambda: _env_str(
            "FIL_PROOFS_PARENT_CACHE", "/var/tmp/filecoin-parents"
        )
    )
    cache_dir: str = field(default_factory=lambda: _env_str("FIL_PROOFS_CACHE_DIR", ""))
    verify_cache: bool = field(
        default_factory=lambda: _env_bool("FIL_PROOFS_VERIFY_CACHE", False)
    )


def _load_config_ini() -> None:
    """Seed missing FIL_PROOFS_* env vars from ./config.ini
    (reference: core/configuration.hpp reads config.ini)."""
    import configparser

    path = os.environ.get("FIL_PROOFS_CONFIG", "config.ini")
    if not os.path.exists(path):
        return
    cp = configparser.ConfigParser()
    try:
        cp.read(path)
    except configparser.Error:
        return
    for section in cp.sections():
        for key, value in cp.items(section):
            env = f"FIL_PROOFS_{key.upper()}"
            os.environ.setdefault(env, value)


_SETTINGS: Settings | None = None


def settings() -> Settings:
    global _SETTINGS
    if _SETTINGS is None:
        _load_config_ini()
        _SETTINGS = Settings()
    return _SETTINGS


def reset_settings() -> None:
    """Re-read the environment (tests)."""
    global _SETTINGS
    _SETTINGS = None
