"""Seal API phases + piece staging + unseal (reference test analog:
libs/filecoin/test/api/mod.cpp) at the 2KiB sector class.

The SNARK phase (seal_commit_phase2) is exercised separately on small
PoSt circuits (test_api_post.py) — the 2KiB SDR circuit's Groth16 CRS
generation is a TPU-scale job, not a CPU-CI one.
"""
import os

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.api import mod as api_mod
from crypto3_fil_proofs_tpu.api import seal as api_seal
from crypto3_fil_proofs_tpu.core.fr32 import to_unpadded_bytes
from crypto3_fil_proofs_tpu.types import PoRepConfig

SECTOR_SIZE = 2048
PROVER_ID = bytes([9] * 32)
TICKET = bytes([3] * 32)
SEED = bytes([7] * 32)
SECTOR_ID = 5
POREP_ID = bytes([1] * 32)


@pytest.fixture(scope="module")
def config():
    return PoRepConfig.for_sector_size(SECTOR_SIZE, POREP_ID)


@pytest.fixture(scope="module")
def staged(tmp_path_factory, config):
    """Stage one max-size piece into a sector file via add_piece."""
    tmp = tmp_path_factory.mktemp("seal")
    staged_path = str(tmp / "staged")
    piece_size = to_unpadded_bytes(SECTOR_SIZE)  # 2032 bytes
    piece = bytes((i * 37 + 11) % 256 for i in range(piece_size))
    info, written = api_mod.add_piece(piece, staged_path, piece_size, [])
    assert written == piece_size
    assert os.path.getsize(staged_path) == SECTOR_SIZE
    return tmp, staged_path, piece, [info]


@pytest.fixture(scope="module")
def sealed(staged, config):
    tmp, staged_path, piece, piece_infos = staged
    cache = str(tmp / "cache")
    sealed_path = str(tmp / "sealed")
    p1 = api_seal.seal_pre_commit_phase1(
        config, cache, staged_path, sealed_path, PROVER_ID, SECTOR_ID, TICKET,
        piece_infos,
    )
    # comm_d from the piece tree matches the sector tree_d root
    assert p1.comm_d == api_seal.compute_comm_d(SECTOR_SIZE, piece_infos)
    assert api_mod.validate_cache_for_precommit_phase2(cache, sealed_path, config)
    p2 = api_seal.seal_pre_commit_phase2(config, p1, cache, sealed_path)
    assert p2.comm_d == p1.comm_d
    return tmp, cache, sealed_path, piece, piece_infos, p1, p2


def test_commit_phase1_vanilla(sealed, config):
    tmp, cache, sealed_path, piece, piece_infos, p1, p2 = sealed
    c1 = api_seal.seal_commit_phase1(
        config, cache, sealed_path, PROVER_ID, SECTOR_ID, TICKET, SEED, p2,
        piece_infos,
    )
    assert c1.comm_r == p2.comm_r
    assert len(c1.vanilla_proofs) == config.partitions


def test_unseal_roundtrip(sealed, config):
    tmp, cache, sealed_path, piece, piece_infos, p1, p2 = sealed
    got = api_mod.unseal_range(
        config, cache, sealed_path, PROVER_ID, SECTOR_ID, p2.comm_d, TICKET,
        0, len(piece),
    )
    assert got == piece
    # a middle range
    got = api_mod.unseal_range(
        config, cache, sealed_path, PROVER_ID, SECTOR_ID, p2.comm_d, TICKET,
        100, 64,
    )
    assert got == piece[100:164]


def test_fauxrep(tmp_path, config):
    comm_r = api_seal.fauxrep(config, str(tmp_path / "fxcache"), str(tmp_path / "fxout"))
    assert len(comm_r) == 32
    assert os.path.getsize(tmp_path / "fxout") == SECTOR_SIZE


def test_clear_cache_keeps_post_files(sealed, config):
    import shutil

    tmp, cache, sealed_path, piece, piece_infos, p1, p2 = sealed
    clone = str(tmp / "cache_clone")
    shutil.copytree(cache, clone)
    api_seal.clear_cache(clone)
    names = set(os.listdir(clone))
    assert "p_aux" in names and "t_aux" in names
    assert any("tree-r-last" in n for n in names)
    assert not any("layer-" in n for n in names)
    assert not any("tree-c" in n for n in names)
