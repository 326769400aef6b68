"""fr32 padding + piece pipeline tests (reference test analogs:
libs/filecoin/test/fr32.cpp, fr32_reader.cpp, pieces.cpp)."""
import numpy as np
import pytest

from crypto3_fil_proofs_tpu.api.pieces import (
    PieceInfo,
    compute_comm_d,
    empty_comm_d,
    generate_piece_commitment,
    get_piece_alignment,
    get_piece_start_byte,
    piece_hash,
    verify_pieces,
    zero_padding,
)
from crypto3_fil_proofs_tpu.core.fr32 import (
    pad_sector,
    to_padded_bytes,
    to_unpadded_bytes,
    write_padded,
    write_unpadded,
)


def test_bytes_amounts():
    assert to_padded_bytes(127) == 128
    assert to_unpadded_bytes(128) == 127
    assert to_unpadded_bytes(2048) == 2032
    assert to_padded_bytes(2032) == 2048
    for u in [127, 254, 1016, 2032, 130048]:
        assert to_unpadded_bytes(to_padded_bytes(u)) == u


def test_write_padded_structure():
    # 127 bytes = 1016 bits = 4 chunks of 254 -> 128 bytes
    data = bytes(range(1, 128))
    padded = write_padded(data)
    assert len(padded) == 128
    # every 32-byte element has its top two bits clear (valid Fr)
    for i in range(31, 128, 32):
        assert padded[i] & 0xC0 == 0
    # first 31 bytes pass through untouched (first 248 bits)
    assert padded[:31] == data[:31]


def test_pad_unpad_roundtrip():
    for n in [1, 31, 32, 127, 128, 254, 1000]:
        data = bytes((i * 7 + 3) % 256 for i in range(n))
        padded = write_padded(data)
        assert write_unpadded(padded, 0, n) == data


def test_pad_sector_shape():
    leaves = pad_sector(b"hello world", 2048)
    assert leaves.shape == (64, 32)
    assert (leaves[:, 31] & 0xC0 == 0).all()


def test_piece_commitment_and_zero_padding():
    p = generate_piece_commitment(bytes(127))
    # all-zero piece of 127 bytes == zero_padding(127)
    assert p.commitment == zero_padding(127).commitment
    assert p.size == 127
    with pytest.raises(ValueError):
        generate_piece_commitment(bytes(100))


def test_empty_comm_d_consistency():
    # comm_d of empty 2KiB sector == tree_d root over zero sector
    from crypto3_fil_proofs_tpu.core.merkle import MerkleTree

    leaves = np.zeros((64, 32), dtype=np.uint8)
    tree = MerkleTree.build(leaves, 2, "sha256")
    assert empty_comm_d(2048) == tree.root()


def test_compute_comm_d_single_full_piece():
    data = bytes((i * 3 + 1) % 256 for i in range(2032))
    piece = generate_piece_commitment(data)
    comm_d = compute_comm_d(2048, [piece])
    # must equal tree_d root over the padded sector
    from crypto3_fil_proofs_tpu.core.merkle import MerkleTree
    from crypto3_fil_proofs_tpu.core.fr32 import pad_sector

    tree = MerkleTree.build(pad_sector(data, 2048), 2, "sha256")
    assert comm_d == tree.root()
    assert verify_pieces(comm_d, [piece], 2048)


def test_compute_comm_d_two_pieces():
    a = generate_piece_commitment(bytes(b"A" * 1016))
    b = generate_piece_commitment(bytes(b"B" * 1016))
    comm_d = compute_comm_d(2048, [a, b])
    assert comm_d == piece_hash(a.commitment, b.commitment)
    # one piece + implicit zero alignment
    comm_d2 = compute_comm_d(2048, [a])
    assert comm_d2 == piece_hash(a.commitment, zero_padding(1016).commitment)


def test_piece_alignment():
    al = get_piece_alignment(0, 127)
    assert (al.left_bytes, al.right_bytes) == (0, 0)
    al = get_piece_alignment(127, 254)
    assert al.left_bytes == 127
    assert get_piece_start_byte([127], 254) == 254
