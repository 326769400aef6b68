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


def test_piece_alignment_reference_table():
    """Full alignment golden table from the reference's own test suite
    (reference: libs/filecoin/test/pieces.cpp:97-121
    test_get_piece_alignment)."""
    table = [
        (0, 0, (0, 127)),
        (0, 127, (0, 0)),
        (0, 254, (0, 0)),
        (0, 508, (0, 0)),
        (0, 1016, (0, 0)),
        (127, 127, (0, 0)),
        (127, 254, (127, 0)),
        (127, 508, (381, 0)),
        (100, 100, (27, 27)),
        (200, 200, (54, 54)),
        (300, 300, (208, 208)),
    ]
    for in_sector, in_piece, (left, right) in table:
        al = get_piece_alignment(in_sector, in_piece)
        assert (al.left_bytes, al.right_bytes) == (left, right), (
            in_sector,
            in_piece,
        )


def test_piece_start_byte_reference_values():
    """(reference: libs/filecoin/test/pieces.cpp:124-135
    test_get_piece_start_byte)."""
    pieces = [31, 32, 33]
    assert get_piece_start_byte([], pieces[0]) == 0
    assert get_piece_start_byte(pieces[:1], pieces[1]) == 127
    assert get_piece_start_byte(pieces[:2], pieces[2]) == 254


def test_fr32_padding_golden_bitstreams():
    """Byte-level fr32 padding goldens from the reference's own test
    suite (reference: libs/filecoin/test/fr32_reader.cpp:106-133
    test_simple_single/test_simple_127, :244-275 test_exotic)."""
    import io

    from crypto3_fil_proofs_tpu.api.fr32_reader import Fr32Reader
    from crypto3_fil_proofs_tpu.core.fr32 import write_padded

    def padded_of(data: bytes) -> bytes:
        via_reader = Fr32Reader(io.BytesIO(data)).read()
        via_write = write_padded(data)
        assert via_reader == via_write
        return via_reader

    # 32 bytes of 0xff: bits 254/255 of the first Fr are zero-padding
    p = padded_of(b"\xff" * 32)
    assert p[:31] == b"\xff" * 31
    assert p[31] == 0b0011_1111
    assert p[32] == 0b0000_0011
    assert len(p) == 33

    # 127 unpadded bytes -> exactly one 128-byte padded block
    p = padded_of(b"\xff" * 127)
    assert p[:31] == b"\xff" * 31
    assert p[31] == 0b0011_1111
    assert p[32] == 0b1111_1111
    assert len(p) == 128

    # the reference's "exotic" stream: increasing values + 0xff/9
    source = bytes(
        list(range(1, 32)) + [0xFF] + list(range(1, 32)) + [0xFF, 9, 9, 9, 0xFF]
    )
    buf = padded_of(source)
    for i in range(31):
        assert buf[i] == i + 1
    assert buf[31] == 63
    assert buf[32] == (1 << 2) | 0b11
    for i in range(33, 63):
        assert buf[i] == ((i - 31) << 2) & 0xFF
    assert buf[63] == 0x0F << 2
    assert buf[64] == 0x0F | (9 << 4)
    assert buf[65] == 9 << 4
    assert buf[66] == 9 << 4
    assert buf[67] == 0xF0
    assert buf[68] == 0x0F
