"""fr32 bit-padding: 2 zero bits per 254 data bits.

Replaces reference libs/filecoin/.../fr32.hpp:41-372 (padding_map with
data_bits=254 / element_bits=256, write_padded / write_unpadded) and the
core fr32 aliases (core/fr32.hpp:36-55).

Bit order: bytes are treated as little-endian bit streams (bit 0 of the
stream = LSB of byte 0), so each 254-bit chunk becomes the low 254 bits
of a 32-byte little-endian Fr element with the two high bits zero —
guaranteeing every 32-byte node of the padded sector is a valid Fr.

Implementation is vectorized with numpy packbits/unpackbits instead of
the reference's per-bit Buffer machinery (fr32_reader.hpp).
"""
from __future__ import annotations

import numpy as np

DATA_BITS = 254
ELEMENT_BITS = 256
NODE_SIZE = 32


def to_padded_bytes(unpadded: int) -> int:
    """UnpaddedBytesAmount -> PaddedBytesAmount
    (reference: types/bytes_amount.hpp; 127 unpadded bytes -> 128)."""
    return unpadded + unpadded // 127


def to_unpadded_bytes(padded: int) -> int:
    """PaddedBytesAmount -> UnpaddedBytesAmount (128 -> 127)."""
    return padded - padded // 128


def unpadded_sector_size(sector_size: int) -> int:
    """Max raw data bytes a sector holds (2048 -> 2032)."""
    return to_unpadded_bytes(sector_size)


def _write_padded_whole(data: bytes) -> bytes:
    """One-shot padding core (bit arrays ~8x the input; callers chunk)."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    n_elements = -(-len(bits) // DATA_BITS)
    padded_bits = np.zeros(n_elements * ELEMENT_BITS, dtype=np.uint8)
    view = padded_bits.reshape(n_elements, ELEMENT_BITS)
    chunks = np.zeros(n_elements * DATA_BITS, dtype=np.uint8)
    chunks[: len(bits)] = bits
    view[:, :DATA_BITS] = chunks.reshape(n_elements, DATA_BITS)
    out_bits = len(bits) + 2 * (len(bits) // DATA_BITS)
    return np.packbits(padded_bits, bitorder="little").tobytes()[
        : -(-out_bits // 8)
    ]


# 127 unpadded bytes = exactly 4 elements = 128 padded bytes: chunking
# on this lattice keeps every chunk element-aligned, so outputs
# concatenate byte-exactly. ~16 MB input chunks bound the 1-byte-per-bit
# transient arrays to ~130 MB (the one-shot path peaked 13.6 GiB on a
# 512 MiB add_piece — r5 RSS run).
_PAD_CHUNK = 127 * (1 << 17)


def write_padded(data: bytes) -> bytes:
    """Insert 2 zero bits after every 254 data bits. Output length is
    the exact padded bit-stream length, byte-rounded — a partial tail
    element is NOT zero-filled to 32 bytes (reference fr32.hpp
    transform_bit_offset semantics; goldens fr32_reader.cpp:106-133:
    32 bytes pad to 33, 127 to 128, 68 to 69). Sector-shaped callers
    zero-fill separately (pad_sector)."""
    if len(data) == 0:
        return b""
    if len(data) <= _PAD_CHUNK:
        return _write_padded_whole(data)
    view = memoryview(data)
    return b"".join(
        _write_padded_whole(bytes(view[lo : lo + _PAD_CHUNK]))
        for lo in range(0, len(data), _PAD_CHUNK)
    )


def _write_unpadded_whole(padded: bytes) -> bytes:
    bits = np.unpackbits(np.frombuffer(padded, dtype=np.uint8), bitorder="little")
    data_bits = bits.reshape(-1, ELEMENT_BITS)[:, :DATA_BITS].reshape(-1)
    return np.packbits(data_bits, bitorder="little").tobytes()


def write_unpadded(padded: bytes, offset_bytes: int = 0, num_bytes: int | None = None) -> bytes:
    """Strip the 2 padding bits per element and return `num_bytes` of raw
    data starting at unpadded offset `offset_bytes`
    (reference: fr32.hpp:344-368 write_unpadded)."""
    if len(padded) % NODE_SIZE != 0:
        # partial tail element (exact-bit-length write_padded output):
        # zero-fill to the element boundary — the missing bits are zero
        # by the padding invariant
        pad = NODE_SIZE - len(padded) % NODE_SIZE
        padded = bytes(padded) + b"\0" * pad
    chunk = (_PAD_CHUNK // 127) * 128  # element-aligned padded bytes
    if len(padded) <= chunk:
        raw = _write_unpadded_whole(padded)
    else:
        view = memoryview(padded)
        raw = b"".join(
            _write_unpadded_whole(bytes(view[lo : lo + chunk]))
            for lo in range(0, len(padded), chunk)
        )
    if num_bytes is None:
        return raw[offset_bytes:]
    return raw[offset_bytes : offset_bytes + num_bytes]


def pad_sector(data: bytes, sector_size: int) -> np.ndarray:
    """fr32-pad raw data and zero-fill to a full sector; returns the
    (nodes, 32) uint8 leaf array for tree_d."""
    max_unpadded = unpadded_sector_size(sector_size)
    if len(data) > max_unpadded:
        raise ValueError(f"data ({len(data)}) exceeds sector capacity ({max_unpadded})")
    padded = write_padded(data)
    out = np.zeros((sector_size // NODE_SIZE, NODE_SIZE), dtype=np.uint8)
    if padded:
        flat = out.reshape(-1)
        flat[: len(padded)] = np.frombuffer(padded, dtype=np.uint8)
    return out
