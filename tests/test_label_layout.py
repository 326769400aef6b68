"""create_label preimage-layout freeze (PARITY fork F1).

The checked-in C++ (`create_label.hpp:49-58`) hashes a 12-byte
layer‖node buffer BEFORE replica_id; this repo deliberately follows
rust-fil-proofs (`storage-proofs-porep/.../create_label/single.rs`):

    SHA-256( replica_id(32) ‖ BE32(layer) ‖ BE64(node) ‖ 0^20
             ‖ parent_label[i % n] for i in 0..37 )   & last-byte 0x3F

This test pins that layout DEFINITIONALLY (re-builds the preimage
byte-for-byte here and compares digests) and freezes concrete hex
vectors so any reordering — e.g. "fixing" it toward the C++ — trips.
"""
import hashlib

import numpy as np

from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof import _label_layer

REPLICA_ID = bytes(range(32))


def _mask(d: bytes) -> bytes:
    b = bytearray(d)
    b[31] &= 0x3F
    return bytes(b)


def test_node0_layout_replica_id_first_padded_header():
    out = np.zeros((4, 32), dtype=np.uint8)
    base = np.zeros((4, 6), dtype=np.uint32)
    _label_layer(out, None, REPLICA_ID, 1, base, None)
    expect = _mask(
        hashlib.sha256(
            REPLICA_ID + (1).to_bytes(4, "big") + (0).to_bytes(8, "big") + b"\0" * 20
        ).digest()
    )
    assert out[0].tobytes() == expect


def test_parent_repetition_to_37_and_layout():
    nodes = 4
    out = np.zeros((nodes, 32), dtype=np.uint8)
    # node 1..3 each depend on a fixed base-parent set (all zeros -> node 0)
    base = np.zeros((nodes, 6), dtype=np.uint32)
    base[2] = [0, 1, 0, 1, 0, 1]
    base[3] = [2, 1, 0, 2, 1, 0]
    _label_layer(out, None, REPLICA_ID, 1, base, None)
    labels = [out[i].tobytes() for i in range(nodes)]
    for node in (1, 2, 3):
        parents = [labels[p] for p in base[node]]
        h = hashlib.sha256(
            REPLICA_ID
            + (1).to_bytes(4, "big")
            + int(node).to_bytes(8, "big")
            + b"\0" * 20
        )
        for i in range(37):
            h.update(parents[i % len(parents)])
        assert labels[node] == _mask(h.digest()), f"node {node} layout drifted"


def test_exp_parents_appended_after_base():
    nodes = 3
    prev = np.arange(nodes * 32, dtype=np.uint8).reshape(nodes, 32) % 64
    out = np.zeros((nodes, 32), dtype=np.uint8)
    base = np.zeros((nodes, 6), dtype=np.uint32)
    exp = np.ones((nodes, 8), dtype=np.uint32)
    _label_layer(out, prev, REPLICA_ID, 2, base, exp)
    parents = [out[0].tobytes()] * 6 + [prev[1].tobytes()] * 8
    h = hashlib.sha256(
        REPLICA_ID + (2).to_bytes(4, "big") + (1).to_bytes(8, "big") + b"\0" * 20
    )
    for i in range(37):
        h.update(parents[i % 14])
    assert out[1].tobytes() == _mask(h.digest())


def test_frozen_hex_vectors():
    """Regression freeze: literal digests for fixed inputs
    (replica_id = 00..1f, layer 1, 4 nodes, base parents
    [0]*6 / [0]*6 / [0,1,0,1,0,1] / [2,1,0,2,1,0]). A change to
    ordering, widths, padding, or masking breaks these."""
    out = np.zeros((4, 32), dtype=np.uint8)
    base = np.zeros((4, 6), dtype=np.uint32)
    base[2] = [0, 1, 0, 1, 0, 1]
    base[3] = [2, 1, 0, 2, 1, 0]
    _label_layer(out, None, REPLICA_ID, 1, base, None)
    frozen = [
        "0673a1fdce8a76fa61e92977ee6b0b6b287f282791d0a522610a388fb3544e2c",
        "2e409220e2b21031665daabc3a122880d77a3d50a8d5aac5c0157acd2c13f624",
        "95d729fba9a22a1c166e87c4507d984ff5aa3f26c5309bf5413da9947c34f412",
        "3bda07fa4a6efea92ef66b63272555780cee51ef25ea3b8c693a0a799823300b",
    ]
    assert [out[i].tobytes().hex() for i in range(4)] == frozen
