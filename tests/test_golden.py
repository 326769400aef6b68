"""External golden vectors (VERDICT round-1 item: bit-exactness must be
anchored to the ecosystem the reference targets, not this repo's own code).

The zero piece commitments below are the published Filecoin "zerocomm"
table (lotus extern/filecoin-ffi + rust-fil-proofs zero piece
commitments; identical values ship in go-fil-commcid/lotus
`zerocomm_test.go`). They pin down, end-to-end, the binary SHA-256
tree_d path the reference builds in seal_pre_commit_phase1
(reference api/seal.hpp:74-100 -> core/merkle/merkle.hpp process_layer;
fr32 254-bit truncation per core/fr32.hpp): leaf layout, pair hashing
order, and the two-high-bit trim of every digest.
"""
import hashlib

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.core.merkle.tree import MerkleTree

# (padded size in bytes, published zero piece commitment CommP = comm_d hex)
ZEROCOMM_VECTORS = [
    (128, "3731bb99ac689f66eef5973e4a94da188f4ddcae580724fc6f3fd60dfd488333"),
    (256, "642a607ef886b004bf2c1978463ae1d4693ac0f410eb2d1b7a47fe205e5e750f"),
    (512, "57a2381a28652bf47f6bef7aca679be4aede5871ab5cf3eb2c08114488cb8526"),
    (2048, "fc7e928296e516faade986b28f92d44a4f24b935485223376a799027bc18f833"),
    (8192, "b2e47bfb11facd941f62af5c750f3ea5cc4df517d5c4f16db2b4d77baec1a32f"),
    (32768, "2c1a964bb90b59ebfe0f6da29ad65ae3e417724a8f7c11745a40cac1e5e74011"),
]


@pytest.mark.parametrize("padded,expected", ZEROCOMM_VECTORS)
def test_zero_piece_commitment(padded, expected):
    leaves = np.zeros((padded // 32, 32), dtype=np.uint8)
    tree = MerkleTree.build(leaves, 2, "sha256")
    assert tree.root().hex() == expected


def test_zerocomm_chain_consistency():
    """Each zerocomm level is sha254(prev || prev) — the defining
    recurrence of the published table; checks our pair hasher directly."""
    node = bytes.fromhex(ZEROCOMM_VECTORS[0][1])
    sizes = {padded: bytes.fromhex(h) for padded, h in ZEROCOMM_VECTORS}
    size = 128
    for _ in range(9):
        digest = bytearray(hashlib.sha256(node + node).digest())
        digest[31] &= 0x3F  # 254-bit trim (reference core/fr32.hpp)
        node = bytes(digest)
        size *= 2
        if size in sizes:
            assert node == sizes[size]


def test_sha256_nist_vector():
    # NIST FIPS 180-4 "abc" — anchors the host hash used for tree_d
    assert (
        hashlib.sha256(b"abc").hexdigest()
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
