"""Feistel PRP, ChaCha8, DRG and stacked graph tests."""
import numpy as np

from crypto3_fil_proofs_tpu.core import feistel
from crypto3_fil_proofs_tpu.core.chacha import ChaCha8Rng, chacha8_stream_words, chacha_block
from crypto3_fil_proofs_tpu.core.drgraph import BASE_DEGREE, BucketGraph
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.graph import (
    DEGREE,
    EXP_DEGREE,
    StackedBucketGraph,
)
from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.cache import ParentCache


def test_chacha20_rfc_vector():
    # RFC 8439 2.3.2 test vector uses 20 rounds; validates the block fn.
    key = np.frombuffer(bytes(range(32)), dtype="<u4").astype(np.uint32)
    # RFC uses counter=1 and nonce 000000090000004a00000000; our block fn
    # has zero nonce, so check the all-zero-key/nonce vector instead:
    zero_key = np.zeros(8, dtype=np.uint32)
    block = chacha_block(zero_key, 0, rounds=20)
    out = block.astype("<u4").tobytes()
    # Known ChaCha20 keystream block 0 for zero key/nonce:
    assert out[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_chacha8_stream_matches_scalar():
    seed = bytes(range(32))
    rng = ChaCha8Rng(seed)
    scalar = [rng.next_u32() for _ in range(40)]
    keys = np.frombuffer(seed, dtype="<u4").astype(np.uint32)[None, :]
    vec = chacha8_stream_words(keys, 40)[0]
    assert scalar == [int(x) for x in vec]


def test_feistel_roundtrip():
    keys = [1, 2, 3, 4]
    pre = feistel.precompute(100)
    seen = set()
    for i in range(100):
        e = feistel.permute(100, i, keys, pre)
        assert 0 <= e < 100
        assert feistel.invert_permute(100, e, keys, pre) == i
        seen.add(e)
    assert len(seen) == 100  # bijection


def test_feistel_encode_decode_inverse():
    keys = [0xDEAD, 0xBEEF, 0xCAFE, 0xF00D]
    pre = feistel.precompute(1 << 10)
    for i in [0, 1, 5, 333, 1023]:
        assert feistel.decode(feistel.encode(i, keys, pre), keys, pre) == i


def test_bucket_graph_parents():
    g = BucketGraph(64, porep_id=bytes(32))
    table = g.parents_all()
    assert table.shape == (64, BASE_DEGREE)
    # nodes 0 and 1 reference node 0
    assert (table[0] == 0).all() and (table[1] == 0).all()
    for node in range(2, 64):
        p = table[node]
        assert (p < node).all(), f"parent >= node at {node}"  # DAG property
        assert p[-1] == node - 1  # immediate predecessor
    # deterministic
    assert (g.parents(10) == table[10]).all()
    g2 = BucketGraph(64, porep_id=bytes([1] * 32))
    assert not (g2.parents_all() == table).all()  # porep_id changes sampling


def test_stacked_graph_parents():
    g = StackedBucketGraph(64, porep_id=bytes(32))
    assert g.degree() == DEGREE == 14
    p = g.parents(10)
    assert p.shape == (14,)
    exp = g.expanded_parents(10)
    assert exp.shape == (EXP_DEGREE,)
    assert (exp < 64).all()
    # expander parents may be anywhere in the node space (not a DAG edge);
    # base parents must be strictly smaller
    assert (p[:6] < 10).all()
    table = g.parents_all()
    assert table.shape == (64, 14)
    assert (table[10] == p).all()


def test_parent_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("FIL_PROOFS_PARENT_CACHE", str(tmp_path))
    from crypto3_fil_proofs_tpu.core.settings import reset_settings

    reset_settings()
    g = StackedBucketGraph(64, porep_id=bytes(32))
    c1 = ParentCache(g)
    assert (c1.table() == g.parents_all()).all()
    # second open reads from disk
    c2 = ParentCache(g)
    assert (c2.table() == c1.table()).all()
    assert (c2.read(5) == g.parents(5)).all()
    reset_settings()


def test_native_expander_parents_bit_exact():
    """Native Blake2b Feistel expander table == python feistel.permute
    (reference stacked/vanilla/cache.hpp parent-cache payload;
    core/crypto/feistel.hpp round function)."""
    import numpy as np

    from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.graph import (
        StackedBucketGraph,
    )
    from crypto3_fil_proofs_tpu.ops.native import expander_parents_native

    g = StackedBucketGraph(nodes=1024, porep_id=bytes([7] * 32))
    native = expander_parents_native(
        1024, g.expansion_degree, g.feistel_keys, g.feistel_precomputed[2]
    )
    if native is None:
        import pytest

        pytest.skip("native engine unavailable")
    py = np.stack([g.expanded_parents(n) for n in range(1024)])
    assert (native == py).all()
