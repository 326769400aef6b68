"""Native C engine (SHA-NI labeling + batched sha256) vs python golden."""
import hashlib
import time

import numpy as np
import pytest

from crypto3_fil_proofs_tpu.ops import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native engine unavailable (no toolchain)")
    return lib


def test_sha256_many_matches_hashlib(lib, rng_seed):
    rng = np.random.default_rng(rng_seed)
    for msg_len in (64, 127, 128, 1248):
        msgs = rng.integers(0, 256, size=(16, msg_len), dtype=np.uint8)
        got = native.sha256_many_native(msgs, trim_fr=False)
        want = np.stack(
            [
                np.frombuffer(hashlib.sha256(m.tobytes()).digest(), dtype=np.uint8)
                for m in msgs
            ]
        )
        assert np.array_equal(got, want), f"mismatch at len {msg_len}"
    # trim variant
    got = native.sha256_many_native(msgs, trim_fr=True)
    assert (got[:, 31] & 0xC0 == 0).all()


def test_label_layer_matches_python(lib, rng_seed):
    """Native labeling must agree bit-exactly with the python loop."""
    import crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.proof as sp
    from crypto3_fil_proofs_tpu.models.porep.stacked.vanilla.graph import (
        StackedBucketGraph,
    )

    nodes = 64
    graph = StackedBucketGraph(nodes, 6, 8, bytes([2] * 32))
    tbl = graph.parents_all()
    base_tbl = tbl[:, :6].astype(np.int64)
    exp_tbl = tbl[:, 6:].astype(np.int64)
    replica_id = bytes([7] * 31 + [0x3F])

    def python_label(out, prev, layer, b, e):
        # run the pure-python fallback by disabling native
        import os

        os.environ["FIL_PROOFS_DISABLE_NATIVE"] = "1"
        native._tried = False
        native._lib = None
        try:
            sp._label_layer(out, prev, replica_id, layer, b, e)
        finally:
            del os.environ["FIL_PROOFS_DISABLE_NATIVE"]
            native._tried = False
            native._lib = None

    l1_py = np.empty((nodes, 32), dtype=np.uint8)
    python_label(l1_py, None, 1, base_tbl, None)
    l1_nat = np.empty((nodes, 32), dtype=np.uint8)
    assert native.label_layer_native(l1_nat, None, replica_id, 1, base_tbl, None)
    assert np.array_equal(l1_py, l1_nat)

    l2_py = np.empty((nodes, 32), dtype=np.uint8)
    python_label(l2_py, l1_py, 2, base_tbl, exp_tbl)
    l2_nat = np.empty((nodes, 32), dtype=np.uint8)
    assert native.label_layer_native(
        l2_nat, l1_nat, replica_id, 2, base_tbl, exp_tbl
    )
    assert np.array_equal(l2_py, l2_nat)


def test_native_labeling_throughput(lib):
    """Sanity perf: native should label >= 200k nodes/s on this host."""
    nodes = 1 << 15
    rng = np.random.default_rng(0)
    base_tbl = np.minimum(
        rng.integers(0, 1 << 14, size=(nodes, 6)), np.arange(nodes)[:, None]
    ).astype(np.uint32)
    out = np.empty((nodes, 32), dtype=np.uint8)
    t0 = time.perf_counter()
    assert native.label_layer_native(out, None, bytes(32), 1, base_tbl, None)
    rate = nodes / (time.perf_counter() - t0)
    assert rate > 200_000, f"native labeling too slow: {rate:.0f} nodes/s"
