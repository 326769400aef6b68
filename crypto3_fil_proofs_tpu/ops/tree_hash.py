"""Batched tree-hash backends shared by the Merkle engine.

The Merkle engine hashes whole levels at a time — (N, 32)-byte node
arrays in, (N/arity, 32) out — so a backend can be the host reference
(here) or the batched JAX/Pallas kernel (ops/poseidon_jax.py,
ops/sha256_jax.py) selected via settings().use_tpu_tree_builder. This is
the TPU-native replacement for the reference's per-node `process_layer`
loops and GPU batch builders (reference: core/merkle/merkle.hpp:205-250,
stacked/vanilla/proof.hpp:385-581).
"""
from __future__ import annotations

import hashlib

import numpy as np

from .poseidon import poseidon_hash

NODE_SIZE = 32


def _nodes_to_ints(nodes: np.ndarray) -> list[int]:
    b = np.ascontiguousarray(nodes, dtype=np.uint8).tobytes()
    return [int.from_bytes(b[i : i + 32], "little") for i in range(0, len(b), 32)]


def _ints_to_nodes(values: list[int]) -> np.ndarray:
    out = np.empty((len(values), NODE_SIZE), dtype=np.uint8)
    for i, v in enumerate(values):
        out[i] = np.frombuffer(v.to_bytes(32, "little"), dtype=np.uint8)
    return out


class PoseidonBackend:
    """Host Poseidon level hashing (golden path; JAX kernel mirrors it)."""

    name = "poseidon"

    def hash_level(self, nodes: np.ndarray, arity: int) -> np.ndarray:
        assert nodes.shape[0] % arity == 0
        ints = _nodes_to_ints(nodes)
        out = [
            poseidon_hash(ints[i : i + arity], arity)
            for i in range(0, len(ints), arity)
        ]
        return _ints_to_nodes(out)

    def hash_single(self, children: list[bytes]) -> bytes:
        ints = [int.from_bytes(c, "little") for c in children]
        return poseidon_hash(ints, len(ints)).to_bytes(32, "little")


class Sha256Backend:
    """Binary SHA-256 tree hashing with Fr trim (tree_d / piece trees).

    Matches rust-fil-proofs Sha256 hasher node semantics: digest of the
    concatenated children, last byte masked &0x3F so the node is a valid
    Fr element (reference label/commit trimming, create_label.hpp:77).
    """

    name = "sha256"

    def hash_level(self, nodes: np.ndarray, arity: int) -> np.ndarray:
        assert nodes.shape[0] % arity == 0
        from .native import sha256_many_native

        msgs = np.ascontiguousarray(nodes, dtype=np.uint8).reshape(
            nodes.shape[0] // arity, arity * NODE_SIZE
        )
        native = sha256_many_native(msgs, trim_fr=True)
        if native is not None:
            return native
        raw = msgs.tobytes()
        chunk = arity * NODE_SIZE
        out = np.empty((nodes.shape[0] // arity, NODE_SIZE), dtype=np.uint8)
        for i in range(out.shape[0]):
            d = bytearray(hashlib.sha256(raw[i * chunk : (i + 1) * chunk]).digest())
            d[31] &= 0x3F
            out[i] = np.frombuffer(bytes(d), dtype=np.uint8)
        return out

    def hash_single(self, children: list[bytes]) -> bytes:
        d = bytearray(hashlib.sha256(b"".join(children)).digest())
        d[31] &= 0x3F
        return bytes(d)


_BACKENDS = {"poseidon": PoseidonBackend(), "sha256": Sha256Backend()}


def _accelerator_available() -> bool:
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def get_backend(name: str):
    """Resolve a tree-hash backend. "poseidon" dispatches to the fused
    Pallas level builder on TPU when use_tpu_tree_builder is set (the
    reference's GPU tree/column builder switch, configuration.hpp:50-56);
    the host path remains the golden reference and the CPU-CI default."""
    if name == "poseidon" and "poseidon-pallas" not in _BACKENDS:
        # the accelerated backends self-register on import; consumers
        # that never imported ops.poseidon_jax (standalone seal/PoSt
        # entry points) must still get them — the silent host-python
        # fallback hashed a 512MiB tree_c at ~3k hashes/s
        try:
            from . import poseidon_jax  # noqa: F401
        except Exception:
            pass
    if name == "pedersen" and name not in _BACKENDS:
        # legacy hasher (reference pedersen.hpp is an empty stub;
        # implemented over Jubjub in ops/pedersen.py) — lazy so the
        # generator derivation never taxes the hot paths
        from .pedersen import PedersenBackend

        _BACKENDS[name] = PedersenBackend()
    if name == "poseidon" and "poseidon-pallas" in _BACKENDS:
        from ..core.settings import settings

        if settings().use_tpu_tree_builder and _accelerator_available():
            return _BACKENDS["poseidon-pallas"]
        # no accelerator: stay on the host path — the XLA level hasher
        # measured 74 h/s WARM on XLA:CPU (40x SLOWER than the ~3k h/s
        # host python; it is a TPU program). CPU-only sealing is a
        # correctness/RSS surface, not a performance one.
    return _BACKENDS[name]


def register_backend(name: str, backend) -> None:
    """Register an accelerated backend (e.g. the JAX tree builder)."""
    _BACKENDS[name] = backend
