"""Batched Poseidon permutation on TPU (JAX over 16-bit limb lanes).

TPU-native replacement for the reference's GPU batched column/tree
builders (reference: .../stacked/vanilla/proof.hpp:385-581 feeds
ColumnTreeBuilder/TreeBuilder batches of <=400k columns / <=700k leaves
to `BatcherType::GPU`; .../core/configuration.hpp:50-56). Here a whole
Merkle level / column batch is one `[batch, t, n_limbs]` tensor and the
permutation runs as vectorized limb arithmetic on the VPU, rounds
iterated with `lax.fori_loop` (single traced body, full+partial rounds
selected by a mask — no dynamic python control flow under jit).

Constants (Grain LFSR round constants, Cauchy MDS, neptune round
numbers and Merkle domain tag) come from ops/poseidon.py and are staged
once per arity into Montgomery limb form.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .fr_limbs import FR, fr_ops
from .poseidon import poseidon_constants

_N = FR.n  # 16 limbs


def _mod_sum(terms: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Tree-reduce mod-add along `axis` (keeps canonical form each step)."""
    size = terms.shape[axis]
    while size > 1:
        half = size // 2
        lo = jax.lax.slice_in_dim(terms, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(terms, half, 2 * half, axis=axis)
        s = fr_ops.add(lo, hi)
        if size % 2:
            rest = jax.lax.slice_in_dim(terms, 2 * half, size, axis=axis)
            s = jnp.concatenate([s, rest], axis=axis)
        terms = s
        size = terms.shape[axis]
    return jnp.squeeze(terms, axis=axis)


@lru_cache(maxsize=None)
def _staged_constants(arity: int):
    """(rc[rounds, t, n], mds[t, t, n], full_mask[rounds], domain_tag[n])."""
    c = poseidon_constants(arity)
    t, rounds = c.t, c.r_f + c.r_p
    # Pure-host staging (this runs at trace time under jit, so no jnp here).
    mont = lambda vals: FR.to_limbs([(v * FR.mont_r) % FR.modulus for v in vals])
    rc = mont(c.round_constants).reshape(rounds, t, _N)
    mds = mont([v for row in c.mds for v in row]).reshape(t, t, _N)
    half = c.r_f // 2
    full = np.zeros(rounds, dtype=bool)
    full[:half] = True
    full[rounds - half :] = True
    tag = mont([c.domain_tag])[0]
    # Plain numpy (jnp consumes it directly); caching jnp arrays created
    # at trace time would leak tracers through the lru_cache.
    return rc, mds, full, tag


def _permute(states: jnp.ndarray, rc, mds, full_mask) -> jnp.ndarray:
    """Poseidon permutation over [batch, t, n_limbs] Montgomery states."""
    t = states.shape[-2]
    rc, mds, full_mask = jnp.asarray(rc), jnp.asarray(mds), jnp.asarray(full_mask)
    elem0 = jnp.arange(t) == 0  # [t]

    def round_body(r, s):
        s = fr_ops.add(s, rc[r])
        x2 = fr_ops.mont_mul(s, s)
        x4 = fr_ops.mont_mul(x2, x2)
        x5 = fr_ops.mont_mul(x4, s)
        apply_sbox = full_mask[r] | elem0  # partial rounds: element 0 only
        s = jnp.where(apply_sbox[:, None], x5, s)
        # MDS mix: out[i] = sum_j mds[i, j] * s[j]
        prod = fr_ops.mont_mul(mds[None, :, :, :], s[:, None, :, :])
        return _mod_sum(prod, axis=2)

    return jax.lax.fori_loop(0, rc.shape[0], round_body, states)


@partial(jax.jit, static_argnames=("arity",))
def poseidon_hash_mont(preimages: jnp.ndarray, arity: int) -> jnp.ndarray:
    """Batch Poseidon: [batch, arity, n_limbs] Montgomery -> [batch, n_limbs].

    Merkle-tree domain tag in state[0]; digest = state[1] after one
    permutation (matches ops/poseidon.py `poseidon_hash`).
    """
    rc, mds, full_mask, tag = _staged_constants(arity)
    batch = preimages.shape[0]
    tag_col = jnp.broadcast_to(tag, (batch, 1, _N))
    states = jnp.concatenate([tag_col, preimages], axis=1)
    out = _permute(states, rc, mds, full_mask)
    return out[:, 1, :]


def hash_level_mont(nodes: jnp.ndarray, arity: int) -> jnp.ndarray:
    """[N, n_limbs] Montgomery nodes -> [N/arity, n_limbs] parents."""
    n = nodes.shape[0]
    assert n % arity == 0
    return poseidon_hash_mont(nodes.reshape(n // arity, arity, _N), arity)


# ---------------------------------------------------------------------------
# Byte-level entry points + Merkle backend
# ---------------------------------------------------------------------------


def bytes_to_mont(nodes_u8: np.ndarray) -> jnp.ndarray:
    """(N, 32) LE uint8 field elements -> Montgomery limb array on device."""
    limbs = FR.bytes_to_limbs(np.ascontiguousarray(nodes_u8))
    return fr_ops.to_mont(jnp.asarray(limbs))


def mont_to_bytes(limbs: jnp.ndarray) -> np.ndarray:
    return FR.limbs_to_bytes(np.asarray(fr_ops.from_mont(limbs)))


class JaxPoseidonBackend:
    """Merkle tree-hash backend running levels on the TPU.

    Drop-in for ops/tree_hash.PoseidonBackend: whole levels are hashed
    as one batched kernel launch instead of per-node host hashing.
    """

    name = "poseidon-jax"

    def hash_level(self, nodes: np.ndarray, arity: int) -> np.ndarray:
        mont = bytes_to_mont(nodes)
        return mont_to_bytes(hash_level_mont(mont, arity))

    def hash_single(self, children: list[bytes]) -> bytes:
        nodes = np.frombuffer(b"".join(children), dtype=np.uint8).reshape(-1, 32)
        return self.hash_level(nodes, len(children)).tobytes()


def register() -> None:
    from .tree_hash import register_backend

    register_backend("poseidon-jax", JaxPoseidonBackend())


register()
