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


_LIMB_MASK = jnp.uint32(0xFFFF)


def _soa_from_packed(s_flat: jnp.ndarray):
    """[batch, t, n] -> tuple of n [t, batch] limb arrays."""
    tr = jnp.swapaxes(s_flat, 0, 1)  # [t, batch, n]
    return tuple(tr[..., j] for j in range(s_flat.shape[-1]))


def _soa_to_packed(limbs) -> jnp.ndarray:
    return jnp.swapaxes(jnp.stack(limbs, axis=-1), 0, 1)


def _mds_bytes(mds: np.ndarray) -> np.ndarray:
    """[t, t, n] mont limb constants -> f32 [2n, t, t] byte planes."""
    t = mds.shape[0]
    out = np.zeros((2 * _N, t, t), dtype=np.float32)
    for a in range(_N):
        out[2 * a] = (mds[..., a] & 0xFF).astype(np.float32)
        out[2 * a + 1] = (mds[..., a] >> 8).astype(np.float32)
    return out


def _soa_sbox(e, field):
    from .fr_limbs import soa_mont_mul

    x2 = soa_mont_mul(e, e, field)
    x4 = soa_mont_mul(x2, x2, field)
    return soa_mont_mul(x4, e, field)


def _mxu_mix_and_reduce(elems, mds8):
    """MDS mix on the MXU + one Montgomery reduction per element.

    elems: tuple of n [t, batch] u32 limb arrays (Montgomery form).
    mds8:  f32 [2n, t, t] byte planes of the Montgomery MDS limbs.
    Full integer products accumulate exactly in f32 (<= 255^2 * t
    < 2^24); byte columns fold via padded shifts; a single interleaved
    REDC brings each mixed element back to 16 canonical limbs.
    """
    from .fr_limbs import FR as _FR

    import os

    t, batch = elems[0].shape
    nb = 2 * _N
    # state byte planes [nb, t, L]
    s8 = []
    for l in elems:
        s8.append((l & jnp.uint32(0xFF)).astype(jnp.float32))
        s8.append((l >> 8).astype(jnp.float32))
    s8 = jnp.stack(s8)
    if os.environ.get("FIL_PROOFS_POSEIDON_CONV") == "1":
        # 1-D conv form: byte column c of element i = sum_{a+b=c, j}
        # mds8[a, i, j] * s8[b, j] as cross-correlation with a
        # W-reversed kernel — contraction size t*nb fills the MXU
        # (the einsum form has K = t). Opt-in: XLA-CPU compiles the
        # conv form very slowly, so tests default to the einsum.
        lhs = jnp.transpose(s8, (2, 1, 0))  # [L, j, b]
        kernel = jnp.asarray(
            np.transpose(np.asarray(mds8)[::-1], (1, 2, 0))
        )  # [O=i, I=j, W=a (reversed)]
        cols = jax.lax.conv_general_dilated(
            lhs,
            kernel,
            window_strides=(1,),
            padding=[(nb - 1, nb - 1)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32,
            # TPU f32 contractions default to bf16 passes — exact
            # integer products require full f32 semantics
            precision=jax.lax.Precision.HIGHEST,
        )  # [L, i, 2nb-1]
        cols = jnp.transpose(cols, (2, 1, 0)).astype(jnp.int32)
    else:
        # out[a, b, i, L] = sum_j mds8[a, i, j] * s8[b, j, L]   (MXU)
        prod = jnp.einsum(
            "aij,bjL->abiL",
            jnp.asarray(mds8),
            s8,
            preferred_element_type=jnp.float32,
            # exact integer products need full f32 (TPU default is bf16)
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        padded = [
            jnp.pad(prod[a], ((a, nb - 1 - a), (0, 0), (0, 0)))
            for a in range(nb)
        ]
        cols = sum(padded)  # antidiagonal fold: column c = sum_{a+b=c}
    cols = cols.astype(jnp.uint32)
    # normalize bytes (values < 2^25 -> carries). The total mix value is
    # up to t*R^2 (~9R^2 < 2^516 for t=12), so the product spans up to
    # 65 bytes — emit 66 (33 16-bit columns) and keep every carry.
    bytes_n = []
    carry = jnp.zeros_like(cols[0])
    for c in range(2 * nb - 1):
        v = cols[c] + carry
        bytes_n.append(v & jnp.uint32(0xFF))
        carry = v >> 8
    bytes_n.append(carry & jnp.uint32(0xFF))
    bytes_n.append(carry >> 8)
    bytes_n.append(jnp.zeros_like(carry))
    n_cols = len(bytes_n) // 2  # nb + 1
    col16 = [
        bytes_n[2 * k] + (bytes_n[2 * k + 1] << 8) for k in range(n_cols)
    ]
    # interleaved REDC: 16 rounds eliminate the low half; result is
    # T/2^256 < t*R^2/2^256 + R < 6R — exact but up to 3 bits beyond
    # the 16-limb field, so carry a 17th limb through to the final
    # conditional subtracts of 4R/2R/R.
    n0inv = jnp.uint32(_FR.n0inv)
    p = [jnp.uint32(int(v)) for v in _FR.p_np]
    zero = jnp.zeros_like(col16[0])
    st = col16 + [zero]
    for _ in range(_N):
        m = (st[0] * n0inv) & _LIMB_MASK
        q = [m * pj for pj in p]
        nt = [st[0] + (q[0] & _LIMB_MASK)]
        for j in range(1, _N):
            nt.append(
                st[j] + (q[j] & _LIMB_MASK) + (q[j - 1] >> 16)
            )
        nt.append(st[_N] + (q[_N - 1] >> 16))
        nt.extend(st[_N + 1 :])
        carry = nt[0] >> 16
        st = [nt[1] + carry] + nt[2:] + [zero]
    from .fr_limbs import _soa_norm, _soa_sub_if_ge_wide

    out = _soa_norm(tuple(st[: _N + 2]), _N + 1, _FR)  # 17 limbs
    for mult in (4, 2, 1):
        out = _soa_sub_if_ge_wide(out, _FR.modulus * mult)
    return out[: _N]


def _permute_mxu(states: jnp.ndarray, rc, mds, full_mask) -> jnp.ndarray:
    """TPU permutation: struct-of-arrays [t, batch] limb planes (no
    concat churn), SoA Montgomery S-boxes, and the MDS mix as an exact
    f32 byte-plane einsum on the MXU + one Montgomery reduction per
    element (instead of t^2 scalar Montgomery multiplies). Measured
    2.9x the packed path on v5e; compiles slowly on XLA-CPU, hence the
    platform dispatch in `_permute`.
    """
    from .fr_limbs import FR as _FR
    from .fr_limbs import soa_add

    t = states.shape[-2]
    rc, full_mask = jnp.asarray(rc), jnp.asarray(full_mask)
    mds8 = _mds_bytes(np.asarray(mds))

    def round_body(r, s_flat):
        elems = _soa_from_packed(s_flat)  # tuple of n [t, batch]
        rc_r = rc[r]  # [t, n] traced
        elems = soa_add(
            elems, tuple(rc_r[:, j][:, None] for j in range(_N)), _FR
        )
        x5 = _soa_sbox(elems, _FR)
        # partial rounds: S-box on element 0 only
        elem0 = (jnp.arange(t) == 0)[:, None]
        apply = full_mask[r] | elem0
        elems = tuple(jnp.where(apply, a, b) for a, b in zip(x5, elems))
        mixed = _mxu_mix_and_reduce(elems, mds8)
        return _soa_to_packed(mixed)

    return jax.lax.fori_loop(0, rc.shape[0], round_body, states)


def _permute_packed(states: jnp.ndarray, rc, mds, full_mask) -> jnp.ndarray:
    """Reference batched permutation over the packed [batch, t, n]
    layout (fast XLA-CPU compiles; the CI-validated baseline)."""
    t = states.shape[-2]
    rc, mdsj, full_mask = (
        jnp.asarray(rc),
        jnp.asarray(np.asarray(mds)),
        jnp.asarray(full_mask),
    )
    elem0 = jnp.arange(t) == 0

    def round_body(r, s):
        s = fr_ops.add(s, rc[r])
        x2 = fr_ops.mont_mul(s, s)
        x4 = fr_ops.mont_mul(x2, x2)
        x5 = fr_ops.mont_mul(x4, s)
        apply_sbox = full_mask[r] | elem0
        s = jnp.where(apply_sbox[:, None], x5, s)
        prod = fr_ops.mont_mul(mdsj[None, :, :, :], s[:, None, :, :])
        return _mod_sum(prod, axis=2)

    return jax.lax.fori_loop(0, rc.shape[0], round_body, states)


def _use_mxu_permute() -> bool:
    """MXU permute on TPU (bit-exactness validated on-device at
    arities 2/8 across all rounds; 17.2k poseidon-8 hashes/s vs 6.25k
    packed on v5e). Packed elsewhere: XLA-CPU compiles the MXU program
    impractically slowly. Override with FIL_PROOFS_POSEIDON_MXU=0/1."""
    import os

    flag = os.environ.get("FIL_PROOFS_POSEIDON_MXU")
    if flag is not None:
        return flag == "1"
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _permute(states: jnp.ndarray, rc, mds, full_mask) -> jnp.ndarray:
    if _use_mxu_permute():
        return _permute_mxu(states, rc, mds, full_mask)
    return _permute_packed(states, rc, mds, full_mask)


@partial(jax.jit, static_argnames=("arity", "mxu"))
def _poseidon_hash_mont(preimages: jnp.ndarray, arity: int, mxu: bool):
    rc, mds, full_mask, tag = _staged_constants(arity)
    batch = preimages.shape[0]
    tag_col = jnp.broadcast_to(tag, (batch, 1, _N))
    states = jnp.concatenate([tag_col, preimages], axis=1)
    permute = _permute_mxu if mxu else _permute_packed
    out = permute(states, rc, mds, full_mask)
    return out[:, 1, :]


def poseidon_hash_mont(preimages: jnp.ndarray, arity: int) -> jnp.ndarray:
    """Batch Poseidon: [batch, arity, n_limbs] Montgomery -> [batch, n_limbs].

    Merkle-tree domain tag in state[0]; digest = state[1] after one
    permutation (matches ops/poseidon.py `poseidon_hash`). The
    permutation implementation dispatches per platform (MXU byte-plane
    mix on TPU, packed layout elsewhere; override with
    FIL_PROOFS_POSEIDON_MXU=0/1).
    """
    return _poseidon_hash_mont(preimages, arity, _use_mxu_permute())


def hash_level_mont(nodes: jnp.ndarray, arity: int) -> jnp.ndarray:
    """[N, n_limbs] Montgomery nodes -> [N/arity, n_limbs] parents."""
    n = nodes.shape[0]
    assert n % arity == 0
    return poseidon_hash_mont(nodes.reshape(n // arity, arity, _N), arity)


# ---------------------------------------------------------------------------
# Byte-level entry points + Merkle backend
# ---------------------------------------------------------------------------


# The Montgomery conversions MUST be jitted: eager dispatch traces the
# ~250-op CIOS chain as individual device calls, and over the remote
# TPU tunnel each eager op is a round trip — the 512 MiB PC2 spent an
# hour in to_mont/from_mont round trips for seconds of actual hashing.
# Transfers move packed uint16 limbs (32 B/element, the wire-minimal
# form); widening to the uint32 compute lanes happens on device.
@jax.jit
def _u16_to_mont(limbs_u16: jnp.ndarray) -> jnp.ndarray:
    return fr_ops.to_mont(limbs_u16.astype(jnp.uint32))


@jax.jit
def _mont_to_u16(limbs: jnp.ndarray) -> jnp.ndarray:
    return fr_ops.from_mont(limbs).astype(jnp.uint16)


def bytes_to_mont(nodes_u8: np.ndarray) -> jnp.ndarray:
    """(N, 32) LE uint8 field elements -> Montgomery limb array on device."""
    u16 = np.ascontiguousarray(nodes_u8).view("<u2")
    return _u16_to_mont(jnp.asarray(u16))


def mont_to_bytes(limbs: jnp.ndarray) -> np.ndarray:
    u16 = np.asarray(_mont_to_u16(limbs))
    return np.ascontiguousarray(u16).view(np.uint8).reshape(
        *limbs.shape[:-1], FR.n * 2
    )


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


class PallasPoseidonBackend:
    """Merkle backend over the fused Pallas permutation kernel
    (ops/pallas/poseidon.py): whole levels hashed with the state
    resident in VMEM — measured 632k poseidon-8/s on v5e vs 17.2k for
    the XLA path. Levels are chunked at max_tpu_tree_batch_size
    (reference GPU batch limits, configuration.hpp:50-56)."""

    name = "poseidon-pallas"

    # fixed chunk (in parent hashes) + pow2-padded tail: every level of
    # every tree reuses one of ~10 compiled programs per arity instead
    # of compiling per level size (PC2 at 8 MiB was ~275 s of tunnel
    # compiles for ~1 s of hashing)
    CHUNK = 1 << 17

    def hash_level(self, nodes: np.ndarray, arity: int) -> np.ndarray:
        from .pallas.poseidon import POS_BLOCK, hash_level_packed

        batch = nodes.shape[0] // arity
        out = []
        lo = 0
        while lo < batch:
            take = min(self.CHUNK, batch - lo)
            if take < self.CHUNK:
                # pad the tail up to a power-of-two program size
                padded = max(POS_BLOCK, 1 << (take - 1).bit_length())
                seg = np.zeros((padded * arity, 32), np.uint8)
                seg[: take * arity] = nodes[
                    lo * arity : (lo + take) * arity
                ]
                mont = bytes_to_mont(seg)
                out.append(
                    mont_to_bytes(hash_level_packed(mont, arity))[:take]
                )
            else:
                mont = bytes_to_mont(
                    nodes[lo * arity : (lo + take) * arity]
                )
                out.append(mont_to_bytes(hash_level_packed(mont, arity)))
            lo += take
        return out[0] if len(out) == 1 else np.concatenate(out)

    def hash_single(self, children: list[bytes]) -> bytes:
        nodes = np.frombuffer(b"".join(children), dtype=np.uint8).reshape(-1, 32)
        return self.hash_level(nodes, len(children)).tobytes()


def register() -> None:
    from .tree_hash import register_backend

    register_backend("poseidon-jax", JaxPoseidonBackend())
    register_backend("poseidon-pallas", PallasPoseidonBackend())


register()
