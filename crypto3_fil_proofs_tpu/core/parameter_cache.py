"""Groth16 parameter disk cache (v28 naming, reference parity).

Re-implements reference core/parameter_cache.hpp:50-223: parameters and
verifying keys cached under `FIL_PROOFS_PARAMETER_CACHE` (default
/var/tmp/filecoin-proof-parameters) as `v28-<id>.params` / `.vk` /
`.meta`, keyed by the circuit's cache identifier. Our storage format is
npz (numpy limb arrays for the device-ready query tables + compressed
curve points) instead of the reference's crypto3-marshalling blobs —
the naming/layout contract on disk is preserved.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from ..zk import groth16
from .settings import settings

VERSION = 28
SRS_MAX_PROOFS_TO_AGGREGATE = 65535  # reference parameter_cache.hpp


def parameter_cache_dir() -> str:
    d = settings().parameter_cache
    os.makedirs(d, exist_ok=True)
    return d


def cache_identifier(prefix: str) -> str:
    """v28-<sha256(prefix)[:32]> (reference cache_identifier semantics)."""
    h = hashlib.sha256(prefix.encode()).hexdigest()[:32]
    return f"v{VERSION}-{h}"


def params_path(prefix: str) -> str:
    return os.path.join(parameter_cache_dir(), cache_identifier(prefix) + ".params")


def vk_path(prefix: str) -> str:
    return os.path.join(parameter_cache_dir(), cache_identifier(prefix) + ".vk")


def meta_path(prefix: str) -> str:
    return os.path.join(parameter_cache_dir(), cache_identifier(prefix) + ".meta")


def _save_pk(path: str, pk: groth16.ProvingKey) -> None:
    payload = dict(pk.vk.to_npz_dict())
    payload.update(
        beta_g1=np.frombuffer(
            groth16.g1_to_compressed(pk.beta_g1), dtype=np.uint8
        ),
        delta_g1=np.frombuffer(
            groth16.g1_to_compressed(pk.delta_g1), dtype=np.uint8
        ),
        log_n=np.int64(pk.log_n),
    )
    for name, query in (
        ("a_query", pk.a_query),
        ("b_g1_query", pk.b_g1_query),
        ("h_query", pk.h_query),
        ("l_query", pk.l_query),
    ):
        px, py, valid = query
        payload[f"{name}_x"] = px
        payload[f"{name}_y"] = py
        payload[f"{name}_valid"] = valid
    ((x0, x1), (y0, y1)), valid = pk.b_g2_query
    payload["b_g2_x0"] = x0
    payload["b_g2_x1"] = x1
    payload["b_g2_y0"] = y0
    payload["b_g2_y1"] = y1
    payload["b_g2_valid"] = valid
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def _load_pk(path: str) -> groth16.ProvingKey:
    with np.load(path) as d:
        vk = groth16.VerifyingKey.from_npz_dict(d)
        queries = {}
        for name in ("a_query", "b_g1_query", "h_query", "l_query"):
            queries[name] = (
                d[f"{name}_x"], d[f"{name}_y"], d[f"{name}_valid"]
            )
        b_g2 = (
            ((d["b_g2_x0"], d["b_g2_x1"]), (d["b_g2_y0"], d["b_g2_y1"])),
            d["b_g2_valid"],
        )
        return groth16.ProvingKey(
            vk=vk,
            beta_g1=groth16.g1_from_compressed(bytes(d["beta_g1"])),
            delta_g1=groth16.g1_from_compressed(bytes(d["delta_g1"])),
            a_query=queries["a_query"],
            b_g1_query=queries["b_g1_query"],
            b_g2_query=b_g2,
            h_query=queries["h_query"],
            l_query=queries["l_query"],
            log_n=int(d["log_n"]),
        )


def _save_vk(path: str, vk: groth16.VerifyingKey) -> None:
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **vk.to_npz_dict())
    os.replace(tmp, path)


def _load_vk(path: str) -> groth16.VerifyingKey:
    with np.load(path) as d:
        return groth16.VerifyingKey.from_npz_dict(d)


def get_groth_params(
    prefix: str, blank_circuit_fn, seed: bytes | None = None
) -> groth16.ProvingKey:
    """Load cached params for the circuit identity or generate+cache
    (reference cacheable_parameters::get_groth_params)."""
    path = params_path(prefix)
    if os.path.exists(path):
        return _load_pk(path)
    cs = blank_circuit_fn()
    pk = groth16.setup(cs, seed=seed or prefix.encode())
    _save_pk(path, pk)
    _save_vk(vk_path(prefix), pk.vk)
    with open(meta_path(prefix), "w") as f:
        json.dump(
            {
                "prefix": prefix,
                "version": VERSION,
                "num_constraints": cs.num_constraints,
                "num_inputs": cs.num_inputs,
            },
            f,
        )
    return pk


def get_verifying_key(
    prefix: str, blank_circuit_fn, seed: bytes | None = None
) -> groth16.VerifyingKey:
    path = vk_path(prefix)
    if os.path.exists(path):
        return _load_vk(path)
    return get_groth_params(prefix, blank_circuit_fn, seed=seed).vk
