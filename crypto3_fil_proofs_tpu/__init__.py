"""crypto3-fil-proofs-tpu: TPU-native Filecoin proving framework.

JAX/XLA/Pallas re-design of the reference C++ stack
(NilFoundation/crypto3-fil-proofs): storage-proofs core (Merkle engine,
DRG graphs, fr32), SDR PoRep + PoSt protocols, Groth16 prover with
Pippenger MSM / NTT kernels, and the filecoin-proofs API layer.
"""
from __future__ import annotations

import os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    The limb-arithmetic kernels (MSM, Poseidon, NTT) produce large XLA
    programs whose first compile is minutes; the persistent cache makes
    every later process load them in milliseconds. Opt out with
    FIL_PROOFS_JAX_CACHE=0.
    """
    if os.environ.get("FIL_PROOFS_JAX_CACHE", "1") == "0":
        return
    cache_dir = os.environ.get(
        "FIL_PROOFS_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache", "jax"),
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_enable_xla_caches", "all"
        )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
