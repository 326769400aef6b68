"""Operation timing spans (tracing/profiling parity).

Re-implements the reference's observability conventions: the
`measure_op(CommD, ...)` op-timer wrapper (reference api/seal.hpp:74)
and the `info!("x:start") / info!("x:finish")` span markers found in
every API function (api/seal.hpp:185,256,265,315; SURVEY §5). On TPU
the same spans can feed jax.profiler traces via TraceAnnotation.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("fil_proofs_tpu")

_MEASUREMENTS: dict[str, float] = {}


@contextlib.contextmanager
def measure_op(name: str):
    """Span timer: logs `<name>:start` / `<name>:finish` and records the
    wall time (readable via `measurements()`)."""
    logger.info("%s:start", name)
    t0 = time.perf_counter()
    try:
        with _maybe_trace(name):
            yield
    finally:
        dt = time.perf_counter() - t0
        _MEASUREMENTS[name] = dt
        logger.info("%s:finish (%.3fs)", name, dt)


@contextlib.contextmanager
def _maybe_trace(name: str):
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


def measurements() -> dict[str, float]:
    """Last recorded duration per span name."""
    return dict(_MEASUREMENTS)
