"""Profiling helpers (the reference ships no tracing — SURVEY.md §5).

`trace` wraps ``jax.profiler`` so a training loop can be profiled with one
line; every model layer already runs under a ``jax.named_scope`` (see
``models.SequentialModel``), so per-layer device time shows up directly in
the captured trace (viewable with TensorBoard or Perfetto).

    from deepsphere_tpu.utils.profiling import trace
    with trace("/tmp/ds_trace"):
        trainer.train_on_batch(x, y)
"""

from __future__ import annotations

import contextlib
import time

import jax

from .._logger import logger

__all__ = ["trace", "timed_block"]


@contextlib.contextmanager
def trace(log_dir, host_tracer_level=2):
    """Capture a ``jax.profiler`` device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {log_dir}")


@contextlib.contextmanager
def timed_block(name, sync=None):
    """Wall-clock a block; pass an array (or pytree) factory as ``sync`` to
    block on device completion before stopping the clock."""
    t0 = time.time()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync() if callable(sync) else sync)
        logger.info(f"[timed] {name}: {(time.time() - t0) * 1e3:.2f} ms")
