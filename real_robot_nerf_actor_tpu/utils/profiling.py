"""Profiling helpers: named XLA trace scopes + block_until_ready step timers.

TPU analog of the reference's torch.autograd.profiler.record_function scopes
(neural_rendering.py:236, models_embed.py:306, resnetfc.py:56,153):
jax.named_scope tags show up in the XLA/perfetto trace under the same cut
points ("renderer_composite", "model_inference", "resnetfc_infer", ...).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def named_scope(name: str):
    """Trace annotation context manager (jax.named_scope passthrough)."""
    return jax.named_scope(name)


class StepTimer:
    """Wall-clock step timer that forces device completion.

    with StepTimer() as t: ... ; t.seconds
    """

    def __init__(self, sync_on: Optional[object] = None):
        self._sync_on = sync_on
        self.seconds = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_on is not None:
            jax.block_until_ready(self._sync_on)
        self.seconds = time.perf_counter() - self._start
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
