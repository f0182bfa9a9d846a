"""Observability: step timing, compile logging, profiler traces, debug checks.

≙ SURVEY.md §5.1/§5.3 rebuild plan. The reference's instrumentation is
`print` + a module-level logfile (`utils.py:12-13`) and DEBUG-flag NaN
scrubbing (`proposals_tf.py:202-209`); here it is a first-class module:

- :class:`StepTimer` — wall-clock per-step timing with compile-time
  separation (first call is compile+run).
- :func:`trace` — context manager around `jax.profiler` producing
  Perfetto-compatible traces.
- :func:`check_finite` / :func:`check_boxes` — jit-compatible invariant
  checks via `jax.debug` (enabled by flag, zero cost when off).
- :class:`MetricLogger` — scalar metric accumulation + jsonl emission.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


class StepTimer:
    """Tracks per-step wall time, separating the compile step."""

    def __init__(self):
        self.compile_time: Optional[float] = None
        self.step_times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.compile_time is None:
            self.compile_time = dt
        else:
            self.step_times.append(dt)

    @property
    def mean_step(self) -> float:
        return sum(self.step_times) / max(len(self.step_times), 1)

    def summary(self) -> Dict[str, float]:
        return {
            "compile_s": self.compile_time or 0.0,
            "mean_step_s": self.mean_step,
            "steps": len(self.step_times),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# --- debug-mode invariant checks (≙ the reference's DEBUG NaN handling) ----

_DEBUG_CHECKS = False


def enable_debug_checks(on: bool = True):
    """Globally toggle in-graph invariant checks (off → zero overhead)."""
    global _DEBUG_CHECKS
    _DEBUG_CHECKS = on


def check_finite(x, name: str):
    """In-jit NaN/Inf check; prints through jax.debug when enabled."""
    if not _DEBUG_CHECKS:
        return x
    bad = jnp.sum(~jnp.isfinite(x))
    jax.debug.print(
        "[check_finite] {name}: {bad} non-finite of {n}",
        name=name, bad=bad, n=x.size,
    )
    return x


def check_boxes(boxes, name: str):
    """Validate (y1, x1, y2, x2) ordering and [0, 1] range when enabled."""
    if not _DEBUG_CHECKS:
        return boxes
    bad_order = jnp.sum(
        (boxes[..., 2] < boxes[..., 0]) | (boxes[..., 3] < boxes[..., 1])
    )
    oob = jnp.sum((boxes < -1e-3) | (boxes > 1 + 1e-3))
    jax.debug.print(
        "[check_boxes] {name}: {bo} inverted, {ob} out-of-range",
        name=name, bo=bad_order, ob=oob,
    )
    return boxes


class MetricLogger:
    """Accumulates scalar metrics; optionally appends jsonl to a file."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history: List[Dict[str, Any]] = []

    def log(self, step: int, **metrics):
        row = {"step": step}
        row.update(
            {
                k: float(v) if hasattr(v, "__float__") else v
                for k, v in metrics.items()
            }
        )
        self.history.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
        return row

    def latest(self) -> Dict[str, Any]:
        return self.history[-1] if self.history else {}


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Persist XLA compilations across processes (bench/serve cold starts).

    On the TPU relay a cold COCO-scale compile costs ~5 min (BENCH_r02 tail:
    316.7 s); with the cache a second process deserializes the executable
    instead of recompiling. Default directory: <repo>/artifacts/xla_cache.
    Call before the first jit execution.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts",
            "xla_cache",
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
