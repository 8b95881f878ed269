"""Tracing/profiling (SURVEY.md §5): jax.profiler traces with named scopes
per pipeline stage, and audio-sec/s counters (metrics.RtfMeter)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope for pipeline stages (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)


def annotate_fn(name: str):
    """Decorator: wrap a function in a named trace scope."""

    def deco(fn):
        def wrapper(*a, **k):
            with scope(name):
                return fn(*a, **k)

        return wrapper

    return deco
