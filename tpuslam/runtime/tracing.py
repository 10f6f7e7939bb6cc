"""Profiling hooks: jax.profiler traces + named host-side stage annotations.

Replaces the reference's printf-observability (SURVEY.md §5.1). Usage:

    with trace_session("/tmp/slam-trace"):
        with stage("keyframe"):
            perform_keyframe(...)

Traces open in TensorBoard / Perfetto; `stage` also works standalone as a
lightweight host annotation when no trace session is active.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["trace_session", "stage", "annotate_fn"]


@contextmanager
def trace_session(logdir: str):
    """Capture a device+host profile for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def stage(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def annotate_fn(name: str):
    """Decorator: annotate a function as a named profiler region."""
    def deco(fn):
        def wrapped(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)
        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped
    return deco
