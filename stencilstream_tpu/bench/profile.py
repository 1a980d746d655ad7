"""Profiler hooks: ``jax.profiler`` trace capture.

The TPU analog of the reference's offline profiling pipeline — AOCL
``profile.json`` Gantt rendering (``scripts/gantt_of_profile.jl:16-37``) and
Nsight Compute metric extraction (``scripts/benchmark-common.jl:229-282``).
Captured traces open in Perfetto/TensorBoard and expose per-kernel walltime,
HBM traffic, and overlap — the same questions the reference tooling answers.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stencilstream-trace"):
    """Capture a profiler trace of the enclosed block::

        with bench.profile.trace("/tmp/trace"):
            update(grid).block_until_ready()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (``jax.profiler.TraceAnnotation``) for host-side
    phases, e.g. the pass loop of a driver."""
    import jax

    return jax.profiler.TraceAnnotation(name)
