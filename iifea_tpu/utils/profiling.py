"""Profiling and tracing utilities.

Parity with the reference's observability surface (SURVEY.md §5):
* profile_separate (profile_utils.py:9-25): cProfile around a function,
  dumped per process (MPI rank -> jax.process_index);
* ad-hoc wall timers around extraction/solve phases
  (linear_elasticity.py:265-302) -> the ``timed`` context manager, which
  blocks on device work so phases are attributed correctly;
* device-side tracing -> ``device_trace`` wraps jax.profiler for TensorBoard
  traces of the compiled kernels.
"""
from __future__ import annotations

import contextlib
import cProfile
import pstats
import time
from functools import wraps

import jax


def profile_separate(filename: str | None = None):
    """Decorator: cProfile a function, dump '<filename>.<process>' per
    process, or print stats when no filename is given."""

    def deco(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            prof = cProfile.Profile()
            prof.enable()
            try:
                return fn(*args, **kwargs)
            finally:
                prof.disable()
                try:
                    rank = jax.process_index()
                except Exception:
                    rank = 0
                if filename:
                    prof.dump_stats(f"{filename}.{rank}")
                else:
                    pstats.Stats(prof).sort_stats("cumulative").print_stats(25)

        return wrapper

    return deco


class Timings(dict):
    def report(self) -> str:
        return "\n".join(f"{k}: {v:.4f}s" for k, v in self.items())


@contextlib.contextmanager
def timed(store: dict, key: str, sync: bool = True):
    """Wall-clock a phase; with sync=True, waits for in-flight device work
    first and blocks at the end so async dispatch doesn't skew attribution."""
    if sync:
        jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            jax.effects_barrier()
        store[key] = store.get(key, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace region (TensorBoard-viewable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
