"""Profiling and timing utilities.

The reference embeds its performance knowledge in comments and a standalone
benchmark binary (SURVEY.md section 5); here profiling is first-class:

- `trace(dir)`: context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
- `Timer`: wall-clock stage timer with a report string, used by bench.py
  and the benchmark CLI.
- `device_sync(x)`: force completion of a device computation in a way that
  works on runtimes where `block_until_ready` returns before execution
  finishes (observed on tunneled single-chip setups): materializes a tiny
  slice on the host.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace around the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Force completion (and a host round-trip) of a device array."""
    np.asarray(x.reshape(-1)[:8])


def enable_persistent_cache(path=None) -> None:
    """Turn on the persistent compile cache via the config API.

    The JAX_COMPILATION_CACHE_DIR env var is read once at jax import; on
    hosts where a sitecustomize pre-imports jax (this harness), setting it
    in-process is silently too late and every program recompiles each run.
    The config API applies at any time before the first compile.
    """
    import pathlib

    import jax
    if path is None:
        path = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


class Timer:
    """Accumulating stage timer: `with timer("stage"): ...`."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + \
                time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"  {k}: {v*1000:.1f} ms ({100*v/total:.0f}%)"
                 for k, v in self.stages.items()]
        return "\n".join(lines + [f"  total: {total*1000:.1f} ms"])
