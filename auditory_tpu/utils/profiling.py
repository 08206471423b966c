"""Tracing / observability utilities (SURVEY.md section 5 equivalents).

The reference's only instrumentation is a MemStats printer
(sound/sndenv.go:535-545) and GUI tensor grids. Here:

- :func:`trace` -- named profiler spans (show up in a `jax.profiler` trace /
  Perfetto when capturing)
- :class:`StepTimer` -- wall-clock + RTF accounting for batch steps
- :func:`capture_trace` -- context manager around jax.profiler.trace for
  dumping a TensorBoard-loadable trace directory
- :func:`debug_nans` -- scoped jax_debug_nans toggle for dev runs
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Iterator

import jax

__all__ = ["trace", "capture_trace", "debug_nans", "StepTimer", "memory_stats"]


def memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory usage in MiB (analog of sound.PrintMemUsage,
    sndenv.go:535-545, but for device HBM)."""
    out: Dict[str, Dict[str, float]] = {}
    for d in jax.devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            k: round(v / (1024 * 1024), 2)
            for k, v in stats.items()
            if isinstance(v, (int, float)) and "bytes" in k
        }
    return out


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Named span visible in device/host profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace into ``log_dir`` (TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped jax_debug_nans (dev-mode NaN checking; the production pipeline
    *expects* NaN mel weights, so leave this off for real configs unless you
    know your mel design is NaN-free)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@dataclass
class StepTimer:
    """Accumulates per-step wall time and audio-seconds for RTF reporting."""

    sample_rate: int
    steps: int = 0
    wall_seconds: float = 0.0
    audio_seconds: float = 0.0

    @contextlib.contextmanager
    def step(self, n_audio_samples: int) -> Iterator[None]:
        t0 = time.perf_counter()
        ok = False
        try:
            yield
            ok = True
        finally:
            # count the WALL time even when the step raises (e.g. a flaky
            # remote compile) -- dropping it would inflate RTF -- but count
            # the AUDIO only on success: a caught-and-retried failure would
            # otherwise count the same audio twice while processing it once
            dt = time.perf_counter() - t0
            self.steps += 1
            self.wall_seconds += dt
            if ok:
                self.audio_seconds += n_audio_samples / self.sample_rate

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def report(self) -> Dict[str, float]:
        return {
            "steps": self.steps,
            "wall_seconds": round(self.wall_seconds, 4),
            "audio_seconds": round(self.audio_seconds, 3),
            "rtf": round(self.rtf, 1),
        }
