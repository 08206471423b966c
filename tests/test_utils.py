"""Utility coverage: profiling spans/timer, memory stats, compile cache."""

import os

import jax
import jax.numpy as jnp

from auditory_tpu.utils.cache import enable_compilation_cache
from auditory_tpu.utils.profiling import StepTimer, memory_stats, trace


def test_trace_and_timer():
    timer = StepTimer(sample_rate=16000)
    with trace("stage"):
        with timer.step(16000):
            jnp.ones(8).block_until_ready()
    rep = timer.report()
    assert rep["steps"] == 1
    assert rep["audio_seconds"] == 1.0
    assert timer.rtf > 0


def test_memory_stats_keys():
    stats = memory_stats()
    assert len(stats) == jax.device_count()


def test_compilation_cache(tmp_path):
    d = enable_compilation_cache(str(tmp_path / "xla"))
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    f = jax.jit(lambda x: x * 3 + 1)
    assert float(f(jnp.asarray(2.0))) == 7.0
