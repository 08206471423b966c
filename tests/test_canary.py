"""Link-health canary classification (utils/canary.py) + bench.py wiring.

VERDICT r3 #7: bench captures must tag depressed-relay episodes at
measurement time. The classifier is pure, so the depressed regimes are
simulated here; the real probe runs inside bench.py on the device link.
"""

import json
import os
import subprocess
import sys

import numpy as np

from auditory_tpu.utils.canary import (
    CANARY_BYTES, classify_link, d2h_canary, make_canary_buffer,
)


def test_healthy_link_is_ok():
    # 256 KiB in ~10-25 ms == 10-25 MB/s: the relay's measured good-day band
    assert classify_link([0.012, 0.018, 0.010, 0.025, 0.015]) == "ok"


def test_sustained_low_bandwidth_is_depressed():
    # median ~0.3 s for 256 KiB == ~0.9 MB/s, the documented bad-day regime
    assert classify_link([0.30, 0.28, 0.35, 0.31, 0.29]) == "depressed"


def test_single_multisecond_stall_is_depressed():
    # healthy median but one relay freeze: the run's spread is polluted,
    # the artifact must say so even though the median looks fine
    assert classify_link([0.012, 0.015, 2.4, 0.013, 0.011]) == "depressed"


def test_boundary_bandwidth():
    # exactly the 2.5 MB/s floor (256 KiB / 0.1049 s) classifies depressed;
    # comfortably above it classifies ok
    floor_s = (CANARY_BYTES / 1e6) / 2.5
    assert classify_link([floor_s * 1.01] * 5) == "depressed"
    assert classify_link([floor_s * 0.5] * 5) == "ok"


def test_empty_and_degenerate_samples():
    assert classify_link([]) == "ok"  # no data: don't invent a verdict
    assert classify_link([0.0]) == "ok"  # infinitely fast copy is healthy


def test_d2h_canary_measures_real_copy():
    import jax
    import jax.numpy as jnp

    buf = make_canary_buffer(jnp, jax.device_put)
    assert buf.nbytes == CANARY_BYTES
    dt = d2h_canary(buf)
    assert dt > 0.0
    # CPU-local copy: trivially healthy; also pins the [s] unit (a ms/us
    # confusion would classify every run depressed or none ever)
    assert classify_link([dt] * 3) == "ok"


def test_bench_json_carries_canary_fields():
    """bench.py's ONE JSON line must be self-describing: precision tier,
    spread, and link regime (VERDICT r3 #1/#7). Run tiny on CPU."""
    env = dict(os.environ, AUDITORY_TPU_CPU="1")
    out = subprocess.run(
        [sys.executable, "bench.py", "--batch", "2", "--seconds", "0.3",
         "--iters", "1", "--warmup", "1", "--repeats", "2"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["precision"] == "highest"
    assert rec["regime"] in ("ok", "depressed")
    assert rec["repeats"] == 2
    assert rec["canary_d2h_ms"] >= 0.0
    assert rec["min"] <= rec["value"] <= rec["max"]
