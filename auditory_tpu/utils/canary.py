"""Link-health canary for benchmark runs over the tunneled TPU relay.

The relay's device->host path is weather-dependent (historically ~10-30
MB/s healthy, with occasional multi-second stalls and whole depressed
episodes -- e.g. the 22.05 kHz rate-sweep row that first measured 69k and
re-measured 99k on a healthy day). A benchmark captured during a depressed
episode silently understates the machine. The canary makes the link state
part of the artifact: a fixed-size device->host copy timed alongside every
measurement, classified into an explicit ``regime`` field, so a reader of
the JSON line alone can tell a slow program from a slow link.

No reference analog (the Go pipeline is host-local); this certifies the
measurement environment, not the computation.
"""

from __future__ import annotations

import time
from typing import List, Sequence

import numpy as np

__all__ = ["d2h_canary", "classify_link", "CANARY_BYTES"]

# small enough to not perturb the run, large enough that per-copy latency
# (~ms) doesn't swamp the bandwidth signal on a healthy link
CANARY_BYTES = 256 * 1024

# healthy floor: the relay's D2H has measured 10-30 MB/s on good days;
# below 2.5 MB/s (100 ms for 256 KiB) the link is in a depressed episode
_MIN_HEALTHY_MBPS = 2.5
# any single copy stalling past this is a relay stall regardless of median
_STALL_SECONDS = 1.0


def make_canary_buffer(jnp_module, device_put):
    """A fixed f32 device buffer of CANARY_BYTES for d2h_canary."""
    n = CANARY_BYTES // 4
    return device_put(jnp_module.arange(n, dtype=jnp_module.float32))


def d2h_canary(buf) -> float:
    """Time ONE device->host copy of ``buf`` (seconds). Uses np.asarray --
    the same synchronous copy path the corpus/serving pipelines use (NOT
    copy_to_host_async, which is pathologically slow on this backend)."""
    t0 = time.perf_counter()
    np.asarray(buf)
    return time.perf_counter() - t0


def classify_link(samples_s: Sequence[float],
                  n_bytes: int = CANARY_BYTES) -> str:
    """'ok' or 'depressed' from canary copy times.

    Depressed when the median bandwidth is below the healthy floor OR any
    sample stalled: both failure modes observed on this relay (sustained
    low-bandwidth episodes, and isolated multi-second freezes that inflate
    one repeat of an otherwise-healthy run).
    """
    s = [float(x) for x in samples_s]
    if not s:
        return "ok"
    med = float(np.median(s))
    mbps = (n_bytes / 1e6) / med if med > 0 else float("inf")
    if mbps < _MIN_HEALTHY_MBPS or max(s) > _STALL_SECONDS:
        return "depressed"
    return "ok"
