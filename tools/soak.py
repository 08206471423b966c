"""Extended randomized parity soak (not part of CI; run ad hoc).

Samples N random valid configurations (geometry, rates, mel banks, gabor
banks, delta modes) and asserts end-to-end oracle parity for each:

    python tools/soak.py [n_seeds] [seed_base]

Round-1 record: 443 random configurations, zero failures.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import tone
from tests.test_fuzz_parity import config_is_runnable, sample_cfg
from tests.test_pipeline_parity import assert_segments_match


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 710000
    ok = fail = skip = 0
    for seed in range(n):
        rng = np.random.default_rng(base + seed)
        cfg, sr = sample_cfg(rng)
        if not config_is_runnable(cfg, sr):
            skip += 1
            continue
        try:
            t = cfg.params.derive(sr)
            dur = (t.segment_samples + 2 * t.stride_samples + 171) / sr
            f0 = float(rng.uniform(200, min(3500, sr / 2 - 500)))
            sig = tone(f0, dur, sr)
            # signal-family sampling (matches the targeted parity tests'
            # diversity: noise hits no-harmonic spectra, part-silence hits
            # the ==0 -> LogMin floors, two-tone hits intermodulation bins)
            kind = rng.random()
            if kind < 0.2:
                # draw from the per-seed rng so different seed BASES get
                # different noise realizations at equal loop indices
                sig = rng.normal(scale=0.2, size=len(sig))
            elif kind < 0.35:
                sig = sig.copy()
                sig[: len(sig) // 3] = 0.0
            elif kind < 0.5:
                sig = sig + tone(
                    float(rng.uniform(200, min(3500, sr / 2 - 500))),
                    dur, sr, amp=0.2)
            env = SndEnv(cfg, sr, dtype=jnp.float64)
            # sample the spectrum frontend (and, off-grid, occasionally the
            # per-segment restructuring) so the soak exercises every
            # uniform-GEMM formulation against the oracle, not just fft
            method = str(rng.choice(
                ["fft", "matmul", "conv", "frames", "windowed", "sliced"]
            ))
            env_kw = {}
            if rng.random() < 0.25 and method != "fft":
                env_kw["segment_frontend"] = "per_segment"
            assert_segments_match(cfg, env.pad(sig), sr,
                                  spectrum_method=method, **env_kw)
            ok += 1
        except Exception as e:  # noqa: BLE001
            fail += 1
            print(f"FAIL seed={seed} sr={sr}: {type(e).__name__}: {e}")
            print(f"  cfg={cfg}")
        if (seed + 1) % 25 == 0:
            print(f"progress {seed + 1}/{n} ok={ok} fail={fail} skip={skip}",
                  flush=True)
    print(f"DONE ok={ok} fail={fail} skip={skip}")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
