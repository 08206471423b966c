"""Gabor-stage lowering probe: strided conv vs static-patch GEMM.

The gabor grid is tiny (default 8x2 positions of 9x9 patches over a
[32, 14] mel segment) — a shape class where conv lowerings carry large
fixed overhead relative to the ~0.1 ms of padded-GEMM work. This probe
times dsp.gabor.convolve(method='conv'|'gemm') at both precision tiers,
same-invocation, on the headline's gabor input scale, and checks
equivalence on-chip first.

    tools/tpu_run.sh /tmp/gabor.log tools/probe_gabor.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--segments", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import GaborSet, default_gabor_specs
    from auditory_tpu.dsp.design import gabor_filters
    from auditory_tpu.dsp.gabor import convolve
    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    gset = GaborSet(size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
                    specs=default_gabor_specs(phases=(0.0, 1.5708)))
    filts = jnp.asarray(gabor_filters(gset), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (args.batch, args.segments, 32, 14)
    ).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))

    fns = {}
    for method in ("conv", "gemm"):
        for prec in ("highest", "default"):
            fns[f"{method}_{prec}"] = jax.jit(
                lambda m, method=method, prec=prec: convolve(
                    m, filts, gset, precision=prec, method=method
                )
            )
    outs = {k: jax.block_until_ready(f(xd)) for k, f in fns.items()}
    dev = float(jnp.abs(outs["conv_highest"] - outs["gemm_highest"]).max())
    peak = float(jnp.abs(outs["conv_highest"]).max())
    print(json.dumps({
        "probe": "equivalence", "max_abs_dev": dev,
        "rel_to_peak": round(dev / peak, 9), "out_shape": list(
            outs["conv_highest"].shape
        ),
    }), flush=True)

    times = {k: [] for k in fns}
    for _ in range(args.rounds):
        for name, f in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = f(xd)
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / args.reps)
    for name, ts in times.items():
        ms = np.asarray(ts) * 1e3
        print(json.dumps({
            "variant": name,
            "ms_per_batch": round(float(np.median(ms)), 3),
            "min_ms": round(float(ms.min()), 3),
            "max_ms": round(float(ms.max()), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
