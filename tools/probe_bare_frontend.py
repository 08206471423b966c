"""Bare-frontend probe: is the small-geometry gap conv lowering or SndEnv
machinery?

probe_exec_floor.py ruled out dispatch overhead; bench_stages.py ruled out
output writes (power_only > mel_only). What remains at 8 kHz (measured
~3.4 ms mel-only vs a 0.61 ms tile-padded floor) is either (a) the strided
conv lowering itself at small scale, or (b) the pipeline machinery around
it (segment reshape, step-validity masks, length clamps, log floors). This
probe times, same-invocation:

  bare_conv    jit(power_spectrum_conv) alone on the same [B, S] signal,
               emitting the same [B, n_win, K] f32 power tensor
  full_power   the SndEnv power_only program (machinery + same output)

at 8 and 16 kHz. bare ~= full -> the conv lowering owns the gap (the
16 kHz lowering-slack class, nothing to fix without beating XLA's conv);
bare << full -> the machinery is the 8 kHz story.

    tools/tpu_run.sh /tmp/bare.log tools/probe_bare_frontend.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import SndEnvConfig, clamp_mel_to_nyquist
    from auditory_tpu.dsp.dft import power_spectrum_conv
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length
    from auditory_tpu.pipeline.sndenv import SndEnv
    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    variants = {}

    for sr in (8000, 16000):
        cfg = clamp_mel_to_nyquist(SndEnvConfig(), sr)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, kwta=dataclasses.replace(cfg.kwta, on=False)
        )
        outs = ("power_segment", "step_valid")
        env = SndEnv(cfg, sr, dtype=jnp.float32, outputs=outs,
                     spectrum_method="conv")
        t = env.timing
        n = bucket_length(int(args.seconds * sr), env.timing)
        sig = (0.1 * rng.standard_normal((args.batch, n))).astype(np.float32)
        sd = jax.device_put(jnp.asarray(sig))
        ld = jax.device_put(jnp.asarray(np.full(args.batch, n, np.int32)))

        benv = BatchedSndEnv(env)
        full = benv.process_fn(n, 0)
        jax.block_until_ready(full(sd, ld)[0].power_segment)

        basis = tuple(
            jnp.asarray(b, dtype=jnp.float32) for b in env.dft_basis
        )
        n_win = (n - t.win_samples) // t.step_samples + 1

        def bare_fn(s, basis=basis, step=t.step_samples, nw=n_win):
            return power_spectrum_conv(s, basis, step, 0, nw,
                                       precision="highest")

        bare = jax.jit(bare_fn)
        p = jax.block_until_ready(bare(sd))
        print(json.dumps({
            "probe": "shapes", "rate": sr, "bare_out": list(p.shape),
            "n_windows_bare": int(n_win),
            "win": t.win_samples, "step": t.step_samples,
        }), flush=True)

        # each variant runs `reps` PIPELINED dispatches and blocks once:
        # a per-call block would re-add the ~36 ms completion RTT
        # (probe_poll_floor.py) and swamp the program time being compared
        def run_bare(b=bare, s=sd, reps=args.reps):
            out = None
            for _ in range(reps):
                out = b(s)
            jax.block_until_ready(out)

        def run_full(f=full, s=sd, l=ld, reps=args.reps):
            out = None
            for _ in range(reps):
                out = f(s, l)[0].power_segment
            jax.block_until_ready(out)

        variants[f"bare_conv_{sr}"] = run_bare
        variants[f"full_power_{sr}"] = run_full

    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, call in variants.items():
            t0 = time.perf_counter()
            call()
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
