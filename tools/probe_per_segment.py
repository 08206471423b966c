"""On-chip probe: per-segment uniform frontend vs the per-window gather
for off-grid builds (stride % step != 0, or prev_smooth > 0).

    tools/tpu_run.sh /tmp/ps.log tools/probe_per_segment.py \
        [--rate 22050] [--prev-smooth 0.0] [--batch 512] [--seconds 3]

Round-4 measured verdict (BENCH_NOTES_r04.md): the gather WINS at every
probed config (22.05 kHz exact: 11.95 ms vs per-segment conv 15.4 /
frames 15.9 / windowed 17.0; 16 kHz prev_smooth=0.3 exact: 9.1 vs 18.7)
-- hence SndEnv's segment_frontend='auto' keeps off-grid builds on the
gather. This script reproduces that comparison.
"""

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=22050)
    ap.add_argument("--prev-smooth", type=float, default=0.0)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import SndEnvConfig, clamp_mel_to_nyquist
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length
    from auditory_tpu.pipeline.sndenv import SndEnv
    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = args.rate
    cfg = SndEnvConfig()
    cfg = dataclasses.replace(
        cfg,
        dft=dataclasses.replace(cfg.dft, prev_smooth=args.prev_smooth),
        kwta=dataclasses.replace(cfg.kwta, on=False),
    )
    cfg = clamp_mel_to_nyquist(cfg, sr)
    outs = ("mel_fbank_segment", "step_valid")
    rng = np.random.default_rng(0)

    # per-segment rows pin the spectrum method (auto dispatch would pick
    # one); the gather baseline ignores the method label (same windows @
    # basis GEMM regardless), so one gather row per precision suffices
    rows = [("gather", "matmul"), ("per_segment", "conv"),
            ("per_segment", "frames"), ("per_segment", "windowed")]
    for prec in ("highest", "default"):
        for structure, method in rows:
            env = SndEnv(
                cfg, sr, dtype=jnp.float32, outputs=outs,
                matmul_precision=prec, spectrum_method=method,
                segment_frontend=structure,
            )
            benv = BatchedSndEnv(env)
            n = bucket_length(int(args.seconds * sr), env.timing)
            t = np.arange(n) / sr
            base = 0.1 * np.sin(2 * np.pi * 180 * t)
            signals = (
                base[None] + 0.02 * rng.standard_normal((args.batch, n))
            ).astype(np.float32)
            lengths = np.full(args.batch, n, np.int32)
            sd = jax.device_put(jnp.asarray(signals))
            ld = jax.device_put(jnp.asarray(lengths))
            fn = benv.process_fn(n, 0)
            for _ in range(3):
                out, _ = fn(sd, ld)
                jax.block_until_ready(out)
            tag = (f"{structure}_{prec}" if structure == "gather"
                   else f"{structure}_{method}_{prec}")
            if env._frontend_structure != structure:
                # e.g. per_segment rows on a commensurate grid with
                # prev_smooth=0: the build correctly stays on 'flat'
                print(json.dumps({
                    "variant": tag,
                    "skipped": f"build routed to {env._frontend_structure}",
                }), flush=True)
                continue
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out, _ = fn(sd, ld)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "variant": tag,
                "ms_per_batch": round(dt * 1e3, 3),
                "rtf": round(float(lengths.sum()) / sr / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
