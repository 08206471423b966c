"""Poll-compute floor probe (serving frontier #2, BENCH_NOTES_r04.md).

The round-4 poll-phase profile pinned the 128-stream serving poll on a
~50 ms p50 "device compute" phase and attributed it to "launch overhead of
many small kernels" — an attribution, not a measurement. This probe
decomposes that 50 ms into INFRA FLOOR vs PROGRAM WORK, same-invocation and
epoch-interleaved so link weather hits every variant equally:

  real     the actual poll program (features outputs, f16 packing) at the
           profiled stream count — dispatch + block_until_ready, no host copy
  trivial  a same-signature jitted program doing ~zero work (one cast +
           broadcast to the same packed [N, C] output) — the per-execute
           floor of the tunnel/runtime at these shapes
  scale    the real program at SCALE x the streams — fixed cost vs linear

If trivial ~= real, the poll compute is the relay's per-execute floor and
fusion surgery inside the program cannot help (frontier closed). If
trivial << real, the gap is program work: the HLO instruction/fusion
counts printed alongside say whether it is many-small-kernels overhead.

    tools/tpu_run.sh /tmp/poll_floor.log tools/probe_poll_floor.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench_interleaved(fns, rounds, reps):
    """fns: {name: callable()} each dispatch+block; returns name -> list of
    per-call seconds, measured in interleaved rounds."""
    times = {k: [] for k in fns}
    for _ in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            times[name].append((time.perf_counter() - t0) / reps)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--scale", type=int, default=4,
                    help="stream multiple for the scaling variant")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--reps", type=int, default=4,
                    help="calls per round per variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import (
        GaborSet, SndEnvConfig, default_gabor_specs,
    )
    from auditory_tpu.pipeline.online import MultiStreamOnline
    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = 16000
    cfg = SndEnvConfig(
        gabor=GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )
    outs = ("mel_fbank_segment", "gabor_kwta", "step_valid")
    rng = np.random.default_rng(0)

    def build(n_streams):
        ms = MultiStreamOnline(cfg, sr, n_streams=n_streams, outputs=outs,
                               transfer_dtype=jnp.float16)
        fn, _layout = ms._build_fn()
        w = jnp.asarray(
            (0.1 * rng.standard_normal((n_streams, ms._span_poll)))
            .astype(ms._np_dtype)
        )
        lens = jnp.asarray(
            np.full(n_streams, ms._span_poll, np.int32)
        )
        packed = jax.block_until_ready(fn(w, lens))  # compile + warm
        return ms, fn, w, lens, packed

    n = args.streams
    ms, fn, w, lens, packed = build(n)
    c_cols = int(packed.shape[1])
    print(json.dumps({
        "probe": "shapes", "streams": n, "span": int(ms._span_poll),
        "packed_cols": c_cols, "packed_dtype": str(packed.dtype),
    }), flush=True)

    # compiled-program anatomy: instruction and fusion counts of the real
    # poll program (cache-hit recompile; counts the optimized HLO)
    txt = fn.lower(w, lens).compile().as_text()
    n_instr = sum(
        1 for line in txt.splitlines() if " = " in line
    )
    counts = {
        k: txt.count(k) for k in
        ("fusion(", "convolution(", "dot(", "custom-call(", "while(",
         "copy(", "all-reduce(")
    }
    print(json.dumps({
        "probe": "hlo", "instructions": n_instr, **{
            k.rstrip("("): v for k, v in counts.items()
        },
    }), flush=True)

    # trivial same-signature program: one cast + broadcast to [N, C] f16;
    # depends on both inputs so nothing constant-folds to a literal
    @jax.jit
    def trivial(windows, sig_lens):
        seed = (
            windows[:, :1].astype(jnp.float16)
            + sig_lens[:, None].astype(jnp.float16) * jnp.float16(0)
        )
        return jnp.broadcast_to(seed, (windows.shape[0], c_cols))

    jax.block_until_ready(trivial(w, lens))

    n2 = n * args.scale
    ms2, fn2, w2, lens2, _ = build(n2)

    variants = {
        "real": lambda: jax.block_until_ready(fn(w, lens)),
        "trivial": lambda: jax.block_until_ready(trivial(w, lens)),
        f"real_{n2}": lambda: jax.block_until_ready(fn2(w2, lens2)),
    }
    times = _bench_interleaved(variants, args.rounds, args.reps)
    for name, ts in times.items():
        ts_ms = np.asarray(ts) * 1e3
        print(json.dumps({
            "variant": name,
            "p50_ms": round(float(np.median(ts_ms)), 2),
            "min_ms": round(float(ts_ms.min()), 2),
            "max_ms": round(float(ts_ms.max()), 2),
            "rounds": args.rounds, "reps": args.reps,
        }), flush=True)

    real = float(np.median(np.asarray(times["real"])))
    triv = float(np.median(np.asarray(times["trivial"])))
    big = float(np.median(np.asarray(times[f"real_{n2}"])))
    print(json.dumps({
        "probe": "verdict",
        "floor_share": round(triv / real, 3),
        "scale_ratio": round(big / real, 3),
        "scale_factor": args.scale,
    }), flush=True)


if __name__ == "__main__":
    main()
