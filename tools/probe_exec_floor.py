"""Throughput-mode per-execute floor probe (8 kHz / 16 kHz frontier).

probe_poll_floor.py showed a BLOCKING call pays ~36 ms of relay completion
RTT regardless of work. The bench numbers run pipelined (N dispatches, one
block), which hides that RTT — but a *device-side* per-execute overhead
would still serialize on the device timeline and show up as a fixed charge
per bench iteration. The 8 kHz frontend (2.65 ms measured vs 0.61 ms
tile-padded floor) and the 16 kHz conv (4.59 vs 2.44) both carry ~2 ms of
unexplained gap; this probe measures whether a trivial program costs that
much per call in steady-state pipelined dispatch:

  tiny    [8, 128] f32 in -> [8, 128] out, one add
  big_in  the headline's [512, 48000] input (device-resident) -> [512, 128]
  big_out [512, 48000] in -> [512, 300, 128] f32 out (~19.6 MB, mel-scale)

If these run in ~0.2 ms, there is no device-side per-execute floor and the
dense frontends' residue is genuine program time (lowering slack stays the
verdict). If ~2 ms, the 8/16 kHz gaps are largely fixed per-execute cost
and the dense paths are already AT the practical floor.

    tools/tpu_run.sh /tmp/exec_floor.log tools/probe_exec_floor.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--reps", type=int, default=30,
                    help="pipelined dispatches per timed window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    tiny = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    big = jnp.asarray(
        rng.standard_normal((512, 48000)).astype(np.float32)
    )

    @jax.jit
    def f_tiny(x):
        return x + jnp.float32(1)

    @jax.jit
    def f_big_in(x):
        # touches one lane column of the big input; no reduction over it
        return x[:, :128] + jnp.float32(1)

    @jax.jit
    def f_big_out(x):
        seed = x[:, :128] + jnp.float32(1)   # [512, 128]
        return jnp.broadcast_to(seed[:, None, :], (512, 300, 128)) * seed[0, 0]

    variants = {
        "tiny": (f_tiny, tiny),
        "big_in": (f_big_in, big),
        "big_out": (f_big_out, big),
    }
    for _, (f, x) in variants.items():
        jax.block_until_ready(f(x))  # compile + warm

    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, (f, x) in variants.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = f(x)
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / args.reps)

    for name, ts in times.items():
        ms = np.asarray(ts) * 1e3
        print(json.dumps({
            "variant": name,
            "steady_ms_per_call": round(float(np.median(ms)), 3),
            "min_ms": round(float(ms.min()), 3),
            "max_ms": round(float(ms.max()), 3),
            "rounds": args.rounds, "reps": args.reps,
        }), flush=True)


if __name__ == "__main__":
    main()
