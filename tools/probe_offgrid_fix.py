"""Off-grid fix probe: gather-free span->windows formulations vs the
production per-window gather, epoch-interleaved in ONE invocation.

probe_offgrid_gather.py measured the 22.05 kHz take-along gather at
~90 GB/s -- 11% of HBM peak -- so the gather is LOWERING-bound, not
bandwidth-bound, and a gather-free restructuring has real headroom:
the windows tensor costs ~474 MB of true traffic (~1.2 ms at achievable
bandwidth) versus the gather's 10.6 ms.

Variants (identical math, f32-roundoff-tight):

  fused          gather + dense GEMM (production, the baseline)
  span_windows   segment spans via shifted reshapes (dsp.dft.segment_spans,
                 NO gather) -> windows as J=3 concatenated shifted views
                 -> ONE dense pad(551) GEMM
  span_frames    same spans -> J=3 shifted partial GEMMs (no windows
                 materialization, 3*pad(221)=768 padded contraction)

Round 4 measured the per-segment restructuring 1.3-2.1x SLOWER *through
the pipeline* (BENCH_NOTES_r04.md); this probe isolates the bare
formulations to decide whether that loss was the formulation's or the
pipeline plumbing's.

    tools/tpu_run.sh /tmp/ogfix.log tools/probe_offgrid_fix.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=22050)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import SndEnvConfig, clamp_mel_to_nyquist
    from auditory_tpu.dsp.dft import (
        _materialize_windows,
        _step_frames,
        power_spectrum,
        segment_spans,
    )
    from auditory_tpu.dsp.frame import extract_windows, window_starts
    from auditory_tpu.pipeline.batch import bucket_length
    from auditory_tpu.pipeline.sndenv import SndEnv
    from auditory_tpu.utils.cache import enable_compilation_cache
    from auditory_tpu.utils.canary import d2h_canary, make_canary_buffer

    enable_compilation_cache()
    sr = args.rate
    prec = args.precision
    cfg = clamp_mel_to_nyquist(SndEnvConfig(), sr)
    import dataclasses

    cfg = dataclasses.replace(cfg, kwta=dataclasses.replace(cfg.kwta, on=False))
    env = SndEnv(
        cfg, sr, dtype=jnp.float32,
        outputs=("mel_fbank_segment", "step_valid"),
        matmul_precision=prec,
    )
    t = env.timing
    n = bucket_length(int(args.seconds * sr), t)
    seg_cnt = env.seg_cnt(n)
    w, step, steps = t.win_samples, t.step_samples, t.segment_steps
    offs = np.asarray(t.step_offsets)
    off0 = int(offs[0])
    span = int(offs[-1] - offs[0]) + w
    jb = max(1, -(-w // step))
    rng = np.random.default_rng(0)
    sig = (0.1 * rng.standard_normal((args.batch, n))).astype(np.float32)
    sd = jax.device_put(jnp.asarray(sig))
    starts = jnp.asarray(window_starts(t, seg_cnt))
    basis = tuple(jnp.asarray(b, dtype=jnp.float32) for b in env.dft_basis)

    print(json.dumps({
        "probe": "geometry", "rate": sr, "win": w, "step": step,
        "stride": t.stride_samples, "segments": seg_cnt, "steps": steps,
        "span": span, "j_blocks": jb, "precision": prec,
    }), flush=True)

    # the reference's break-on-overrun mask (sndenv.go:353-359): a window
    # whose END overruns the signal is zeroed ENTIRELY. extract_windows
    # applies it inside; the span formulations apply the same host-known
    # mask to their power output (a zero window's power is zero, so
    # masking after the GEMM is equivalent)
    starts_np = np.asarray(window_starts(t, seg_cnt))
    valid_np = (starts_np + w) <= n  # [seg, steps]
    valid = jnp.asarray(valid_np)[None, :, :, None]

    def fused_fn(s):
        return power_spectrum(
            extract_windows(s, starts, w)[0], "matmul", basis, precision=prec
        )

    def span_windows_fn(s):
        spans = segment_spans(s, t.stride_samples, span, off0, seg_cnt)
        flat = spans.reshape(-1, span)  # [B*seg, span]
        fr = _step_frames(flat, step, 0, steps, jb)
        wnd = _materialize_windows(fr, steps, jb, w)  # [B*seg, steps, W]
        p = power_spectrum(wnd, "matmul", basis, precision=prec)
        return p.reshape(s.shape[0], seg_cnt, steps, -1) * valid

    def span_frames_fn(s):
        spans = segment_spans(s, t.stride_samples, span, off0, seg_cnt)
        flat = spans.reshape(-1, span)
        fr = _step_frames(flat, step, 0, steps, jb)
        kernel = jnp.concatenate(basis, axis=1)  # [W, 2K]
        acc = None
        for j in range(jb):
            bj = kernel[j * step : min((j + 1) * step, w)]
            fj = fr[:, j : j + steps, : bj.shape[0]]
            term = jnp.matmul(fj, bj, precision=prec,
                              preferred_element_type=s.dtype)
            acc = term if acc is None else acc + term
        k = basis[0].shape[1]
        re, im = acc[..., :k], acc[..., k:]
        p = re * re + im * im
        return p.reshape(s.shape[0], seg_cnt, steps, -1) * valid

    fns = {
        "fused": jax.jit(fused_fn),
        "span_windows": jax.jit(span_windows_fn),
        "span_frames": jax.jit(span_frames_fn),
    }
    ref = None
    for name, f in fns.items():
        out = jax.block_until_ready(f(sd))
        if ref is None:
            ref = np.asarray(out[:2])
        else:
            scale = float(np.abs(ref).max())
            dev = float(np.abs(np.asarray(out[:2]) - ref).max()) / scale
            print(json.dumps({"parity": name, "rel_dev": dev}), flush=True)
            # f32-roundoff-tight gate (measured: span_windows 0.0,
            # span_frames 2.4e-7 -- one reassociation level)
            assert dev < 1e-6, (name, dev)

    def timer(call, reps=args.reps):
        def run():
            out = None
            for _ in range(reps):
                out = call(sd)
            jax.block_until_ready(out)
        return run

    variants = {name: timer(f) for name, f in fns.items()}
    canary_buf = make_canary_buffer(jnp, jax.device_put)
    d2h_canary(canary_buf)
    times = {name: [] for name in variants}
    canaries = []
    for _ in range(args.rounds):
        canaries.append(d2h_canary(canary_buf))
        for name, call in variants.items():
            t0 = time.perf_counter()
            call()
            times[name].append((time.perf_counter() - t0) / args.reps)
    base = np.asarray(times["fused"])
    for name, ts in times.items():
        ms = np.asarray(ts) * 1e3
        rec = {
            "variant": name,
            "ms_per_batch": round(float(np.median(ms)), 3),
            "min_ms": round(float(ms.min()), 3),
        }
        if name != "fused":
            deltas = (base - ts) / ts  # >0: variant faster than fused
            rec["paired_speedup_vs_fused_pct"] = round(
                float(np.median(deltas)) * 100, 1
            )
            rec["wins"] = f"{int((deltas > 0).sum())}/{len(deltas)}"
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "canary_p50_ms": round(float(np.median(canaries)) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
