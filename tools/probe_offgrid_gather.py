"""Off-grid (22.05 kHz) roofline closure: attribute the gather path's gap.

The 22.05 kHz reference geometry (win 551, step 221 from Go's ms rounding,
sndenv.go:202-207; stride 2205 with 2205 % 221 != 0) admits no global
shared-window grid, so the production frontend is the per-window take-along
GATHER (dsp/frame.py::extract_windows) + dense DFT GEMM. Round 4 left it
the last unattributed roofline residue: 11.95 ms measured vs a ~4.6 ms
floor that charged the gather at the ideal HBM word rate. This probe
separates the terms, same-invocation interleaved (the repo's pairing rule):

  gather_alone   jit(extract_windows) -> [B, seg, steps, W] materialized
                 (measures the gather's own achieved bandwidth)
  gemm_on_mat    jit(power GEMM) on a device-resident windows tensor
                 (the contraction alone, gather excluded)
  fused          jit(gather + GEMM) (the production formulation)
  full_mel       the SndEnv mel program (ties to the BENCH_NOTES reading)

Readout: if fused ~= gather_alone + gemm_on_mat, the path is two serial
phases and the honest floor is gemm_floor + gather_bytes / measured gather
bandwidth -- the residue is then the gather's achieved-vs-ideal bandwidth
ratio, a hardware characteristic of windowed take-along gathers, not
recoverable by reformulation (per-segment/sliced/factored all measured
slower, BENCH_NOTES_r04.md).

    tools/tpu_run.sh /tmp/og.log tools/probe_offgrid_gather.py
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
    from auditory_tpu.dsp.dft import _pad128, power_spectrum
    from auditory_tpu.dsp.frame import extract_windows, window_starts
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length
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
    assert t.stride_samples % t.step_samples != 0, (
        "geometry is on-grid; this probe targets the off-grid gather path"
    )
    n = bucket_length(int(args.seconds * sr), t)
    seg_cnt = env.seg_cnt(n)
    starts_np = window_starts(t, seg_cnt)
    rng = np.random.default_rng(0)
    sig = (0.1 * rng.standard_normal((args.batch, n))).astype(np.float32)
    sd = jax.device_put(jnp.asarray(sig))
    ld = jax.device_put(jnp.asarray(np.full(args.batch, n, np.int32)))
    starts = jnp.asarray(starts_np)
    w = t.win_samples
    k = t.n_bins
    basis = tuple(jnp.asarray(b, dtype=jnp.float32) for b in env.dft_basis)

    nw_total = args.batch * seg_cnt * t.segment_steps
    win_words = nw_total * w
    print(json.dumps({
        "probe": "geometry", "rate": sr, "win": w, "step": t.step_samples,
        "stride": t.stride_samples, "segments": seg_cnt,
        "steps_per_seg": t.segment_steps, "batch": args.batch,
        "windows_total": nw_total, "precision": prec,
        "windows_tensor_mb": round(win_words * 4 / 1e6, 1),
    }), flush=True)

    gather = jax.jit(lambda s: extract_windows(s, starts, w)[0])
    windows_dev = jax.block_until_ready(gather(sd))  # resident input for (b)

    gemm = jax.jit(
        lambda wnd: power_spectrum(wnd, "matmul", basis, precision=prec)
    )
    jax.block_until_ready(gemm(windows_dev))

    fused = jax.jit(
        lambda s: power_spectrum(
            extract_windows(s, starts, w)[0], "matmul", basis, precision=prec
        )
    )
    jax.block_until_ready(fused(sd))

    full = BatchedSndEnv(env).process_fn(n, 0)
    jax.block_until_ready(full(sd, ld)[0].mel_fbank_segment)

    def timer(call, reps=args.reps):
        def run():
            out = None
            for _ in range(reps):
                out = call()
            jax.block_until_ready(out)
        return run

    variants = {
        "gather_alone": timer(lambda: gather(sd)),
        "gemm_on_mat": timer(lambda: gemm(windows_dev)),
        "fused": timer(lambda: fused(sd)),
        "full_mel": timer(lambda: full(sd, ld)[0].mel_fbank_segment),
    }
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
    med = {}
    for name, ts in times.items():
        ms = np.asarray(ts) * 1e3
        med[name] = float(np.median(ms))
        print(json.dumps({
            "variant": name, "ms_per_batch": round(med[name], 3),
            "min_ms": round(float(ms.min()), 3),
            "max_ms": round(float(ms.max()), 3),
        }), flush=True)

    # attribution: achieved gather bandwidth (read once + write once) and
    # the serial-phase decomposition
    gb_s = 2.0 * win_words * 4 / (med["gather_alone"] * 1e-3) / 1e9
    macs = nw_total * _pad128(w) * _pad128(2 * k)
    gemm_floor_ms = macs / 16.5e12 * 1e3  # exact-f32 MXU rate (roofline.py)
    resid_floor = med["gather_alone"] + max(
        gemm_floor_ms, (win_words + nw_total * k) * 4 / 819e9 * 1e3
    )
    print(json.dumps({
        "probe": "attribution",
        "gather_achieved_gb_s": round(gb_s, 1),
        "hbm_peak_gb_s": 819,
        "gather_bw_frac": round(gb_s / 819, 3),
        "sum_phases_ms": round(med["gather_alone"] + med["gemm_on_mat"], 3),
        "fused_ms": round(med["fused"], 3),
        "serial_ratio": round(
            med["fused"] / (med["gather_alone"] + med["gemm_on_mat"]), 3
        ),
        "gemm_tilepad_floor_ms": round(gemm_floor_ms, 3),
        "gather_inclusive_floor_ms": round(resid_floor, 3),
        "full_mel_vs_floor": round(med["full_mel"] / resid_floor, 2),
        "canary_p50_ms": round(float(np.median(canaries)) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
