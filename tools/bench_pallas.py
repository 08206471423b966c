"""Frontend shoot-out on the current backend: the XLA strided-conv path at
each precision tier vs the fused Pallas kernel at each manual-emulation pass
count (ops/framefft.py), mel-only outputs so the frontend dominates.

    tools/tpu_run.sh /tmp/pallas.log tools/bench_pallas.py [--batch N]

Prints one JSON line per variant with ms/batch and RTF. The interesting
comparisons (VERDICT r2 next-round #1):
  conv_highest  the production exact-f32 headline (XLA 6-pass emulation)
  pallas_6      the kernel's manual 6-pass -- same grade, fused, no 245 MB
                coefficient tensor
  conv_high / pallas_3   the ~2^-16 middle grade
  conv_default / pallas_1  native bf16-operand dots (fast floor)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block", type=int, default=None,
                    help="pallas block_windows (M = block/period rows per "
                    "residue matmul; default 64 -> M=16, 512 -> M=128)")
    ap.add_argument("--rate", type=int, default=16000,
                    help="sample rate; pallas variants auto-skip when the "
                    "step's residue period exceeds the block (e.g. 44100)")
    ap.add_argument("--win-ms", type=float, default=25.0,
                    help="window length (off-family dispatch-rule probes)")
    ap.add_argument("--step-ms", type=float, default=10.0,
                    help="step (must divide the 100 ms segment)")
    ap.add_argument("--only", default=None,
                    help="comma list of variant-name substrings to keep "
                    "(e.g. 'sliced,conv_highest'): bounds TPU compile time "
                    "for focused probes")
    ap.add_argument("--factored-splits", default=None,
                    help="comma list of N1xN2 splits to probe as extra "
                    "exact-tier factored rows (e.g. 75x16,24x50): validates "
                    "the plan cost model's split ranking on real hardware")
    ap.add_argument("--interleave", type=int, default=0,
                    help="epoch-interleaved mode: N epochs, each timing every "
                    "selected variant once (--iters reps each), reported as "
                    "per-epoch medians + pairwise epoch-paired deltas. Use "
                    "for near-tied variants (<~2x): sequential one-invocation "
                    "blocks cannot resolve ~1.1x deltas on this link "
                    "(BENCH_NOTES_r04 hygiene corollary)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from auditory_tpu.config import SndEnvConfig, clamp_mel_to_nyquist
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length
    from auditory_tpu.pipeline.sndenv import SndEnv
    from auditory_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sr = args.rate
    cfg = SndEnvConfig()  # no gabor/kwta needed for the frontend race
    if (args.win_ms, args.step_ms) != (25.0, 10.0):
        cfg = dataclasses.replace(
            cfg, params=dataclasses.replace(
                cfg.params, win_ms=args.win_ms, step_ms=args.step_ms,
            )
        )
    cfg = dataclasses.replace(
        cfg, kwta=dataclasses.replace(cfg.kwta, on=False)
    )
    cfg = clamp_mel_to_nyquist(cfg, sr)
    outs = ("mel_fbank_segment", "step_valid")

    # spectrum_method is pinned explicitly per row: the production default
    # ('matmul') auto-dispatches conv-vs-frames by stride alignment and
    # window size, which would silently run frames under a conv label
    variants = [
        ("conv_highest", dict(spectrum_method="conv",
                              matmul_precision="highest")),
        ("conv_high", dict(spectrum_method="conv", matmul_precision="high")),
        ("conv_default", dict(spectrum_method="conv",
                              matmul_precision="default")),
        ("frames_highest", dict(spectrum_method="frames",
                                matmul_precision="highest")),
        ("frames_high", dict(spectrum_method="frames",
                             matmul_precision="high")),
        ("frames_default", dict(spectrum_method="frames",
                                matmul_precision="default")),
        ("windowed_highest", dict(spectrum_method="windowed",
                                  matmul_precision="highest")),
        ("windowed_high", dict(spectrum_method="windowed",
                               matmul_precision="high")),
        ("windowed_default", dict(spectrum_method="windowed",
                                  matmul_precision="default")),
        ("sliced_highest", dict(spectrum_method="sliced",
                                matmul_precision="highest")),
        ("sliced_high", dict(spectrum_method="sliced",
                             matmul_precision="high")),
        ("sliced_default", dict(spectrum_method="sliced",
                                matmul_precision="default")),
        ("factored_highest", dict(spectrum_method="factored",
                                  matmul_precision="highest")),
        ("factored_high", dict(spectrum_method="factored",
                               matmul_precision="high")),
        ("factored_default", dict(spectrum_method="factored",
                                  matmul_precision="default")),
        ("pallas_6", dict(use_pallas=True, pallas_passes=6)),
        ("pallas_3", dict(use_pallas=True, pallas_passes=3)),
        ("pallas_1", dict(use_pallas=True, pallas_passes=1)),
        # mask-and-tile kernel (ops/framefft.py PALLAS_MODES 'masked'):
        # ONE full-M matmul per block, no residue grouping, odd strides ok
        ("pallasm_6", dict(use_pallas=True, pallas_passes=6,
                           pallas_mode="masked")),
        ("pallasm_3", dict(use_pallas=True, pallas_passes=3,
                           pallas_mode="masked")),
        ("pallasm_1", dict(use_pallas=True, pallas_passes=1,
                           pallas_mode="masked")),
        # merged kernel: masked + fused re|im basis (ONE dot per limb
        # product against the [chunk, 2*k_pad] cos|sin operand -- the XLA
        # conv's per-pass GEMM shape)
        ("pallasf_6", dict(use_pallas=True, pallas_passes=6,
                           pallas_mode="merged")),
        ("pallasf_3", dict(use_pallas=True, pallas_passes=3,
                           pallas_mode="merged")),
        ("pallasf_1", dict(use_pallas=True, pallas_passes=1,
                           pallas_mode="merged")),
    ]
    if args.block:
        variants = [
            (f"{n}_blk{args.block}", dict(kw, pallas_block=args.block))
            if n.startswith("pallas") else (n, kw)
            for n, kw in variants
        ]

    from auditory_tpu.ops.framefft import supported_geometry

    t = cfg.params.derive(sr)
    # coarse pre-filter at passes=1 (smallest VMEM footprint): drop pallas
    # rows only when even that cannot run; the per-variant _pallas_active
    # check below handles pass counts whose larger limb tensors don't fit.
    # grouped and masked gate independently (masked supports odd strides)
    if not supported_geometry(t.step_samples, max_block=args.block or 64,
                              win=t.win_samples, passes=1, mode="grouped"):
        print(json.dumps({"skipped": "grouped pallas variants: geometry "
                          "unsupported (residue period/VMEM)",
                          "step": t.step_samples}))
        variants = [v for v in variants if not v[0].startswith("pallas_")]
    if not supported_geometry(t.step_samples, max_block=args.block or 64,
                              win=t.win_samples, passes=1, mode="masked"):
        print(json.dumps({"skipped": "masked pallas variants: geometry "
                          "unsupported (VMEM)", "step": t.step_samples}))
        variants = [v for v in variants
                    if not v[0].startswith(("pallasm_", "pallasf_"))]

    from auditory_tpu.dsp.dft import factored_dft_plan

    if factored_dft_plan(t.win_samples, t.step_samples,
                         allow_dominated=True) is None:
        print(json.dumps({"skipped": "factored variants: no N1*N2 split",
                          "win": t.win_samples, "step": t.step_samples}))
        variants = [v for v in variants if not v[0].startswith("factored")]

    if args.factored_splits:
        from auditory_tpu.dsp.dft import FactoredDFTPlan

        for spec in args.factored_splits.split(","):
            n1, n2 = (int(x) for x in spec.lower().split("x"))
            if n1 * n2 != t.win_samples:
                print(json.dumps({"skipped": f"split {spec}: N1*N2 != win",
                                  "win": t.win_samples}))
                continue
            plan = FactoredDFTPlan(t.win_samples, t.step_samples, n1, n2)
            variants.append((
                f"factored_highest_{n1}x{n2}",
                dict(spectrum_method="factored",
                     matmul_precision="highest",
                     _factored_plan_override=plan),
            ))

    if args.only:
        keys = [k.strip() for k in args.only.split(",") if k.strip()]
        variants = [v for v in variants if any(k in v[0] for k in keys)]

    rng = np.random.default_rng(0)
    prepared = []  # (name, fn, sd, ld, total_samples)
    for name, kw in variants:
        kw = dict(kw)
        plan_override = kw.pop("_factored_plan_override", None)
        if plan_override is not None:
            # build on 'frames' (same basis) then switch: SndEnv's own
            # __init__ would refuse geometries the cost model rejects,
            # but probing exactly those splits is this flag's purpose
            kw["spectrum_method"] = "frames"
        env = SndEnv(cfg, sr, dtype=jnp.float32, outputs=outs, **kw)
        if plan_override is not None:
            env.spectrum_method = "factored"
            env.factored_plan = plan_override  # probe a non-model split
        benv = BatchedSndEnv(env)
        n = bucket_length(int(args.seconds * sr), env.timing)
        t = np.arange(n) / sr
        base = (0.1 * np.sin(2 * np.pi * 180 * t)
                + 0.05 * np.sin(2 * np.pi * 1200 * t))
        signals = (
            base[None, :] + 0.02 * rng.standard_normal((args.batch, n))
        ).astype(np.float32)
        lengths = np.full(args.batch, n, np.int32)
        sd = jax.device_put(jnp.asarray(signals))
        ld = jax.device_put(jnp.asarray(lengths))
        fn = benv.process_fn(n, 0)
        for _ in range(3):
            out, _ = fn(sd, ld)
            jax.block_until_ready(out)
        if kw.get("use_pallas") and not env._pallas_active:
            # the build silently routed to XLA (geometry unsupported at
            # this block) -- never record an XLA time under a pallas label
            print(json.dumps({"variant": name,
                              "skipped": "geometry routed to XLA"}))
            continue
        if args.interleave:
            prepared.append((name, fn, sd, ld, float(lengths.sum())))
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, _ = fn(sd, ld)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "variant": name,
            "ms_per_batch": round(dt * 1e3, 3),
            "rtf": round(float(lengths.sum()) / sr / dt, 1),
        }), flush=True)

    if args.interleave and prepared:
        # Epoch-interleaved timing: every epoch times every variant once, so
        # link-weather drift hits all variants equally and epoch-paired
        # deltas cancel it. This is the only measurement shape that resolves
        # ~1.1x differences on this relay (BENCH_NOTES_r04).
        per_epoch = {name: [] for name, *_ in prepared}
        for _ in range(args.interleave):
            for name, fn, sd, ld, _tot in prepared:
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out, _ = fn(sd, ld)
                jax.block_until_ready(out)
                per_epoch[name].append(
                    (time.perf_counter() - t0) / args.iters * 1e3)
        for name, fn, sd, ld, tot in prepared:
            ms = sorted(per_epoch[name])
            med = ms[len(ms) // 2]
            print(json.dumps({
                "variant": name,
                "ms_per_batch": round(med, 3),
                "ms_min": round(ms[0], 3),
                "ms_max": round(ms[-1], 3),
                "epochs": args.interleave,
                "rtf": round(tot / sr / (med / 1e3), 1),
            }), flush=True)
        # pairwise epoch-paired comparison for every variant pair
        for i in range(len(prepared)):
            for j in range(i + 1, len(prepared)):
                a, b = prepared[i][0], prepared[j][0]
                deltas = sorted(
                    (eb - ea) / ea * 100.0
                    for ea, eb in zip(per_epoch[a], per_epoch[b]))
                wins_a = sum(1 for d in deltas if d > 0)
                print(json.dumps({
                    "pair": f"{a} vs {b}",
                    "b_minus_a_pct_median": round(
                        deltas[len(deltas) // 2], 2),
                    "pct_min": round(deltas[0], 2),
                    "pct_max": round(deltas[-1], 2),
                    "a_wins": f"{wins_a}/{len(deltas)}",
                }), flush=True)


if __name__ == "__main__":
    main()
