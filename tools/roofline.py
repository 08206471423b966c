"""Per-geometry speed-of-light statement for the spectrum frontends.

Analytic floors for the mel frontend's dominant op -- the rectangular-
window DFT of dft/dft.go:42-59 -- on one TPU v5e chip, so measured
frontend times (tools/bench_pallas.py) can be judged against hardware
limits instead of against each other. For each frontend the floor is

    max(padded-MAC time at the exact-f32 MXU rate, HBM traffic time)

using the same constants as FactoredDFTPlan's cost model:

- exact-f32 MXU rate: ~16.5e12 MAC/s (bf16 peak / 6-pass decomposition)
- HBM: ~205e9 f32 words/s (~819 GB/s)
- GEMM output columns AND contraction dims padded to the 128-wide MXU
  tile (the round-4 factored shoot-out's lesson: time tracks padded
  MACs with BOTH dims padded -- a K=400 contraction runs as ceil(400/
  128)*128 = 512; earlier lanes-only floors under-charged every dense
  frontend and made the measured 16 kHz conv look 2.35x off when it is
  ~1.6x off its real tile-padded floor)

Usage:
    python tools/roofline.py                      # the standard rate grid
    python tools/roofline.py --rate 48000 [--win-ms 25 --step-ms 10]
                             [--batch 512 --seconds 3]

Pure host math -- no jax, safe to run anywhere.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auditory_tpu.config import SndEnvConfig
from auditory_tpu.dsp.dft import (
    _frames_padded_contraction,
    _pad128 as _pad,
    factored_dft_plan,
    preferred_spectrum_frontend,
)

MACS_PER_S = 16.5e12      # exact-f32 (6-pass) MXU MAC rate, v5e
WORDS_PER_S = 205e9       # HBM f32 words/s (~819 GB/s)
# windowed take-along gather: MEASURED achieved bandwidth, not peak
# (tools/probe_offgrid_gather.py, round 5: 89.6 GB/s = 11% of HBM at the
# 22.05 kHz 551-sample-window geometry -- the gather lowering is
# index-bound). Off-grid geometries (stride % step != 0) have no uniform
# grid and must pay this; every gather-free restructuring measured WORSE
# (span_windows/span_frames -29% paired, probe_offgrid_fix.py; pipeline
# per-segment variants -23..-42% in round 4) because the reshape/concat
# materialization passes lower even slower than the gather.
GATHER_WORDS_PER_S = 89.6e9 / 4


def _derive(rate: int, win_ms: float, step_ms: float):
    """The pipeline's ms->samples derivation (config.Params.derive,
    mirroring sound.Params.MSecToSamples -- 44.1 kHz gives win=1103,
    which is prime; a naive round() would give 1102). ONE derivation per
    floors call; geometry() and the off-grid block both consume it."""
    cfg = SndEnvConfig()
    cfg = dataclasses.replace(
        cfg, params=dataclasses.replace(
            cfg.params, win_ms=win_ms, step_ms=step_ms)
    )
    return cfg.params.derive(rate)


def geometry(rate: int, win_ms: float, step_ms: float):
    t = _derive(rate, win_ms, step_ms)
    return t.win_samples, t.step_samples, t.win_samples // 2 + 1, \
        t.stride_samples


def frontend_floors(rate: int, win_ms: float = 25.0, step_ms: float = 10.0,
                    batch: int = 512, seconds: float = 3.0) -> dict:
    """Floor times (ms) per frontend for a [batch, seconds] corpus slab."""
    tm = _derive(rate, win_ms, step_ms)
    win, step, k, stride = (tm.win_samples, tm.step_samples,
                            tm.win_samples // 2 + 1, tm.stride_samples)
    n_windows = int(seconds * 1000.0 / step_ms)  # per signal (grid steps)
    nw_total = batch * n_windows

    # common traffic: read the signal slab once, write the power once.
    # (The downstream mel matmul fuses; the power tensor itself may also
    # fuse into the mel contraction, so the write charge is an upper floor
    # for standalone-frontend timing, which is what bench_pallas times.)
    in_words = batch * int(seconds * rate)
    out_words = nw_total * k
    base_words = in_words + out_words

    rows = {}

    # conv: implicit GEMM, one _pad(win)-deep contraction per (window,
    # output column); XLA's strided-conv lowering re-reads each input
    # sample ~win/step times in the worst case (im2col-equivalent); floor
    # charges only the ideal single read (the measured gap above this
    # floor is the lowering's).
    macs = nw_total * _pad(win) * _pad(2 * k)
    rows["conv"] = (macs, base_words)

    # frames: J shifted dense GEMMs over step-frames; each block's
    # contraction (step, except the last partial block) pads to its own
    # 128-multiple, and the frame tensor is re-read J times.
    j = max(1, -(-win // step))
    k_padded = _frames_padded_contraction(step, win)
    macs = nw_total * k_padded * _pad(2 * k)
    words = in_words * j + out_words
    rows["frames"] = (macs, words)

    # windowed: ONE dense GEMM over gather-free materialized windows;
    # _pad(W) contraction, plus write+read of the [nW, W] windows tensor
    # (2W words/window).
    macs = nw_total * _pad(win) * _pad(2 * k)
    words = base_words + 2 * win * nw_total
    rows["windowed"] = (macs, words)

    # sliced: p = ceil(W/step) interleaved pure-reshape GEMMs (p == the
    # frames overlap factor j above); the contraction is the full chunk =
    # p*step (>= W, padded), each slot's GEMM reads ~the whole signal slab
    # (p reads total), no materialized windows tensor.
    macs = nw_total * _pad(j * step) * _pad(2 * k)
    words = in_words * j + out_words
    rows["sliced"] = (macs, words)

    # factored: the plan's own padded-MAC model (includes its traffic
    # charge as MAC-equivalents already), plus the base traffic.
    # allow_dominated: show the floor even though the measured round-4
    # verdict is that factored loses on chip (factored_dft_plan doc) --
    # with the corrected contraction-padded model this floor now sits
    # ABOVE the dense ones at every reference geometry.
    plan = factored_dft_plan(win, step, allow_dominated=True)
    if plan is not None:
        macs = nw_total * plan.padded_macs_per_window()
        rows["factored"] = (macs, base_words)

    out = {
        "rate": rate, "win": win, "step": step, "k": k,
        "batch": batch, "seconds": seconds,
        "dispatch": preferred_spectrum_frontend(step, win),
        "audio_s": batch * seconds,
    }
    floors = {}
    floor_s = {}
    for name, (macs, words) in rows.items():
        t_flop = macs / MACS_PER_S
        t_mem = words / WORDS_PER_S
        floor_s[name] = max(t_flop, t_mem)  # unrounded, for the RTF divide
        floors[name] = {
            "flop_ms": round(1e3 * t_flop, 3),
            "mem_ms": round(1e3 * t_mem, 3),
            "floor_ms": round(1e3 * max(t_flop, t_mem), 3),
            "bound": "flop" if t_flop >= t_mem else "mem",
        }
    if plan is not None:
        floors["factored"]["split"] = f"{plan.n1}*{plan.n2}" + (
            "" if plan.polyphase else " (windowed)"
        )
    if stride % step != 0:
        # off-grid geometry (e.g. 22.05 kHz stride 2205, step 221): no
        # uniform window grid exists, so the PRODUCTION frontend is the
        # per-window take-along gather + dense GEMM. The gather is charged
        # at its MEASURED achieved bandwidth (GATHER_WORDS_PER_S -- 11% of
        # HBM peak, lowering-bound; probe_offgrid_gather.py), serial with
        # the GEMM term. The fused program overlaps the two phases
        # (measured fused/serial = 0.74), so a measured time slightly
        # UNDER this serial floor means the path is done, not that the
        # floor is wrong.
        # off-grid window count: seg_cnt * segment_steps PER-SEGMENT
        # windows -- the border-overlap windows recompute per segment
        # (no shared grid to dedup on), ~40% more than the uniform grid's
        n_samples = int(seconds * rate)
        seg_cnt = max((n_samples - tm.segment_samples) // stride + 1, 0)
        nw_off = batch * seg_cnt * tm.segment_steps
        macs = nw_off * _pad(win) * _pad(2 * k)
        t_flop = macs / MACS_PER_S
        t_mem = (in_words + nw_off * k) / WORDS_PER_S
        # 2 passes (read the indexed samples + write the windows tensor),
        # the same accounting the probe's achieved-bandwidth figure uses
        t_gather = 2 * win * nw_off / GATHER_WORDS_PER_S
        floor = max(t_flop, t_mem) + t_gather
        floor_s["gather"] = floor
        floors["gather"] = {
            "flop_ms": round(1e3 * t_flop, 3),
            "mem_ms": round(1e3 * t_mem, 3),
            "gather_ms": round(1e3 * t_gather, 3),
            "floor_ms": round(1e3 * floor, 3),
            "bound": "gather-lowering",
        }
        out["dispatch"] = "gather (off-grid)"
    out["floors"] = floors
    out["rtf_at_floor"] = {
        name: round(out["audio_s"] / floor_s[name])
        for name in floors
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=None)
    ap.add_argument("--win-ms", type=float, default=25.0)
    ap.add_argument("--step-ms", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    rates = [args.rate] if args.rate else [8000, 16000, 22050, 32000,
                                           44100, 48000]
    for r in rates:
        print(json.dumps(frontend_floors(
            r, args.win_ms, args.step_ms, args.batch, args.seconds)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
