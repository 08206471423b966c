"""Generate frozen golden vectors from the literal oracle (refemu) for the
parity regression suite.

The oracle itself is tested against the JAX pipeline, but both could in
principle drift together; freezing oracle outputs into version-controlled
.npz files pins today's verified numerics. Regenerate ONLY when a quirk is
deliberately re-verified against the Go reference:

    python tools/make_goldens.py

When ADDING cases, keep the existing .npz files as checked in (git checkout
the unchanged names after running): regeneration can shift pre-existing
goldens by ~1 ulp (libm/numpy version drift in f64 log), and the frozen
round-1-era bytes are the stronger co-drift insurance.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auditory_tpu.config import GaborSet, SndEnvConfig, default_gabor_specs
from auditory_tpu.io.wav import load_wav
from auditory_tpu.refemu.goref import SndEnvRef

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
REF_SOUNDS = "/root/reference/examples/processspeech/sounds"


def cfg_default() -> SndEnvConfig:
    return SndEnvConfig(
        gabor=GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )


def synth(name: str, sr: int) -> np.ndarray:
    r = np.random.default_rng(12345)
    t = np.arange(int(0.31 * sr)) / sr
    if name == "tone_mix":
        sig = (
            0.4 * np.sin(2 * np.pi * 450 * t)
            + 0.2 * np.sin(2 * np.pi * 2210 * t)
            + 1e-4 * r.standard_normal(len(t))
        )
    elif name == "noise":
        sig = 0.15 * r.standard_normal(len(t))
    else:
        raise ValueError(name)
    return sig.astype(np.float64)


def run_oracle(
    sig: np.ndarray, sr: int, channels: int = 1, window_fn=None
) -> dict:
    import dataclasses

    cfg = cfg_default()
    if window_fn is not None:
        cfg = dataclasses.replace(
            cfg, dft=dataclasses.replace(cfg.dft, window_fn=window_fn)
        )
    ref = SndEnvRef(cfg)
    ref.init(sig, sr, channels=channels)
    segs = max(ref.seg_cnt, 0)
    out = {
        "signal": sig,
        "sample_rate": np.int64(sr),
        "channels": np.int64(channels),
        "window_fn": np.str_(window_fn or ""),
        "n_segments": np.int64(segs),
    }
    keys = (
        "power_segment", "log_power_segment", "mel_fbank_segment", "energy",
        "mfcc_segment", "mfcc_deltas", "mfcc_delta_deltas",
    )
    acc = {k: [] for k in keys}
    gabors = []
    for s in range(segs):
        ref.process_segment(s)
        for k in keys:
            acc[k].append(getattr(ref, k).copy())
        gabors.append(ref.apply_gabor().copy())
    for k in keys:
        out[k] = np.stack(acc[k]) if acc[k] else np.zeros((0,))
    out["gabor_raw"] = np.stack(gabors) if gabors else np.zeros((0,))
    return out


# the full reference eyeball-validation set (the Go repo's only test
# assets, examples/processspeech/sounds/): pure tones, a tone mix, noise,
# silence (hits the ==0 -> LogMin floors at 44.1 kHz geometry), bug.wav
# (the decode edge case the reference kept), and a spoken syllable
REF_WAVS = (
    "800", "2000", "5000", "7000", "800_2000_5000",
    "noise130ms", "silence_100ms", "bug", "female_la_100ms",
)


def stereo_synth(sr: int) -> np.ndarray:
    """Interleaved 2-channel signal exercising the reference's stereo
    SoundToTensor flatten quirk (sound/sound.go:116-127: frames flatten
    interleaved, and SndEnv's SegCnt divides by ch, sndenv.go:263-265)."""
    r = np.random.default_rng(777)
    t = np.arange(int(0.31 * sr)) / sr
    left = 0.4 * np.sin(2 * np.pi * 620 * t) + 1e-4 * r.standard_normal(len(t))
    right = 0.3 * np.sin(2 * np.pi * 1750 * t) + 1e-4 * r.standard_normal(len(t))
    inter = np.empty(2 * len(t), dtype=np.float64)
    inter[0::2] = left
    inter[1::2] = right
    return inter


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    cases = {}
    for name, sr in (("tone_mix", 16000), ("noise", 16000)):
        cases[name] = (synth(name, sr), sr, 1, None)
    cases["stereo_tones"] = (stereo_synth(16000), 16000, 2, None)
    # the opt-in analysis-window EXTENSION frozen too (co-drift insurance
    # for the non-reference path; SURVEY.md:120-122)
    cases["tone_mix_hamming"] = (synth("tone_mix", 16000), 16000, 1,
                                 "hamming")
    for wav in REF_WAVS:
        path = os.path.join(REF_SOUNDS, wav + ".wav")
        if os.path.exists(path):
            w = load_wav(path)
            ref = SndEnvRef(cfg_default())
            ref.init(np.zeros(1), w.sample_rate)  # timing only
            sig = ref.pad(w.sound_to_tensor())
            cases["wav_" + wav] = (sig, w.sample_rate, 1, None)

    for name, (sig, sr, ch, wfn) in cases.items():
        data = run_oracle(sig, sr, channels=ch, window_fn=wfn)
        out = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(out, **data)
        print(f"{out}: {data['n_segments']} segments, "
              f"{os.path.getsize(out) // 1024} KiB")


if __name__ == "__main__":
    main()
