"""Headless equivalent of the reference examples/processspeech app: load a
WAV, stream through segments with the multi-stride geometry, print summary
stats per segment (the reference renders tensor grids in a GoGi GUI).

Usage: python examples/process_speech.py [file.wav]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from auditory_tpu.config import (
    DFTParams,
    GaborSet,
    MelParams,
    WindowParams,
    default_gabor_specs,
)
from auditory_tpu.io.wav import load_wav
from auditory_tpu.pipeline.streaming import StreamingProcessor


def main() -> None:
    fn = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/examples/processspeech/sounds/bug.wav"
    )
    w = load_wav(fn)
    sig = w.sound_to_tensor()
    # processspeech.go:226-253 gabor setup: 9x9, stride 3, gain 2, two phases
    gset = GaborSet(
        size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
        specs=default_gabor_specs(phases=(0.0, 1.5708)),
    )
    sp = StreamingProcessor(
        WindowParams(), DFTParams(), MelParams(), gset, w.sample_rate
    )
    sp.load(sig)
    print(f"{fn}: {w.sample_rate} Hz, {len(sig)} samples")
    seg = 0
    while sp.more_segments:
        out = sp.process_segment()
        mel = np.asarray(out["mel_fbank_segment"])[:, :, 0]
        gab = np.asarray(out["gabor"])
        hot = int(np.argmax(mel.mean(axis=1)))
        print(
            f"segment {seg}: mel[{mel.shape[0]}x{mel.shape[1]}] "
            f"range [{mel.min():.2f}, {mel.max():.2f}] hottest band {hot}; "
            f"gabor {gab.shape} active {(np.abs(gab) > 0.1).mean():.3f}"
        )
        seg += 1


if __name__ == "__main__":
    main()
