"""WAV IO: round-trip, bit-depth normalization, reference-asset decode."""

import numpy as np
import pytest

from auditory_tpu.io.wav import Wave, float_to_wave, load_wav, write_wav
from tests.conftest import tone


@pytest.mark.parametrize("bit_depth", [8, 16, 24, 32])
def test_roundtrip(tmp_path, bit_depth):
    sig = tone(440.0, 0.05, 16000)
    w = float_to_wave(sig, 16000, bit_depth=bit_depth)
    p = str(tmp_path / f"t{bit_depth}.wav")
    write_wav(p, w)
    w2 = load_wav(p)
    assert w2.sample_rate == 16000
    assert w2.channels == 1
    assert w2.source_bit_depth == bit_depth
    np.testing.assert_array_equal(w.data, w2.data)


def test_normalization_16bit():
    w = Wave(
        data=np.array([0x7FFF, -0x7FFF, 0], dtype=np.int32),
        sample_rate=16000,
        channels=1,
        source_bit_depth=16,
    )
    sig = w.sound_to_tensor()
    np.testing.assert_allclose(sig, [1.0, -1.0, 0.0])


def test_sound_to_tensor_stereo_quirk():
    """SoundToTensor takes the first NumFrames *interleaved* samples
    (sound/sound.go:116-127)."""
    data = np.arange(8, dtype=np.int32)  # stereo: 4 frames
    w = Wave(data=data, sample_rate=8000, channels=2, source_bit_depth=16)
    sig = w.sound_to_tensor()
    np.testing.assert_allclose(sig, np.arange(4) / 0x7FFF)
    # the sane per-channel accessor
    np.testing.assert_allclose(w.channel_signal(0), np.array([0, 2, 4, 6]) / 0x7FFF)


def test_quantize_roundtrip_close():
    sig = tone(1000.0, 0.02, 44100, amp=0.9)
    w = float_to_wave(sig, 44100, bit_depth=16)
    back = w.sound_to_tensor()
    assert np.max(np.abs(back - sig)) < 1.0 / 0x7FFE


def test_reference_assets_decode(ref_wavs):
    w = load_wav(ref_wavs["800"])
    assert w.sample_rate in (16000, 44100)
    sig = w.sound_to_tensor()
    assert len(sig) > 0
    assert np.max(np.abs(sig)) <= 1.0 + 1e-9
    # 800 Hz tone should have its strongest DFT bin near 800 Hz
    n = min(len(sig), 4096)
    spec = np.abs(np.fft.rfft(sig[:n]))
    spec[0] = 0
    peak_hz = np.argmax(spec) * w.sample_rate / n
    assert abs(peak_hz - 800) < 40


def test_channel_signal_bounds():
    w = Wave(data=np.arange(8, dtype=np.int32), sample_rate=8000, channels=2,
             source_bit_depth=16)
    with pytest.raises(ValueError):
        w.channel_signal(2)


def test_cli_play_paths(tmp_path, capsys):
    """Drive the play command's decode path (play.go:139-179 parity):
    missing file, headless rc-2, and the --out-wav re-encode fallback."""
    import sys

    from auditory_tpu.cli import main
    from auditory_tpu.io.wav import float_to_wave, load_wav, write_wav

    assert "sounddevice" not in sys.modules or sys.modules["sounddevice"] is None

    # missing file -> rc 1 with the reference's message shape
    rc = main(["play", str(tmp_path / "nope.wav")])
    assert rc == 1
    assert "not found" in capsys.readouterr().err

    sr = 16000
    t = np.arange(int(0.05 * sr)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float64)
    p = str(tmp_path / "t.wav")
    write_wav(p, float_to_wave(sig, sr))

    # no audio backend, no fallback -> rc 2, decode reported
    rc = main(["play", p])
    assert rc == 2
    assert "decoded" in capsys.readouterr().err

    # headless fallback: re-encode at overridden rate/channels/depth
    out = str(tmp_path / "re.wav")
    rc = main(["play", p, "--rate", "8000", "--depth", "1",
               "--out-wav", out])
    assert rc == 0
    w = load_wav(out)
    assert w.sample_rate == 8000
    assert w.source_bit_depth == 8
    assert w.channels == 1
    # same number of samples survived the re-encode
    assert w.num_frames == len(sig)


def test_cli_play_stereo_full_duration(tmp_path):
    """Stereo playback must use the FULL interleaved stream -- not
    sound_to_tensor's first-num_frames quirk, which would halve the
    duration (code-review finding)."""
    from auditory_tpu.cli import main
    from auditory_tpu.io.wav import Wave, load_wav, write_wav

    sr = 16000
    n = int(0.05 * sr)
    t = np.arange(n) / sr
    left = 0.4 * np.sin(2 * np.pi * 500.0 * t)
    right = 0.4 * np.sin(2 * np.pi * 900.0 * t)
    inter = np.empty(2 * n)
    inter[0::2], inter[1::2] = left, right
    data = np.round(inter * 0x7FFF).astype(np.int32)
    p = str(tmp_path / "st.wav")
    write_wav(p, Wave(data=data, sample_rate=sr, channels=2,
                      source_bit_depth=16))

    out = str(tmp_path / "re.wav")
    rc = main(["play", p, "--out-wav", out])
    assert rc == 0
    w = load_wav(out)
    assert w.channels == 2
    # full duration survived (num_frames counts per-channel frames)
    assert w.num_frames == n
    # and both channels' content is intact
    np.testing.assert_allclose(
        w.channel_signal(0), left, atol=2e-4)
    np.testing.assert_allclose(
        w.channel_signal(1), right, atol=2e-4)
