"""Native C++ IO library vs the pure-Python decoder."""

import numpy as np
import pytest

from auditory_tpu.io import native
from auditory_tpu.io.wav import float_to_wave, load_wav, write_wav
from tests.conftest import tone

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libauditory_io.so not built (make -C csrc)"
)


@pytest.mark.parametrize("bit_depth", [8, 16, 24, 32])
def test_native_matches_python(tmp_path, bit_depth):
    sig = tone(600.0, 0.05, 16000, amp=0.8)
    p = str(tmp_path / f"t{bit_depth}.wav")
    write_wav(p, float_to_wave(sig, 16000, bit_depth=bit_depth))

    w = load_wav(p)
    py = w.sound_to_tensor(dtype=np.float32)
    out, lengths, srs, errors = native.decode_batch([p], len(py) + 10)
    assert errors[0] is None
    assert srs[0] == 16000
    assert lengths[0] == len(py)
    np.testing.assert_allclose(out[0, : len(py)], py, rtol=1e-6, atol=1e-7)
    assert np.all(out[0, len(py):] == 0)


def test_native_stereo_flatten_quirk(tmp_path):
    sig = tone(440.0, 0.03, 16000)
    st = np.empty(2 * len(sig))
    st[0::2] = sig
    st[1::2] = -sig
    p = str(tmp_path / "st.wav")
    write_wav(p, float_to_wave(st, 16000, channels=2))
    w = load_wav(p)
    py_flat = w.sound_to_tensor(dtype=np.float32)
    out, lengths, _, errors = native.decode_batch([p], len(st))
    assert errors[0] is None
    np.testing.assert_allclose(out[0, : lengths[0]], py_flat, rtol=1e-6)
    # channel extraction
    out1, lengths1, _, _ = native.decode_batch([p], len(st), channel=0)
    np.testing.assert_allclose(
        out1[0, : lengths1[0]], w.channel_signal(0, dtype=np.float32), rtol=1e-6
    )


def test_native_batch_with_errors(tmp_path):
    good = str(tmp_path / "g.wav")
    write_wav(good, float_to_wave(tone(500, 0.02, 8000), 8000))
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage!")
    missing = str(tmp_path / "missing.wav")
    out, lengths, srs, errors = native.decode_batch(
        [good, bad, missing], 4000, n_threads=3
    )
    assert errors[0] is None and lengths[0] > 0
    assert errors[1] is not None
    assert errors[2] == "open failed"


def test_native_info(tmp_path):
    p = str(tmp_path / "i.wav")
    write_wav(p, float_to_wave(tone(500, 0.05, 44100), 44100, bit_depth=24))
    sr, ch, bd, nf = native.wav_info(p)
    assert (sr, ch, bd) == (44100, 1, 24)
    assert nf == int(0.05 * 44100)


def test_native_too_long(tmp_path):
    p = str(tmp_path / "l.wav")
    write_wav(p, float_to_wave(tone(500, 0.1, 16000), 16000))
    out, lengths, _, errors = native.decode_batch([p], 100)
    assert errors[0] == "file longer than buffer"
