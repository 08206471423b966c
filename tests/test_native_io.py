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


pytestmark_native = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


@pytestmark_native
def test_native_corrupt_chunk_sizes_are_per_file_errors(tmp_path):
    """Untrusted chunk sizes must never cause a multi-GB allocation or a
    wrapped chunk-skip loop (review findings). Two corruptions: a data
    chunk declaring ~4 GB (clamped to the bytes present -- the truncated
    file decodes what exists, matching the Python-wave fallback tier),
    and a pre-data junk chunk of size 0xFFFFFFFF (whose 32-bit skip
    would wrap to 0 -- a per-file error record)."""
    import struct

    good = str(tmp_path / "good.wav")
    write_wav(good, float_to_wave(tone(500.0, 0.05, 16000), 16000))

    def wav_bytes(data_sz=None, junk_sz=None, n_data=64):
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if junk_sz is not None:
            body += b"JUNK" + struct.pack("<I", junk_sz)  # no junk payload
        data = bytes(n_data)
        body += b"data" + struct.pack(
            "<I", data_sz if data_sz is not None else n_data
        ) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    huge = str(tmp_path / "huge.wav")
    open(huge, "wb").write(wav_bytes(data_sz=0xFFFFFFF0))
    wrap = str(tmp_path / "wrap.wav")
    open(wrap, "wb").write(wav_bytes(junk_sz=0xFFFFFFFF))

    out, lengths, srs, errors = native.decode_batch(
        [good, huge, wrap], max_samples=16000
    )
    assert errors[0] is None and lengths[0] == 800
    # declared-past-EOF data clamps to the 64 bytes present: 32 samples,
    # exactly what the Python tier decodes for the same file
    assert errors[1] is None and lengths[1] == 32
    assert errors[2] is not None


@pytestmark_native
def test_native_wave_format_extensible(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) PCM must decode identically to the
    plain-PCM encoding of the same samples (the Python fallback handles
    these; the native tier must not regress them)."""
    import struct

    sig = tone(700.0, 0.05, 16000)
    plain = str(tmp_path / "plain.wav")
    write_wav(plain, float_to_wave(sig, 16000))
    ref = load_wav(plain)
    data = ref.data[: ref.num_frames].astype("<i2").tobytes()

    # extensible fmt chunk: cbSize=22, validbits=16, mask=0, GUID with
    # sub-format PCM (=1) in the first two bytes
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 16000, 32000, 2, 16, 22, 16, 0)
    fmt += struct.pack("<H", 1) + bytes(14)  # sub-format GUID
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    ext = str(tmp_path / "ext.wav")
    open(ext, "wb").write(
        b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    )

    out, lengths, srs, errors = native.decode_batch([ext], max_samples=16000)
    assert errors[0] is None, errors
    np.testing.assert_allclose(
        out[0, : lengths[0]],
        ref.data[: ref.num_frames].astype(np.float64) / 32767.0,
        atol=1e-7,
    )
