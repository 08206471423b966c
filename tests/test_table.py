"""Sounds-table workflow (gaborview LoadTranscription path)."""

import os

from auditory_tpu.io.wav import float_to_wave, write_wav
from auditory_tpu.speech.table import SoundsTable, idx_from_snd, load_timit_sequence
from tests.conftest import tone


def make_pair(tmp_path, name="u0"):
    wav = str(tmp_path / f"{name}.wav")
    write_wav(wav, float_to_wave(tone(800, 0.6, 16000), 16000))
    phn = str(tmp_path / f"{name}.PHN.MS")
    open(phn, "w").write("0 h#\n100 sh\n250 iy\n400 h#\n")
    txt = str(tmp_path / f"{name}.TXT")
    open(txt, "w").write("0 9600 she\n")
    return wav


def test_load_timit_sequence(tmp_path):
    wav = make_pair(tmp_path)
    seq = load_timit_sequence(wav)
    assert [u.name for u in seq.units] == ["h#", "sh", "iy", "h#"]
    assert seq.text == "she"
    assert seq.units[1].a_start == 100.0  # no offset/silence


def test_load_timit_sequence_missing_timing(tmp_path):
    wav = str(tmp_path / "x.wav")
    write_wav(wav, float_to_wave(tone(500, 0.1, 16000), 16000))
    seq = load_timit_sequence(wav)
    assert len(seq.units) == 1 and seq.units[0].name == "unknown"


def test_sounds_table_filter(tmp_path):
    t = SoundsTable()
    t.add_sequence(load_timit_sequence(make_pair(tmp_path, "a")))
    t.add_sequence(load_timit_sequence(make_pair(tmp_path, "b")))
    assert len(t) == 8
    sh = t.filter_sound("sh")
    assert len(sh) == 2
    assert sh[0].duration == 150.0
    assert sh[0].file == "a" and sh[1].file == "b"


def test_idx_from_snd_dispatch():
    assert idx_from_snd("TIMIT", "sh") == (33, True)
    assert idx_from_snd("SYNTHCVS", "da", "I") == (0, True)
    assert idx_from_snd("GRAFESTES", "ku") == (7, True)
    assert idx_from_snd("NOPE", "x") == (-1, False)


def test_load_cv_sequence(tmp_path):
    from auditory_tpu.speech.table import load_cv_sequence

    wav = str(tmp_path / "cv.wav")
    write_wav(wav, float_to_wave(tone(600, 0.5, 16000), 16000))
    (tmp_path / "cv.txt").write_text("header\nda go pa\n")
    (tmp_path / "cv.times").write_text("0.0 0.15\n0.15 0.31\n0.31 0.5\n")
    seq = load_cv_sequence(wav, "SYNTHCVS", "I")
    assert [u.name for u in seq.units] == ["da", "go", "pa"]
    assert seq.units[1].a_start == 150.0
    # missing timing -> unknown fallback
    wav2 = str(tmp_path / "cv2.wav")
    write_wav(wav2, float_to_wave(tone(600, 0.1, 16000), 16000))
    seq2 = load_cv_sequence(wav2, "GRAFESTES")
    assert seq2.units[0].name == "unknown"
