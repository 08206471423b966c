"""FeatureDataset: corpus artifacts -> padded, masked, normalized batches."""

import numpy as np
import pytest

from auditory_tpu.pipeline.batch import CorpusRunner
from auditory_tpu.pipeline.dataset import FeatureDataset
from tests.conftest import default_cfg_2d, tone

SR = 16000


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from auditory_tpu.io.wav import float_to_wave, write_wav

    d = tmp_path_factory.mktemp("ds")
    wavs = d / "wavs"
    wavs.mkdir()
    paths = []
    durs = [0.3, 0.45, 0.6, 0.3, 0.5]
    for i, dur in enumerate(durs):
        p = str(wavs / f"u{i}.wav")
        write_wav(p, float_to_wave(tone(350.0 + 150 * i, dur, SR), SR))
        paths.append(p)
    out = d / "out"
    CorpusRunner(default_cfg_2d(), SR, batch_size=2).run(paths, str(out))
    return str(out)


def test_batches_shapes_masks(corpus_dir):
    ds = FeatureDataset(corpus_dir)
    assert len(ds) == 5
    assert "mel_fbank_segment" in ds.keys
    batches = list(ds.batches(2))
    assert [len(b["stem"]) for b in batches] == [2, 2, 1]
    for b in batches:
        mel = b["mel_fbank_segment"]
        assert mel.shape[:2] == b["seg_valid"].shape
        # padded segments are exactly zero
        for i in range(mel.shape[0]):
            n = int(b["n_seg"][i])
            assert np.all(mel[i, n:] == 0)
            assert b["seg_valid"][i, :n].all()
            assert not b["seg_valid"][i, n:].any()
    # per-utterance content matches the raw npz
    b0 = batches[0]
    raw = ds.load(b0["stem"][0])
    np.testing.assert_array_equal(
        b0["mel_fbank_segment"][0, : b0["n_seg"][0]],
        raw["mel_fbank_segment"],
    )


def test_normalize_and_labels(corpus_dir):
    ds = FeatureDataset(
        corpus_dir, keys=("mel_fbank_segment",),
        label_fn=lambda stem: int(stem[1:]),
    )
    mean, std = ds.normalizer()
    assert mean.shape == std.shape and std.min() > 0
    got = {}
    for b in ds.batches(3, normalize=True):
        for i, s in enumerate(b["stem"]):
            got[s] = (b["mel_fbank_segment"][i], int(b["label"][i]),
                      int(b["n_seg"][i]))
    assert sorted(got) == [f"u{i}" for i in range(5)]
    for s, (x, lab, n) in got.items():
        assert lab == int(s[1:])
        raw = ds.load(s)["mel_fbank_segment"].astype(np.float32)
        expect = (raw - mean[:, None]) / std[:, None]
        np.testing.assert_allclose(x[:n], expect, rtol=1e-6, atol=1e-6)
        assert np.all(x[n:] == 0)


def test_shuffle_determinism_and_remainder(corpus_dir):
    ds = FeatureDataset(corpus_dir, keys=("mel_fbank_segment",))
    o1 = [s for b in ds.batches(2, seed=7) for s in b["stem"]]
    o2 = [s for b in ds.batches(2, seed=7) for s in b["stem"]]
    o3 = [s for b in ds.batches(2, seed=8) for s in b["stem"]]
    assert o1 == o2 and sorted(o1) == sorted(ds.stems)
    assert o1 != o3  # 5! orders; seeds 7 vs 8 differ for this fixture
    dropped = list(ds.batches(2, drop_remainder=True))
    assert [len(b["stem"]) for b in dropped] == [2, 2]


def test_bad_keys_and_missing_dir(tmp_path, corpus_dir):
    with pytest.raises(FileNotFoundError):
        FeatureDataset(str(tmp_path))
    with pytest.raises(ValueError, match="not in the corpus"):
        FeatureDataset(corpus_dir, keys=("nope",))


def test_iter_device_features_matches_npz(corpus_dir, tmp_path):
    """Device-resident handoff: iter_device_features yields jax arrays
    matching the npz route bit-for-bit, without writing anything."""
    import jax

    from auditory_tpu.io.wav import float_to_wave, write_wav

    paths = []
    durs = [0.3, 0.45, 0.6, 0.3, 0.5]
    for i, dur in enumerate(durs):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, float_to_wave(tone(350.0 + 150 * i, dur, SR), SR))
        paths.append(p)

    runner = CorpusRunner(default_cfg_2d(), SR, batch_size=2)
    ds = FeatureDataset(corpus_dir)  # the npz route over identical audio
    seen = {}
    for batch_paths, out, seg_valid, n_segs in runner.iter_device_features(
        paths
    ):
        # DEVICE arrays: no host copy has happened
        assert isinstance(out.mel_fbank_segment, jax.Array)
        assert isinstance(seg_valid, jax.Array)
        assert out.mel_fbank_segment.shape[:2] == seg_valid.shape
        for i, p in enumerate(batch_paths):
            seen[p] = (
                np.asarray(out.mel_fbank_segment[i][: n_segs[i]]),
                np.asarray(out.gabor_kwta[i][: n_segs[i]]),
            )
    assert sorted(seen) == sorted(paths)
    # nothing was written next to the inputs
    assert sorted(f.name for f in tmp_path.iterdir()) == sorted(
        f"u{i}.wav" for i in range(5)
    )
    for i, p in enumerate(paths):
        raw = ds.load(f"u{i}")
        np.testing.assert_array_equal(seen[p][0], raw["mel_fbank_segment"])
        np.testing.assert_array_equal(seen[p][1], raw["gabor_kwta"])
