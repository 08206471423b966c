"""Batched processing + data-parallel sharding over the 8-device CPU mesh."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.io.wav import float_to_wave, write_wav
from auditory_tpu.parallel.mesh import make_mesh
from auditory_tpu.pipeline.batch import BatchedSndEnv, CorpusRunner, bucket_length
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


@pytest.fixture(scope="module")
def env():
    return SndEnv(default_cfg_2d(), SR, dtype=jnp.float64, spectrum_method="fft")


def make_batch(env, durations):
    sigs = [env.pad(tone(500 + 300 * i, d, SR)) for i, d in enumerate(durations)]
    smax = bucket_length(max(len(s) for s in sigs), env.timing)
    batch = np.zeros((len(sigs), smax))
    lengths = np.array([len(s) for s in sigs], dtype=np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    return sigs, batch, lengths


def test_batch_matches_single(env):
    sigs, batch, lengths = make_batch(env, [0.25, 0.45, 0.15, 0.35])
    benv = BatchedSndEnv(env)
    out, seg_valid = benv.process(batch, lengths)
    sv = np.asarray(seg_valid)

    for i, sig in enumerate(sigs):
        single = env.process(sig)
        n_seg = single.power_segment.shape[0]
        assert int(sv[i].sum()) == n_seg
        np.testing.assert_allclose(
            np.asarray(out.mel_fbank_segment[i][:n_seg]),
            np.asarray(single.mel_fbank_segment),
            atol=1e-9, rtol=1e-12, err_msg=f"utt {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out.mfcc_deltas[i][:n_seg]),
            np.asarray(single.mfcc_deltas),
            atol=1e-9, rtol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(out.gabor_raw[i][:n_seg]),
            np.asarray(single.gabor_raw),
            atol=1e-5, rtol=1e-6,
        )
        # invalid segments fully zeroed
        assert np.all(np.asarray(out.mel_fbank_segment[i][n_seg:]) == 0)
        assert np.all(np.asarray(out.gabor_raw[i][n_seg:]) == 0)


def test_sharded_matches_unsharded(env):
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    sigs, batch, lengths = make_batch(
        env, [0.25, 0.45, 0.15, 0.35, 0.2, 0.3, 0.4, 0.25]
    )
    plain = BatchedSndEnv(env)
    sharded = BatchedSndEnv(env, mesh=mesh)
    o1, v1 = plain.process(batch, lengths)
    o2, v2 = sharded.process(batch, lengths)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        atol=1e-9,
    )
    # kwta settles in f32; 1e-15 input reordering diffs amplify through the
    # 20-iteration dynamics
    np.testing.assert_allclose(
        np.asarray(o1.gabor_kwta), np.asarray(o2.gabor_kwta), atol=1e-4
    )
    # the result really is sharded over the mesh
    shard_devs = {s.device for s in o2.mel_fbank_segment.addressable_shards}
    assert len(shard_devs) == 8


def test_bucket_length(env):
    t = env.timing
    assert bucket_length(t.segment_samples, t) == t.segment_samples
    n = t.segment_samples + 1
    b = bucket_length(n, t)
    assert b >= n and (b - t.segment_samples) % t.stride_samples == 0


def test_corpus_runner(tmp_path):
    cfg = default_cfg_2d()
    wavs = []
    for i, d in enumerate([0.2, 0.3, 0.25]):
        sig = tone(400 + 200 * i, d, SR)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, float_to_wave(sig, SR))
        wavs.append(p)
    # one corrupt file and one wrong-rate file (failure detection)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")
    wrong = str(tmp_path / "wrong.wav")
    write_wav(wrong, float_to_wave(tone(500, 0.1, 8000), 8000))

    out_dir = str(tmp_path / "out")
    runner = CorpusRunner(cfg, SR, batch_size=2, dtype=jnp.float32)
    stats = runner.run(wavs + [bad, wrong], out_dir)
    assert stats.files_done == 3
    assert stats.files_failed == 2
    assert stats.audio_seconds > 0

    recs = [json.loads(l) for l in open(os.path.join(out_dir, "manifest.jsonl"))]
    assert sum(r["status"] == "ok" for r in recs) == 3
    assert sum(r["status"] == "error" for r in recs) == 2

    data = np.load(os.path.join(out_dir, "u0.npz"))
    assert "mel_fbank_segment" in data and "gabor_kwta" in data
    assert data["mel_fbank_segment"].shape[1:] == (32, 14)

    # resume: nothing left to do
    stats2 = runner.run(wavs + [bad, wrong], out_dir)
    assert stats2.files_done == 0
    assert stats2.files_failed == 2  # errors are retried


def test_cli_corpus_mesh(tmp_path):
    """CLI corpus over the 8-device mesh end to end."""
    from auditory_tpu.cli import main

    for i in range(4):
        write_wav(
            str(tmp_path / f"m{i}.wav"),
            float_to_wave(tone(300 + 200 * i, 0.25, SR), SR),
        )
    out = str(tmp_path / "out")
    rc = main([
        "corpus", "--glob", str(tmp_path / "m*.wav"), "--out", out,
        "--rate", str(SR), "--mesh", "--no-kwta", "--batch-size", "4",
    ])
    assert rc == 0
    files = set(os.listdir(out))
    assert sum(f.endswith(".npz") for f in files) == 4
    assert "manifest.jsonl" in files and "feature_stats.json" in files


def test_corpus_same_basename_no_clobber(tmp_path):
    """Same-named WAVs in different dirs must produce distinct outputs
    (TIMIT layout: DR1/FCJF0/SA1.WAV vs DR1/FVMH0/SA1.WAV)."""
    paths = []
    for spk, freq in (("FCJF0", 500.0), ("FVMH0", 1500.0)):
        d = tmp_path / "DR1" / spk
        d.mkdir(parents=True)
        p = str(d / "SA1.wav")
        write_wav(p, float_to_wave(tone(freq, 0.25, SR), SR))
        paths.append(p)
    out = str(tmp_path / "out")
    runner = CorpusRunner(default_cfg_2d(), SR, batch_size=4)
    stats = runner.run(paths, out)
    assert stats.files_done == 2
    npz = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
    assert len(npz) == 2, npz
    a, b = (np.load(os.path.join(out, f))["mel_fbank_segment"] for f in npz)
    assert not np.allclose(a, b), "distinct files must keep distinct features"


def test_out_names_flatten_collision(tmp_path):
    from auditory_tpu.pipeline.batch import CorpusRunner

    (tmp_path / "DR1" / "A").mkdir(parents=True)
    p1 = str(tmp_path / "DR1" / "A" / "S1.wav")
    p2 = str(tmp_path / "DR1" / "A_S1.wav")
    stems = CorpusRunner._out_names([p1, p2])
    assert len(set(stems.values())) == 2, stems


def test_feature_stats(tmp_path):
    """Corpus feature-normalization statistics: written, correct, and equal
    with and without mesh sharding (the sharded reduction is the pipeline's
    one collective)."""
    import jax.numpy as jnp

    from auditory_tpu.pipeline.batch import CorpusRunner

    wavs = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.wav")
        write_wav(p, float_to_wave(tone(400 + 300 * i, 0.3, SR), SR))
        wavs.append(p)

    r1 = CorpusRunner(default_cfg_2d(), SR, batch_size=4)
    r1.run(wavs, str(tmp_path / "o1"))
    s1 = json.load(open(tmp_path / "o1" / "feature_stats.json"))
    assert len(s1["mel_mean"]) == 32 and s1["count_steps"] > 0

    r2 = CorpusRunner(default_cfg_2d(), SR, batch_size=4, mesh=make_mesh())
    r2.run(wavs, str(tmp_path / "o2"))
    s2 = json.load(open(tmp_path / "o2" / "feature_stats.json"))
    np.testing.assert_allclose(s1["mel_mean"], s2["mel_mean"], rtol=1e-5)
    np.testing.assert_allclose(s1["mel_std"], s2["mel_std"], rtol=1e-4)

    # sanity: mean must equal the masked mean of the saved features
    mels = []
    for i in range(4):
        m = np.load(tmp_path / "o1" / f"s{i}.npz")["mel_fbank_segment"]
        mels.append(m.transpose(0, 2, 1).reshape(-1, 32))
    allm = np.concatenate(mels)
    # saved npz excludes invalid steps' zeros? they are zero columns included;
    # compare against stats count instead: mean over count_steps
    total = allm.sum(axis=0)
    # stats count all valid steps incl. zero-valued ones; rough agreement:
    approx_mean = total / s1["count_steps"]
    np.testing.assert_allclose(approx_mean, s1["mel_mean"], atol=1e-6)


def test_sharded_non_divisible_batch(env):
    """7 utterances on 8 devices: process() pads internally with inert
    zero-length rows, outputs match the unsharded run and keep batch size 7
    (VERDICT round-1 weakness 2)."""
    mesh = make_mesh()
    sigs, batch, lengths = make_batch(
        env, [0.25, 0.45, 0.15, 0.35, 0.2, 0.3, 0.4]
    )
    assert batch.shape[0] == 7
    plain = BatchedSndEnv(env)
    sharded = BatchedSndEnv(env, mesh=mesh)
    o1, v1 = plain.process(batch, lengths)
    o2, v2 = sharded.process(batch, lengths)
    assert o2.mel_fbank_segment.shape[0] == 7
    assert np.asarray(v2).shape[0] == 7
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(o1.gabor_kwta), np.asarray(o2.gabor_kwta), atol=1e-4
    )


def test_sharded_non_divisible_feature_stats(env):
    """Internal mesh padding must not pollute the feature-stats moments."""
    fenv = SndEnv(
        default_cfg_2d(), SR, dtype=jnp.float64, spectrum_method="fft",
        feature_stats=True,
    )
    sigs, batch, lengths = make_batch(fenv, [0.25, 0.45, 0.15])
    plain = BatchedSndEnv(fenv)
    sharded = BatchedSndEnv(fenv, mesh=make_mesh())
    _, _, m1 = plain.process(batch, lengths)
    _, _, m2 = sharded.process(batch, lengths)
    for k in ("sum", "sumsq", "count"):
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=1e-12,
            err_msg=k,
        )
