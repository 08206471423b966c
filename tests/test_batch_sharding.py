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


def test_sharded_matches_unsharded_factored_frontend():
    """The factored Cooley-Tukey frontend composes with DP sharding:
    22.05 kHz (551 = 29*19, step 221 coprime to both factors) exercises
    the windows-materialization stage-1 mode under the mesh."""
    from auditory_tpu.config import clamp_mel_to_nyquist

    sr = 22050
    cfg = clamp_mel_to_nyquist(default_cfg_2d(), sr)
    env = SndEnv(
        cfg, sr, dtype=jnp.float32, spectrum_method="factored",
        outputs=("mel_fbank_segment", "step_valid"),
    )
    assert env.factored_plan is not None and not env.factored_plan.polyphase
    rng = np.random.default_rng(3)
    n = env.timing.segment_samples + env.timing.stride_samples
    batch = rng.normal(scale=0.1, size=(8, n)).astype(np.float32)
    lengths = np.full(8, n, dtype=np.int32)
    o1, v1 = BatchedSndEnv(env).process(batch, lengths)
    o2, v2 = BatchedSndEnv(env, mesh=make_mesh()).process(batch, lengths)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        atol=3e-5, rtol=1e-6,
    )
    assert len({
        s.device for s in o2.mel_fbank_segment.addressable_shards
    }) == 8


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

    # the '-n' disambiguation suffix must itself avoid genuine stems:
    # with DR1/A_S1-1.wav also present, suffixing the collision to
    # 'A_S1-1' would clobber it (round-4 review finding)
    p3 = str(tmp_path / "DR1" / "A_S1-1.wav")
    stems = CorpusRunner._out_names([p1, p2, p3])
    assert len(set(stems.values())) == 3, stems
    assert stems[p3] == "A_S1-1"  # the natural owner keeps its stem


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


def _mk_corpus(tmp_path, n=4, sr=SR, bit_depth=16):
    wavs = []
    for i in range(n):
        sig = tone(400 + 150 * i, 0.22 + 0.03 * i, sr)
        p = str(tmp_path / f"c{bit_depth}_{i}.wav")
        write_wav(p, float_to_wave(sig, sr, bit_depth=bit_depth))
        wavs.append(p)
    return wavs


def test_corpus_int16_transfer_parity(tmp_path):
    """transfer='auto' ships raw int16 + on-device normalization; outputs
    must match the float32 host-normalized path to <= a few f32 ulps of
    input quantization propagated through the pipeline."""
    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path)
    ra = CorpusRunner(cfg, SR, batch_size=4, transfer="auto")
    rf = CorpusRunner(cfg, SR, batch_size=4, transfer="float32")
    ra.run(wavs, str(tmp_path / "oa"))
    rf.run(wavs, str(tmp_path / "of"))
    for i in range(len(wavs)):
        stem = f"c16_{i}"
        a = np.load(tmp_path / "oa" / f"{stem}.npz")
        f = np.load(tmp_path / "of" / f"{stem}.npz")
        assert set(a.files) == set(f.files)
        for k in a.files:
            np.testing.assert_allclose(
                a[k], f[k], atol=5e-5, rtol=1e-5, err_msg=f"{stem}:{k}"
            )


def test_corpus_python_decode_fallback(tmp_path, monkeypatch):
    """Without the native lib, the pure-Python decode path must feed the
    overlapped pipeline identically (incl. the int16 fast path)."""
    from auditory_tpu.io import native

    monkeypatch.setattr(native, "available", lambda: False)
    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path)
    r = CorpusRunner(cfg, SR, batch_size=2, transfer="auto")
    stats = r.run(wavs, str(tmp_path / "out"))
    assert stats.files_done == 4
    d = np.load(tmp_path / "out" / "c16_0.npz")
    assert d["mel_fbank_segment"].shape[1:] == (32, 14)


def test_corpus_transfer_dtype_f16(tmp_path):
    """transfer_dtype=float16 halves the device->host bytes; saved features
    are f16 and within half-precision tolerance of the f32 run."""
    import jax.numpy as jnp

    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path)
    r16 = CorpusRunner(cfg, SR, batch_size=4, transfer_dtype=jnp.float16)
    r32 = CorpusRunner(cfg, SR, batch_size=4)
    r16.run(wavs, str(tmp_path / "h"))
    r32.run(wavs, str(tmp_path / "f"))
    a = np.load(tmp_path / "h" / "c16_0.npz")
    b = np.load(tmp_path / "f" / "c16_0.npz")
    assert a["mel_fbank_segment"].dtype == np.float16
    # mel values are O(10) logs; f16 eps ~ 1e-3 relative
    np.testing.assert_allclose(
        a["mel_fbank_segment"].astype(np.float64),
        b["mel_fbank_segment"].astype(np.float64),
        rtol=2e-3, atol=2e-2,
    )


def test_corpus_mixed_bit_depths(tmp_path):
    """8/16-bit files take the int16 fast path; 24/32-bit fall back to the
    float path inside the same run (separate buckets, same outputs)."""
    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path, n=2, bit_depth=16)
    wavs += _mk_corpus(tmp_path, n=2, bit_depth=24)
    wavs += _mk_corpus(tmp_path, n=1, bit_depth=8)
    r = CorpusRunner(cfg, SR, batch_size=8, transfer="auto")
    stats = r.run(wavs, str(tmp_path / "out"))
    assert stats.files_done == 5
    assert stats.files_failed == 0
    files = {f for f in os.listdir(tmp_path / "out") if f.endswith(".npz")}
    assert len(files) == 5
    # a 24-bit and a 16-bit encoding of the same tone must agree on the
    # physics (hot mel band); the quiet bands read each encoding's own
    # quantization noise floor and legitimately differ (see CLAUDE.md)
    a = np.load(tmp_path / "out" / "c16_0.npz")["mel_fbank_segment"]
    b = np.load(tmp_path / "out" / "c24_0.npz")["mel_fbank_segment"]
    assert a.shape == b.shape
    band_a = int(a[0].mean(axis=1).argmax())
    band_b = int(b[0].mean(axis=1).argmax())
    assert band_a == band_b
    np.testing.assert_allclose(a[0, band_a], b[0, band_b], atol=1e-3)


def test_corpus_runner_matches_single_pipeline(tmp_path):
    """End-to-end guard on the packed/folded/trimmed transfer path: every
    npz the CorpusRunner writes must match a direct SndEnv run of the same
    file (same dtype), including the on/off fold reconstruction and the
    host-side segment counts."""
    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path, n=3)
    runner = CorpusRunner(cfg, SR, batch_size=2, transfer="float32")
    runner.run(wavs, str(tmp_path / "out"))
    env = SndEnv(cfg, SR, dtype=jnp.float32)
    from auditory_tpu.io.wav import load_wav

    for i, p in enumerate(wavs):
        d = np.load(tmp_path / "out" / f"c16_{i}.npz")
        w = load_wav(p)
        single = env.process(env.pad(w.sound_to_tensor(dtype=np.float32)))
        # f32 noise-floor values (log of ~1e-6 powers) legitimately differ
        # ~1e-3 between batch shapes; the fold/trim/segcount machinery is
        # guarded bit-exactly by test_packed_transfer_roundtrip below
        np.testing.assert_allclose(
            d["mel_fbank_segment"],
            np.asarray(single.mel_fbank_segment),
            atol=0.05, rtol=2e-3, err_msg=p,
        )
        np.testing.assert_allclose(
            d["gabor_kwta"],
            np.asarray(single.gabor_kwta),
            atol=0.1, rtol=5e-3, err_msg=p,
        )
        assert d["mel_fbank_segment"].shape[0] == single.mel_fbank_segment.shape[0]


def test_corpus_runner_4d_fold(tmp_path):
    """The on/off fold must also reconstruct the 4-D pooled gabor layout."""
    import dataclasses as dc

    cfg = dc.replace(default_cfg_2d(), gbor_out_pools_y=8, gbor_out_pools_x=2)
    wavs = _mk_corpus(tmp_path, n=2)
    runner = CorpusRunner(cfg, SR, batch_size=2, transfer="float32")
    stats = runner.run(wavs, str(tmp_path / "out"))
    assert stats.files_done == 2
    env = SndEnv(cfg, SR, dtype=jnp.float32)
    from auditory_tpu.io.wav import load_wav

    for i, p in enumerate(wavs):
        d = np.load(tmp_path / "out" / f"c16_{i}.npz")
        single = env.process(env.pad(load_wav(p).sound_to_tensor(dtype=np.float32)))
        np.testing.assert_allclose(
            d["gabor_kwta"], np.asarray(single.gabor_kwta),
            atol=0.1, rtol=5e-3, err_msg=p,
        )


def test_packed_transfer_roundtrip():
    """Bit-exact guard on PackedBatch: pack (with on/off fold) -> single
    buffer -> unpack must reproduce the unpacked program's outputs exactly
    (same dtype, same program, so no numeric slack is tolerated)."""
    import dataclasses as dc

    from auditory_tpu.pipeline.batch import PackedBatch

    for cfg in (
        default_cfg_2d(),
        dc.replace(default_cfg_2d(), gbor_out_pools_y=8, gbor_out_pools_x=2),
    ):
        e = SndEnv(
            cfg, SR, dtype=jnp.float32,
            outputs=("mel_fbank_segment", "gabor_kwta", "step_valid"),
        )
        sigs, batch, lengths = make_batch(e, [0.25, 0.4, 0.15])
        batch = batch.astype(np.float32)
        plain = BatchedSndEnv(e)
        packed_env = BatchedSndEnv(
            e, pack_keys=("mel_fbank_segment", "gabor_kwta")
        )
        out, sv = plain.process(batch, lengths)
        res = packed_env.process(batch, lengths)
        pb = res[0]
        assert isinstance(pb, PackedBatch)
        host = pb.unpack()
        np.testing.assert_array_equal(
            host["mel_fbank_segment"], np.asarray(out.mel_fbank_segment)
        )
        np.testing.assert_array_equal(
            host["gabor_kwta"], np.asarray(out.gabor_kwta)
        )
        # the fold really halved the gabor payload in the buffer
        ge = next(x for x in pb.entries if x.key == "gabor_kwta")
        full_cols = int(np.prod(host["gabor_kwta"].shape[2:]))
        assert ge.row_cols * 2 == full_cols
        # trim is a pure slice
        host3 = pb.trim(3).unpack()
        np.testing.assert_array_equal(
            host3["mel_fbank_segment"],
            host["mel_fbank_segment"][:, :3],
        )


def test_corpus_dispatch_failure_raises_not_hangs(tmp_path, monkeypatch):
    """If dispatch fails while the decode queue is full, run() must raise
    promptly -- the decode thread is drained, never left blocked on a full
    queue (code-review finding: join() deadlock)."""
    import threading

    cfg = default_cfg_2d()
    # more files than the decode queue bound (max(4*batch_size, 64))
    wavs = []
    for i in range(80):
        p = str(tmp_path / f"x{i}.wav")
        write_wav(p, float_to_wave(tone(500.0, 0.12, SR), SR))
        wavs.append(p)
    runner = CorpusRunner(cfg, SR, batch_size=1)
    monkeypatch.setattr(
        CorpusRunner, "_dispatch",
        lambda self, items, blen, add_ms: (_ for _ in ()).throw(
            RuntimeError("boom")),
    )
    result = {}

    def go():
        try:
            runner.run(wavs, str(tmp_path / "out"))
            result["outcome"] = "returned"
        except RuntimeError as e:
            result["outcome"] = f"raised:{e}"

    th = threading.Thread(target=go, daemon=True)
    th.start()
    th.join(timeout=60)
    assert not th.is_alive(), "run() hung after dispatch failure"
    assert result["outcome"] == "raised:boom"


def test_corpus_mel_dedup_exact(tmp_path):
    """The global-grid mel transfer + host expansion must be BIT-IDENTICAL
    to the per-segment transfer (both gather the same device-computed global
    mel; only where the gather happens differs)."""
    cfg = default_cfg_2d()
    wavs = _mk_corpus(tmp_path, n=4)
    r_on = CorpusRunner(cfg, SR, batch_size=4, transfer="float32")
    assert r_on._dedup_mel
    r_off = CorpusRunner(
        cfg, SR, batch_size=4, transfer="float32", dedup_mel=False
    )
    assert not r_off._dedup_mel
    r_on.run(wavs, str(tmp_path / "on"))
    r_off.run(wavs, str(tmp_path / "off"))
    for i in range(4):
        a = np.load(tmp_path / "on" / f"c16_{i}.npz")
        b = np.load(tmp_path / "off" / f"c16_{i}.npz")
        assert set(a.files) == set(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"c16_{i}:{k}")


def test_corpus_runner_spectrum_method_plumbs_through():
    r = CorpusRunner(default_cfg_2d(), SR, spectrum_method="factored")
    assert r.env.factored_plan is not None
    assert r.env.spectrum_method == "factored"


def test_process_local_single_process_equals_process():
    """BatchedSndEnv.process_local on a single-process mesh: the same SPMD
    code path the multi-process fabric runs (tests/test_multiprocess.py
    covers 2 OS processes; this covers the helper semantics in-process) --
    results equal process(), pad rows are inert and reported."""
    from auditory_tpu.parallel.distributed import (
        global_batch_from_local,
        is_multiprocess_mesh,
    )

    env = SndEnv(default_cfg_2d(), SR, dtype=jnp.float32, feature_stats=True)
    mesh = make_mesh()
    assert not is_multiprocess_mesh(mesh)
    benv = BatchedSndEnv(env, mesh=mesh)
    n = env.timing.segment_samples + env.timing.stride_samples
    rng = np.random.default_rng(3)
    b = 6  # not a multiple of 8 devices -> pad rows exercised
    signals = rng.normal(scale=0.1, size=(b, n)).astype(np.float32)
    lengths = np.full(b, n, dtype=np.int32)

    res, pad = benv.process_local(signals, lengths)
    out, seg_valid, stats = res
    assert pad == 2 and out.mel_fbank_segment.shape[0] == b + pad
    ref_out, ref_valid, ref_stats = benv.process(signals, lengths)
    np.testing.assert_array_equal(
        np.asarray(seg_valid)[:b], np.asarray(ref_valid)
    )
    np.testing.assert_array_equal(
        np.asarray(out.mel_fbank_segment)[:b],
        np.asarray(ref_out.mel_fbank_segment),
    )
    # pad rows are zero-length -> no valid segments, stats unchanged
    assert not np.asarray(seg_valid)[b:].any()
    for k in ("sum", "sumsq", "count"):
        np.testing.assert_allclose(
            np.asarray(stats[k]), np.asarray(ref_stats[k]), rtol=1e-6
        )

    # the production corpus tier through process_local: raw int16 rows +
    # on-device normalization (divisors) must equal process() too
    sig16 = np.clip(signals * 32767.0, -32768, 32767).astype(np.int16)
    divisors = np.full(b, 32767.0, dtype=np.float32)
    res16, pad16 = benv.process_local(sig16, lengths, divisors=divisors)
    ref16 = benv.process(sig16, lengths, divisors=divisors)
    assert pad16 == 2
    np.testing.assert_array_equal(
        np.asarray(res16[0].mel_fbank_segment)[:b],
        np.asarray(ref16[0].mel_fbank_segment),
    )

    # global_batch_from_local on one process == plain sharded device_put
    # (rows must divide over the local devices; process_local pads first)
    sig8 = np.concatenate([signals, signals[:2]])
    g = global_batch_from_local(mesh, sig8)
    assert g.shape == sig8.shape
    np.testing.assert_array_equal(np.asarray(g), sig8)

    # refused without a batch-sharded mesh
    with pytest.raises(ValueError, match="process_local"):
        BatchedSndEnv(env).process_local(signals, lengths)
