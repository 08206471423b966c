"""Multi-host corpus sharding: deterministic interleaved slices, per-shard
manifests/stats, exact merge equal to the single-run artifacts."""

import json
import os
import numpy as np

from auditory_tpu.pipeline.batch import CorpusRunner
from tests.conftest import default_cfg_2d, tone

SR = 16000


def _make_wavs(d, n=5, dither=0.0):
    from auditory_tpu.io.wav import float_to_wave, write_wav

    d.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        p = str(d / f"u{i}.wav")
        sig = tone(400.0 + 180 * i, 0.4, SR)
        if dither:
            # pure tones read the FFT noise floor in quiet mel bands,
            # which differs between frontends/transfer paths (CLAUDE.md
            # parity rule) -- dither when comparing across formulations
            sig = sig + dither * np.random.default_rng(i).standard_normal(
                len(sig)
            )
        write_wav(p, float_to_wave(sig, SR))
        paths.append(p)
    return paths


def test_sharded_run_merge_matches_full(tmp_path):
    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs")

    full_dir = tmp_path / "full"
    r = CorpusRunner(cfg, SR, batch_size=2)
    fstats = r.run(paths, str(full_dir))
    assert fstats.files_done == len(paths)

    shard_dir = tmp_path / "sharded"
    done = 0
    for i in range(2):  # "two hosts", run sequentially here
        r = CorpusRunner(cfg, SR, batch_size=2)
        s = r.run(paths, str(shard_dir), shard_index=i, num_shards=2)
        done += s.files_done
        assert os.path.exists(shard_dir / f"manifest.shard{i}of2.jsonl")
        assert os.path.exists(shard_dir / f"feature_stats.shard{i}of2.json")
    assert done == len(paths)

    summary = CorpusRunner.merge_shards(str(shard_dir))
    assert summary["files_ok"] == len(paths)
    assert summary["manifest_shards"] == 2

    # identical npz artifact set with identical contents
    full_npz = sorted(f for f in os.listdir(full_dir) if f.endswith(".npz"))
    shard_npz = sorted(
        f for f in os.listdir(shard_dir) if f.endswith(".npz")
    )
    assert shard_npz == full_npz and len(full_npz) == len(paths)
    for f in full_npz:
        a = dict(np.load(full_dir / f))
        b = dict(np.load(shard_dir / f))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=(f, k))

    # merged manifest covers every path exactly once
    recs = [
        json.loads(l)
        for l in (shard_dir / "manifest.jsonl").read_text().splitlines()
    ]
    assert sorted(r["path"] for r in recs) == sorted(paths)

    # merged feature stats equal the single-run stats. The merge of the
    # shard moment files is exact (f64 adds); shard-vs-full differ only by
    # the per-batch f32 device accumulation under different batch
    # compositions (~1e-6 rel)
    fs = json.loads((full_dir / "feature_stats.json").read_text())
    ms = json.loads((shard_dir / "feature_stats.json").read_text())
    assert ms["count_steps"] == fs["count_steps"]
    np.testing.assert_allclose(ms["mel_mean"], fs["mel_mean"], rtol=1e-4)
    np.testing.assert_allclose(ms["mel_std"], fs["mel_std"], rtol=1e-4,
                               atol=1e-5)


def test_shard_validation_and_resume(tmp_path):
    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=3)
    r = CorpusRunner(cfg, SR, batch_size=2)
    try:
        r.run(paths, str(tmp_path / "o"), shard_index=2, num_shards=2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # resume is per shard: a rerun of the same shard does nothing new
    out = tmp_path / "o2"
    r = CorpusRunner(cfg, SR, batch_size=2)
    s1 = r.run(paths, str(out), shard_index=0, num_shards=2)
    r = CorpusRunner(cfg, SR, batch_size=2)
    s2 = r.run(paths, str(out), shard_index=0, num_shards=2)
    assert s1.files_done == 2 and s2.files_done == 0


def test_cli_corpus_shard_and_merge(tmp_path, capsys):
    from auditory_tpu.cli import main

    _make_wavs(tmp_path / "wavs", n=4)
    out = tmp_path / "out"
    for i in range(2):
        rc = main(["corpus", "--glob", str(tmp_path / "wavs" / "*.wav"),
                   "--out", str(out), "--batch-size", "2",
                   "--shard", f"{i}/2"])
        assert rc == 0
    rc = main(["corpus-merge", str(out)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files_ok"] == 4
    assert (out / "manifest.jsonl").exists()
    assert (out / "feature_stats.json").exists()
    # bad shard spec is a clean rc=2
    assert main(["corpus", "--glob", str(tmp_path / "wavs" / "*.wav"),
                 "--out", str(out), "--shard", "nope"]) == 2


def test_resume_seeds_feature_stats(tmp_path):
    """A resumed run must produce the SAME corpus-wide stats as a single
    run (seeded from the prior file's raw moments), and a resume without
    prior moments must mark its stats partial."""
    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=4)

    full = tmp_path / "full"
    CorpusRunner(cfg, SR, batch_size=2).run(paths, str(full))
    fs = json.loads((full / "feature_stats.json").read_text())

    # two-stage run: first half, then resume with all paths
    part = tmp_path / "part"
    CorpusRunner(cfg, SR, batch_size=2).run(paths[:2], str(part))
    CorpusRunner(cfg, SR, batch_size=2).run(paths, str(part), resume=True)
    rs = json.loads((part / "feature_stats.json").read_text())
    assert "partial" not in rs
    assert rs["count_steps"] == fs["count_steps"]
    np.testing.assert_allclose(rs["mel_mean"], fs["mel_mean"], rtol=1e-4)

    # crash-style resume: manifest says files are done but no stats exist
    crash = tmp_path / "crash"
    CorpusRunner(cfg, SR, batch_size=2).run(paths[:2], str(crash))
    (crash / "feature_stats.json").unlink()
    CorpusRunner(cfg, SR, batch_size=2).run(paths, str(crash), resume=True)
    cs = json.loads((crash / "feature_stats.json").read_text())
    assert cs.get("partial") is True
    assert cs["count_steps"] < fs["count_steps"]
    from auditory_tpu.pipeline.dataset import FeatureDataset
    import pytest as _pytest
    with _pytest.raises(ValueError, match="partial"):
        FeatureDataset(str(crash)).normalizer()


def test_writer_failure_stops_dispatch_and_resume_completes(
    tmp_path, monkeypatch
):
    """A write-stage failure must stop the run promptly (no full-corpus
    compute for discarded results), surface the error, and leave a manifest
    a resumed run completes from."""
    import numpy as _np

    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=6)
    out = tmp_path / "o"

    real_savez = _np.savez
    calls = {"n": 0}

    def failing_savez(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise OSError("disk full (injected)")
        return real_savez(*a, **kw)

    monkeypatch.setattr(_np, "savez", failing_savez)
    r = CorpusRunner(cfg, SR, batch_size=2, feature_stats=False)
    try:
        r.run(paths, str(out))
        raise AssertionError("expected the injected OSError")
    except OSError:
        pass
    monkeypatch.setattr(_np, "savez", real_savez)

    ok = [
        json.loads(l)["path"]
        for l in (out / "manifest.jsonl").read_text().splitlines()
        if json.loads(l).get("status") == "ok"
    ]
    assert len(ok) < len(paths)  # it really stopped early
    r2 = CorpusRunner(cfg, SR, batch_size=2, feature_stats=False)
    s2 = r2.run(paths, str(out), resume=True)
    assert s2.files_done == len(paths) - len(ok)
    npz = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert len(npz) == len(paths)


def test_resume_rejects_stale_stats_coverage(tmp_path):
    """A stats file whose moments do not cover the manifest's full 'ok' set
    (an intervening run flushed more ok records, then crashed before the
    stats rewrite) must NOT be seeded from -- the result would silently
    miss those files' moments. files_covered pins the coverage."""
    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=4)
    out = tmp_path / "out"

    CorpusRunner(cfg, SR, batch_size=2).run(paths[:2], str(out))
    sp = out / "feature_stats.json"
    v1 = sp.read_text()
    assert json.loads(v1)["files_covered"] == 2

    CorpusRunner(cfg, SR, batch_size=2).run(paths[:3], str(out), resume=True)
    assert json.loads(sp.read_text())["files_covered"] == 3

    # simulate the crash: manifest says 3 ok, stats rolled back to v1 (2)
    sp.write_text(v1)
    CorpusRunner(cfg, SR, batch_size=2).run(paths, str(out), resume=True)
    final = json.loads(sp.read_text())
    assert final.get("partial") is True  # refused the stale seed
    assert final["files_covered"] == 1   # this run's moments only


def test_refused_stats_no_new_work_marked_partial(tmp_path):
    """Round-4 review finding: when the resume seed REFUSES the prior stats
    (coverage mismatch) and the todo set is EMPTY (no new moments), the
    stale file used to survive unmarked with rc 0. It must be stamped
    partial in place so consumers refuse it."""
    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=3)
    out = tmp_path / "out"

    CorpusRunner(cfg, SR, batch_size=2).run(paths[:2], str(out))
    sp = out / "feature_stats.json"
    v1 = sp.read_text()
    CorpusRunner(cfg, SR, batch_size=2).run(paths, str(out), resume=True)
    # crash simulation: manifest covers 3 ok files, stats rolled back to 2
    sp.write_text(v1)

    # resume over the SAME 3 files: nothing to do, but the stale stats
    # must not survive unmarked
    stats = CorpusRunner(cfg, SR, batch_size=2).run(
        paths, str(out), resume=True
    )
    assert stats.files_done == 0
    marked = json.loads(sp.read_text())
    assert marked.get("partial") is True
    # the raw moments are untouched (still usable for manual repair)
    assert marked["files_covered"] == json.loads(v1)["files_covered"]


def test_save_global_grid_key(tmp_path):
    """mel_fbank_global in save_keys: rows are GLOBAL WINDOWS, not
    segments -- the per-file trim must keep the full deduped grid (round-4
    review finding: it was sliced to n_seg rows)."""
    import jax.numpy as jnp

    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = default_cfg_2d()
    paths = _make_wavs(tmp_path / "wavs", n=3, dither=1e-3)
    out = tmp_path / "out"
    # f64 both sides: the batched program pads to a different signal length
    # than the single run, and f32 conv rounding differs across shapes --
    # log-mel amplifies that at near-cancellation bins (same reason
    # test_batch_matches_single compares in f64)
    CorpusRunner(
        cfg, SR, batch_size=2, save_keys=("mel_fbank_global",),
        feature_stats=False, transfer="float32", dtype=jnp.float64,
    ).run(paths, str(out))

    env = SndEnv(cfg, SR, dtype=jnp.float64,
                 outputs=("mel_fbank_global",))
    from auditory_tpu.io.wav import load_wav

    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        got = np.load(out / f"{stem}.npz")["mel_fbank_global"]
        w = load_wav(p)
        # the runner's transfer='float32' decodes f32 samples; feed the
        # single run the identical quantized input
        sig = w.sound_to_tensor(dtype=np.float32).astype(np.float64)
        single = np.asarray(
            env.process(env.pad(sig)).mel_fbank_global
        )
        assert got.shape == single.shape, (got.shape, single.shape)
        np.testing.assert_allclose(got, single, atol=1e-9, rtol=1e-9)


def test_cli_corpus_frontend_flag(tmp_path):
    """cli corpus --frontend plumbs spectrum_method through CorpusRunner
    (round-4 review finding: the flag existed only on 'process')."""
    from auditory_tpu.cli import main

    paths = _make_wavs(tmp_path / "wavs", n=2, dither=1e-3)
    out_a, out_b = tmp_path / "auto", tmp_path / "frames"
    # --f64: cross-FORMULATION comparisons (fft vs frames) at f32 diverge
    # in near-cancellation log-mel bins; at f64 they agree to ~1e-10
    for sel, o in (("auto", out_a), ("frames", out_b)):
        rc = main(["corpus", "--glob", str(tmp_path / "wavs" / "*.wav"),
                   "--out", str(o), "--batch-size", "2", "--f64",
                   "--frontend", sel])
        assert rc == 0
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        a = np.load(out_a / f"{stem}.npz")["mel_fbank_segment"]
        b = np.load(out_b / f"{stem}.npz")["mel_fbank_segment"]
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_iter_device_features_mirrors_frontend(tmp_path):
    """The lazy device-resident env must run the frontend the runner was
    constructed with (round-4 review finding: it silently rebuilt with
    the default dispatch)."""
    paths = _make_wavs(tmp_path / "wavs", n=2)
    r = CorpusRunner(default_cfg_2d(), SR, batch_size=2,
                     save_keys=("mel_fbank_segment",),
                     spectrum_method="windowed", feature_stats=False)
    batches = list(r.iter_device_features(paths))
    assert batches, "no batches yielded"
    assert r._batched_dev.env.spectrum_method == "windowed"


def test_empty_shard_writes_zero_stats_and_merges(tmp_path):
    """A shard whose interleaved slice is empty (more hosts than files)
    must still write its stats shard -- zero moments merge exactly and
    merge_shards enforces a complete 0..N-1 set (a missing file would
    fail the whole multi-host merge)."""
    paths = _make_wavs(tmp_path / "w", n=3)
    out = str(tmp_path / "o")
    for i in range(5):  # shards 3 and 4 get no files
        r = CorpusRunner(default_cfg_2d(), SR, batch_size=2)
        s = r.run(paths, out, shard_index=i, num_shards=5)
        assert os.path.exists(
            os.path.join(out, f"feature_stats.shard{i}of5.json")
        )
        if i >= 3:
            assert s.files_done == 0
            with open(os.path.join(
                out, f"feature_stats.shard{i}of5.json"
            )) as f:
                z = json.load(f)
            assert z["count_steps"] == 0.0
            assert not any(z["mel_sum"]) and z["files_covered"] == 0

    summary = CorpusRunner.merge_shards(out)
    assert summary["files_ok"] == 3 and summary["manifest_shards"] == 5
    with open(os.path.join(out, "feature_stats.json")) as f:
        ms = json.load(f)
    # zero shards contribute nothing: stats equal a single-process run
    ref = str(tmp_path / "ref")
    CorpusRunner(default_cfg_2d(), SR, batch_size=2).run(paths, ref)
    with open(os.path.join(ref, "feature_stats.json")) as f:
        fs = json.load(f)
    assert ms["count_steps"] == fs["count_steps"]
    np.testing.assert_allclose(ms["mel_mean"], fs["mel_mean"], rtol=1e-4)


def test_empty_rerun_overwrites_stale_shard_stats(tmp_path):
    """A no-resume rerun of a shard whose slice became empty must
    OVERWRITE its previously written moments with zeros: gating on file
    existence would let stale moments silently join the merge."""
    paths = _make_wavs(tmp_path / "w", n=3)
    out = str(tmp_path / "o")
    r = CorpusRunner(default_cfg_2d(), SR, batch_size=2)
    r.run(paths, out, shard_index=2, num_shards=3)  # 1 real file
    sp = os.path.join(out, "feature_stats.shard2of3.json")
    with open(sp) as f:
        assert json.load(f)["count_steps"] > 0

    # the corpus list shrinks; shard 2's slice is now empty
    r2 = CorpusRunner(default_cfg_2d(), SR, batch_size=2)
    s = r2.run(paths[:2], out, shard_index=2, num_shards=3, resume=False)
    assert s.files_done == 0
    with open(sp) as f:
        z = json.load(f)
    assert z["count_steps"] == 0.0 and not any(z["mel_sum"])
