"""int8 quantized transfer: error bounds, exact-zero/sign/NaN preservation,
trim interaction, and the corpus runner end to end."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.config import KWTAParams
from auditory_tpu.pipeline.batch import (
    BatchedSndEnv,
    CorpusRunner,
    PackedBatch,
    _quantize_int8,
    bucket_length,
)
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


def _batch(n=3, dur=0.45):
    sigs = [
        tone(500.0 + 400 * i, dur, SR, amp=0.3 + 0.1 * i).astype(np.float32)
        for i in range(n)
    ]
    return sigs


def _packed_pair(cfg, keys, n=3):
    """(int8 PackedBatch unpacked, float32 reference unpacked)."""
    env = SndEnv(cfg, SR, outputs=keys + ("step_valid",))
    sigs = [env.pad(s) for s in _batch(n)]
    blen = bucket_length(max(len(s) for s in sigs), env.timing)
    batch = np.zeros((n, blen), np.float32)
    lengths = np.zeros(n, np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    outs = {}
    for td in (jnp.int8, None):
        b = BatchedSndEnv(env, transfer_dtype=td, pack_keys=keys)
        packed, *_ = b.process(batch, lengths)
        assert isinstance(packed, PackedBatch)
        if td is not None:
            assert np.asarray(packed.data).dtype == np.int8
        outs[td] = packed.unpack()
    return outs[jnp.int8], outs[None]


def test_quantize_roundtrip_bounds():
    """Direct unit check: dequantized error <= half a step per channel;
    NaN and exact zero preserved."""
    r = np.random.default_rng(5)
    a = r.standard_normal((2, 4, 6, 10)).astype(np.float32) * 3.0 + 1.0
    a[0, 1, 2, 3] = np.nan
    a[1, 0, 0, :] = 0.0
    # a is [B=2, rows=4, view=(6, 10)]; channel axis 0 of the view (the 6)
    q, scale, off = (np.asarray(x) for x in _quantize_int8(jnp.asarray(a), 0, False))
    assert q.dtype == np.int8 and scale.shape == (6,)
    deq = q.astype(np.float32) * scale[None, None, :, None] + off[None, None, :, None]
    deq = np.where(q == -128, np.nan, deq)
    assert np.isnan(deq[0, 1, 2, 3])
    fin = np.isfinite(a)
    step = np.broadcast_to(scale[None, None, :, None], a.shape)
    assert np.all(np.abs(deq[fin] - a[fin]) <= step[fin] / 2 + 1e-7)

    # symmetric: exact zeros stay exactly zero, signs never flip
    qs, ss, os_ = (np.asarray(x) for x in _quantize_int8(jnp.asarray(a), 0, True))
    assert np.all(os_ == 0)
    deqs = qs.astype(np.float32) * ss[None, None, :, None]
    assert np.all(deqs[a == 0] == 0)
    fin = np.isfinite(a)
    assert np.all(np.sign(deqs[fin]) * np.sign(a[fin]) >= 0)


def test_packed_int8_close_to_float():
    """End-to-end packed pipeline: int8 vs float32 within the per-channel
    quantization step for every key, including the folded gabor."""
    cfg = default_cfg_2d(kwta=KWTAParams(on=True))
    keys = ("mel_fbank_segment", "mfcc_segment", "energy", "gabor_kwta")
    qh, fh = _packed_pair(cfg, keys)
    assert set(qh) == set(fh)
    for k in keys:
        a, b = qh[k], fh[k]
        assert a.shape == b.shape, k
        fin = np.isfinite(b)
        assert np.array_equal(np.isfinite(a), fin), k
        rng_ = np.nanmax(b) - np.nanmin(b)
        # affine bound: range/508 per channel; channel ranges are <= the
        # global range, so the global bound holds a fortiori
        tol = max(rng_ / 254.0, 1e-6)
        assert np.max(np.abs(a[fin] - b[fin])) <= tol, k
    # gabor sparsity preserved: exact zeros stay exactly zero (the converse
    # needn't hold -- a sub-half-step value legitimately rounds to 0)
    g_q, g_f = qh["gabor_kwta"], fh["gabor_kwta"]
    assert np.all(g_q[g_f == 0] == 0)
    assert (g_q == 0).mean() >= (g_f == 0).mean()


def test_trim_keeps_qmeta():
    """Device-side trim must preserve the scales trailer."""
    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment",)
    env = SndEnv(cfg, SR, outputs=keys + ("step_valid",))
    sigs = [env.pad(s) for s in _batch(2, dur=0.8)]
    blen = bucket_length(max(len(s) for s in sigs), env.timing)
    batch = np.zeros((2, blen), np.float32)
    lengths = np.array([len(sigs[0]), len(sigs[0]) // 2], np.int32)
    batch[0, : len(sigs[0])] = sigs[0]
    batch[1, : len(sigs[1]) // 2] = sigs[1][: len(sigs[1]) // 2]
    b = BatchedSndEnv(env, transfer_dtype="int8", pack_keys=keys)
    packed, *_ = b.process(batch, lengths)
    full = packed.unpack()["mel_fbank_segment"]
    trimmed = packed.trim(2).unpack()["mel_fbank_segment"]
    assert trimmed.shape[1] == 2
    np.testing.assert_array_equal(trimmed, full[:, :2])


def test_int8_requires_packed_mode():
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR)
    with pytest.raises(ValueError, match="int8"):
        BatchedSndEnv(env, transfer_dtype="int8")


def test_corpus_runner_int8(tmp_path):
    """CorpusRunner end to end with quantized transfer: outputs close to the
    float32 run, manifest intact."""
    from auditory_tpu.io.wav import float_to_wave, write_wav

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    paths = []
    for i in range(3):
        p = str(wav_dir / f"t{i}.wav")
        write_wav(p, float_to_wave(tone(600.0 + 250 * i, 0.5, SR), SR))
        paths.append(p)

    cfg = default_cfg_2d()
    outs = {}
    for tag, td in (("q", "int8"), ("f", None)):
        out_dir = tmp_path / tag
        runner = CorpusRunner(
            cfg, SR, batch_size=2, transfer_dtype=td, feature_stats=False
        )
        stats = runner.run(paths, str(out_dir))
        assert stats.files_done == 3 and stats.files_failed == 0
        outs[tag] = {
            os.path.basename(p): dict(np.load(out_dir / (f"t{i}.npz")))
            for i, p in enumerate(paths)
        }
        manifest = [
            json.loads(l)
            for l in (out_dir / "manifest.jsonl").read_text().splitlines()
        ]
        assert sum(m["status"] == "ok" for m in manifest) == 3
    for fname, frec in outs["f"].items():
        qrec = outs["q"][fname]
        assert set(qrec) == set(frec)
        for k, fv in frec.items():
            qv = qrec[k]
            assert qv.shape == fv.shape
            fin = np.isfinite(fv)
            rng_ = np.nanmax(fv) - np.nanmin(fv) if fv.size else 0.0
            tol = max(rng_ / 254.0, 1e-6)
            assert np.max(np.abs(qv[fin] - fv[fin]), initial=0.0) <= tol, (
                fname, k,
            )


def test_per_row_scales_isolate_cotenants():
    """A near-silent utterance batched with a loud one must keep ITS OWN
    quantization precision (per-row scales): error bounded by the quiet
    row's range, not the batch range."""
    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment",)
    env = SndEnv(cfg, SR, outputs=keys + ("step_valid",))
    loud = env.pad(tone(800.0, 0.4, SR, amp=0.9).astype(np.float32))
    quiet = env.pad(
        (tone(800.0, 0.4, SR, amp=0.9) * 1e-3).astype(np.float32)
    )
    blen = bucket_length(len(loud), env.timing)
    batch = np.zeros((2, blen), np.float32)
    batch[0, : len(loud)] = loud
    batch[1, : len(quiet)] = quiet
    lengths = np.array([len(loud), len(quiet)], np.int32)

    def unpacked(td):
        b = BatchedSndEnv(env, transfer_dtype=td, pack_keys=keys)
        packed, *_ = b.process(batch, lengths)
        return packed.unpack()["mel_fbank_segment"]

    q, f = unpacked(jnp.int8), unpacked(None)
    for i in range(2):
        fin = np.isfinite(f[i])
        own_range = np.nanmax(f[i]) - np.nanmin(f[i])
        tol = max(own_range / 254.0, 1e-6)
        assert np.max(np.abs(q[i][fin] - f[i][fin])) <= tol, i


def test_merge_guard_rails(tmp_path):
    """merge_shards refuses mixed-generation and incomplete shard sets and
    dedups re-appended records."""
    d = tmp_path
    rec = lambda p: json.dumps({"path": p, "status": "ok"}) + "\n"
    (d / "manifest.shard0of2.jsonl").write_text(rec("a") + rec("a"))
    with pytest.raises(ValueError, match="missing shard"):
        CorpusRunner.merge_shards(str(d))
    (d / "manifest.shard1of2.jsonl").write_text(rec("b"))
    (d / "manifest.shard0of3.jsonl").write_text(rec("c"))
    with pytest.raises(ValueError, match="mixed shard generations"):
        CorpusRunner.merge_shards(str(d))
    (d / "manifest.shard0of3.jsonl").unlink()
    summary = CorpusRunner.merge_shards(str(d))
    assert summary["files_ok"] == 2  # 'a' deduped to one record
    lines = (d / "manifest.jsonl").read_text().splitlines()
    assert len(lines) == 2
