"""Online (streaming) processing must match the offline pipeline exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.pipeline.online import OnlineSndEnv
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


def chunks_of(sig, rng, lo=160, hi=7000):
    i = 0
    while i < len(sig):
        n = int(rng.integers(lo, hi))
        yield sig[i : i + n]
        i += n


@pytest.mark.parametrize("dur", [0.25, 0.4, 1.13])
def test_online_matches_offline(dur):
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(1234.0, dur, SR)
    offline = env.process(env.pad(sig))
    n_off = offline.power_segment.shape[0]

    online = OnlineSndEnv(cfg, SR, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    got = {}
    for chunk in chunks_of(sig, rng):
        for k, out in online.feed(chunk):
            got[k] = out
    for k, out in online.flush():
        got[k] = out

    assert len(got) == n_off, (len(got), n_off)
    for k in range(n_off):
        np.testing.assert_allclose(
            np.asarray(got[k].mel_fbank_segment),
            np.asarray(offline.mel_fbank_segment[k]),
            atol=1e-9, err_msg=f"segment {k}",
        )
        np.testing.assert_allclose(
            np.asarray(got[k].mfcc_deltas),
            np.asarray(offline.mfcc_deltas[k]),
            atol=1e-9, rtol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(got[k].gabor_raw),
            np.asarray(offline.gabor_raw[k]),
            atol=1e-5,
        )


def test_online_single_sample_chunks():
    """Pathological chunking (1..17 samples) still yields identical results."""
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(700.0, 0.22, SR)
    offline = env.process(env.pad(sig))

    online = OnlineSndEnv(cfg, SR, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    got = {}
    for chunk in chunks_of(sig, rng, lo=1, hi=17):
        for k, out in online.feed(chunk):
            got[k] = out
    for k, out in online.flush():
        got[k] = out
    assert len(got) == offline.power_segment.shape[0]
    np.testing.assert_allclose(
        np.asarray(got[0].mel_fbank_segment),
        np.asarray(offline.mel_fbank_segment[0]),
        atol=1e-9,
    )


def test_online_bounded_memory():
    cfg = default_cfg_2d()
    online = OnlineSndEnv(cfg, SR)
    sig = tone(500.0, 2.0, SR)
    n_out = 0
    for chunk in np.array_split(sig, 40):
        for _ in online.feed(chunk):
            n_out += 1
    # buffer never exceeds one segment span + one chunk
    assert len(online._buf) <= online._span + len(sig) // 40 + 1
    assert n_out >= 18


def test_online_edge_stream_3210():
    """The review's repro: 3210 samples must give the same segment count as
    offline (2), and flush must be idempotent / close the stream."""
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(640.0, 3210 / SR, SR)[:3210]
    offline = env.process(env.pad(sig))
    online = OnlineSndEnv(cfg, SR, dtype=jnp.float64)
    got = dict(online.feed(sig))
    got.update(dict(online.flush()))
    assert len(got) == offline.power_segment.shape[0] == 2
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k].mel_fbank_segment),
            np.asarray(offline.mel_fbank_segment[k]), atol=1e-9,
        )
    # second flush: nothing; feed after flush: error
    assert list(online.flush()) == []
    with pytest.raises(RuntimeError):
        list(online.feed(np.zeros(10)))


def test_online_feed_eager_append():
    """Samples must be buffered even when the iterator is not consumed."""
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(500.0, 0.4, SR)
    offline = env.process(env.pad(sig))
    online = OnlineSndEnv(cfg, SR, dtype=jnp.float64)
    online.feed(sig[:3000])  # iterator dropped on purpose
    got = dict(online.feed(sig[3000:]))
    got.update(dict(online.flush()))
    assert len(got) == offline.power_segment.shape[0]
    np.testing.assert_allclose(
        np.asarray(got[0].mel_fbank_segment),
        np.asarray(offline.mel_fbank_segment[0]), atol=1e-9,
    )


def test_multistream_matches_offline():
    """N concurrent streams through one batched program: every stream's
    segments must equal its own offline run exactly (the single-stream
    equivalence, preserved under batching)."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    durs = [0.33, 0.21, 0.57]
    sigs = [tone(500.0 + 400 * i, d, SR) for i, d in enumerate(durs)]
    offline = [env.process(env.pad(s)) for s in sigs]

    ms = MultiStreamOnline(cfg, SR, n_streams=3, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    cursors = [0, 0, 0]
    got = {i: {} for i in range(3)}

    def collect(results):
        for i, k, out in results:
            got[i][k] = out

    # interleave feeding the three streams in random chunk sizes
    while any(c < len(s) for c, s in zip(cursors, sigs)):
        i = int(rng.integers(0, 3))
        if cursors[i] >= len(sigs[i]):
            continue
        n = int(rng.integers(200, 4000))
        ms.feed(i, sigs[i][cursors[i] : cursors[i] + n])
        cursors[i] += n
        collect(ms.poll())
    for i in range(3):
        ms.close(i)
    collect(list(ms.drain()))

    for i in range(3):
        n_off = offline[i].power_segment.shape[0]
        assert len(got[i]) == n_off, (i, len(got[i]), n_off)
        for k in range(n_off):
            np.testing.assert_allclose(
                got[i][k]["mel_fbank_segment"],
                np.asarray(offline[i].mel_fbank_segment[k]),
                atol=1e-9, err_msg=f"stream {i} segment {k}",
            )
            np.testing.assert_allclose(
                got[i][k]["gabor_raw"],
                np.asarray(offline[i].gabor_raw[k]),
                atol=1e-5,
            )


def test_multistream_feed_after_close_raises():
    from auditory_tpu.pipeline.online import MultiStreamOnline

    ms = MultiStreamOnline(default_cfg_2d(), SR, n_streams=2)
    ms.feed(0, np.zeros(100, np.float32))
    ms.close(0)
    with pytest.raises(RuntimeError):
        ms.feed(0, np.zeros(10, np.float32))
    # the other stream is unaffected
    ms.feed(1, np.zeros(100, np.float32))


@pytest.mark.parametrize("td", ["float16", "int8"])
def test_multistream_transfer_tiers(td):
    """Serving transfer tiers: f16 / int8 poll copies stay within their
    documented error of the f32 poll, stream state semantics unchanged."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment", "gabor_kwta", "step_valid")
    sig = tone(900.0, 0.5, SR).astype(np.float32)

    def run(transfer):
        ms = MultiStreamOnline(cfg, SR, n_streams=2, outputs=keys,
                               transfer_dtype=transfer)
        for s in range(2):
            ms.feed(s, sig * (1.0 if s == 0 else 0.5))
        got = {}
        for s in range(2):
            ms.close(s)
        for i, k, out in ms.drain():
            got[(i, k)] = out
        return got

    ref = run(None)
    tier = run(td)
    assert set(tier) == set(ref)
    for sk, rout in ref.items():
        tout = tier[sk]
        np.testing.assert_array_equal(tout["step_valid"], rout["step_valid"])
        for key in ("mel_fbank_segment", "gabor_kwta"):
            a, b = tout[key], rout[key]
            assert a.shape == b.shape
            rng_ = float(np.nanmax(b) - np.nanmin(b)) if b.size else 0.0
            if td == "float16":
                tol = max(1e-3 * float(np.nanmax(np.abs(b)) or 1.0), 1e-6)
            else:
                tol = max(rng_ / 254.0, 1e-6)
            fin = np.isfinite(b)
            assert np.array_equal(np.isfinite(a), fin)
            assert np.max(np.abs(a[fin] - b[fin]), initial=0.0) <= tol, (
                sk, key,
            )


def test_multistream_mesh_sharded():
    """Stream-axis DP over the virtual mesh: identical results to the
    unsharded run; batch-multiple validation enforced."""
    import pytest as _pytest

    from auditory_tpu.parallel.mesh import make_mesh
    from auditory_tpu.pipeline.online import MultiStreamOnline

    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8  # conftest forces the 8-device CPU mesh
    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment", "gabor_raw", "step_valid")
    sigs = [tone(400.0 + 130 * i, 0.4, SR).astype(np.float32)
            for i in range(n_dev)]

    def run(mesh_arg):
        # f64: the SPMD-partitioned conv reassociates at ulp level, which
        # quiet log-mel bins amplify (same property as
        # test_batch_sharding.test_sharded_matches_unsharded)
        ms = MultiStreamOnline(cfg, SR, n_streams=n_dev, outputs=keys,
                               dtype=jnp.float64, mesh=mesh_arg)
        for s in range(n_dev):
            ms.feed(s, sigs[s])
            ms.close(s)
        return {(i, k): out for i, k, out in ms.drain()}

    ref, shd = run(None), run(mesh)
    assert set(ref) == set(shd) and len(ref) > 0
    for sk in ref:
        np.testing.assert_array_equal(shd[sk]["step_valid"],
                                      ref[sk]["step_valid"])
        for key in ("mel_fbank_segment", "gabor_raw"):
            np.testing.assert_allclose(shd[sk][key], ref[sk][key],
                                       atol=1e-9, err_msg=f"{sk} {key}")

    with _pytest.raises(ValueError, match="multiple of the mesh"):
        MultiStreamOnline(cfg, SR, n_streams=n_dev + 1, mesh=mesh)


def test_online_short_stream_matches_offline():
    """Streams shorter than one segment (including empty) must emit exactly
    the offline pipeline's segments on the padded signal -- the SegCnt
    Go-truncation quirk yields ONE masked segment, not zero."""
    from auditory_tpu.pipeline.online import MultiStreamOnline, OnlineSndEnv

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    for n in (0, 100, 1500):
        sig = tone(700.0, 1.0, SR)[:n]
        offline = env.process(env.pad(sig))
        n_off = offline.mel_fbank_segment.shape[0]

        online = OnlineSndEnv(cfg, SR, dtype=jnp.float64,
                              spectrum_method="fft")
        if n:
            assert sum(1 for _ in online.feed(sig)) == 0
        got = list(online.flush())
        assert len(got) == n_off, (n, len(got), n_off)
        for k, (seg_idx, out) in enumerate(got):
            np.testing.assert_allclose(
                np.asarray(out.mel_fbank_segment),
                np.asarray(offline.mel_fbank_segment[k]), atol=1e-9,
                err_msg=f"n={n} seg {k}",
            )

        ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                               spectrum_method="fft")
        if n:
            ms.feed(0, sig)
        ms.close(0)
        drained = list(ms.drain())
        assert len(drained) == n_off, (n, len(drained), n_off)


def test_online_rejects_mel_fbank_global():
    from auditory_tpu.pipeline.online import OnlineSndEnv

    with pytest.raises(ValueError, match="mel_fbank_global"):
        OnlineSndEnv(default_cfg_2d(), SR,
                     outputs=("mel_fbank_global", "step_valid"))


def test_multistream_overflow_error_backpressure():
    """Bounded buffers + overflow='error': the overrunning feed raises
    BufferOverflow, leaves the stream consistent, and polling frees space."""
    from auditory_tpu.pipeline.online import BufferOverflow, MultiStreamOnline

    cfg = default_cfg_2d()
    # max_buffer_seconds=0 clamps to the minimum legal capacity (one span)
    ms = MultiStreamOnline(cfg, SR, n_streams=2, max_buffer_seconds=0.0,
                           overflow="error")
    assert ms._cap == ms._span
    ms.feed(0, np.zeros(ms._cap, np.float32))
    with pytest.raises(BufferOverflow, match="stream 0"):
        ms.feed(0, np.ones(1, np.float32))
    # the failed feed changed nothing
    assert ms.pending_samples(0) == ms._cap
    assert ms.dropped_segments(0) == 0
    # backpressure resolves by polling: a segment drains, space frees
    got = ms.poll()
    assert [i for i, _, _ in got] == [0]
    assert ms.pending_samples(0) < ms._cap
    ms.feed(0, np.zeros(ms._cap - ms.pending_samples(0), np.float32))
    # the other stream was never affected
    ms.feed(1, np.zeros(100, np.float32))


def test_multistream_drop_oldest_skips_exact_segments():
    """overflow='drop_oldest': oldest audio is discarded in whole-segment
    strides; surviving segments are emitted with their TRUE indices and are
    bit-identical to the offline run's same-index segments."""
    from auditory_tpu.pipeline.online import MultiStreamOnline
    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(800.0, 1.5, SR)
    offline = env.process(env.pad(sig))
    n_off = offline.mel_fbank_segment.shape[0]

    ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                           max_buffer_seconds=0.0, overflow="drop_oldest")
    # feed everything with NO polling: only the newest ~cap samples survive
    for chunk in np.array_split(sig, 23):
        ms.feed(0, chunk)
        assert ms.pending_samples(0) <= ms._cap
    dropped = ms.dropped_segments(0)
    assert dropped > 0
    got = {}
    while True:
        res = ms.poll()
        if not res:
            break
        for _, k, out in res:
            got[k] = out
    ms.close(0)
    for _, k, out in ms.drain():
        got[k] = out
    ks = sorted(got)
    # indices skip exactly the dropped prefix and reach the offline tail
    assert ks == list(range(dropped, n_off))
    for k in ks:
        np.testing.assert_allclose(
            np.asarray(got[k]["mel_fbank_segment"]),
            np.asarray(offline.mel_fbank_segment[k]),
            atol=1e-9, err_msg=f"segment {k}",
        )


def test_multistream_unbounded_ring_growth():
    """max_buffer_seconds=None: the ring grows geometrically (all streams
    re-laid-out) and results still match offline exactly."""
    from auditory_tpu.pipeline.online import MultiStreamOnline
    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sigs = [tone(600.0, 1.0, SR), tone(900.0, 0.3, SR)]
    offline = [env.process(env.pad(s)) for s in sigs]

    ms = MultiStreamOnline(cfg, SR, n_streams=2, dtype=jnp.float64,
                           max_buffer_seconds=None)
    init_cap = ms._cap
    ms.feed(1, sigs[1])       # stream 1 mid-fill when the ring grows
    ms.feed(0, sigs[0])       # 16000 samples > 2*span forces growth
    assert ms._cap > init_cap
    ms.close(0)
    ms.close(1)
    got = {0: {}, 1: {}}
    for i, k, out in ms.drain():
        got[i][k] = out
    for i in range(2):
        n_off = offline[i].mel_fbank_segment.shape[0]
        assert sorted(got[i]) == list(range(n_off))
        for k in range(n_off):
            np.testing.assert_allclose(
                np.asarray(got[i][k]["mel_fbank_segment"]),
                np.asarray(offline[i].mel_fbank_segment[k]),
                atol=1e-9, err_msg=f"stream {i} segment {k}",
            )


def test_multistream_mesh_with_transfer_tier():
    """Mesh sharding composes with the f16 serving tier."""
    from auditory_tpu.parallel.mesh import make_mesh
    from auditory_tpu.pipeline.online import MultiStreamOnline

    mesh = make_mesh()
    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment", "step_valid")
    sig = tone(1000.0, 0.4, SR).astype(np.float32)

    def run(mesh_arg):
        ms = MultiStreamOnline(cfg, SR, n_streams=mesh.devices.size,
                               outputs=keys, transfer_dtype="float16",
                               mesh=mesh_arg)
        for s in range(ms.n_streams):
            ms.feed(s, sig)
            ms.close(s)
        return {(i, k): out for i, k, out in ms.drain()}

    ref, shd = run(None), run(mesh)
    assert set(ref) == set(shd) and len(ref) > 0
    for sk in ref:
        np.testing.assert_allclose(
            shd[sk]["mel_fbank_segment"], ref[sk]["mel_fbank_segment"],
            # one f16 ulp at log-mel magnitude ~10 (0.0078): the sharded
            # conv's f32-ulp reassociation can flip the f16 rounding side
            atol=1e-2,
        )


def test_multistream_drop_oldest_single_giant_chunk():
    """One feed() chunk several times the ring capacity: only its tail can
    survive (online.py::feed's len(data) > cap path). The drop count and the
    surviving segments must be identical to feeding the same audio in small
    chunks -- true indices, bit-identical to offline."""
    from auditory_tpu.pipeline.online import MultiStreamOnline
    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(800.0, 1.5, SR)
    offline = env.process(env.pad(sig))
    n_off = offline.mel_fbank_segment.shape[0]

    def run(chunks):
        ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                               max_buffer_seconds=0.0,
                               overflow="drop_oldest")
        assert ms._cap < len(sig) / 3  # the single chunk IS > cap
        for c in chunks:
            ms.feed(0, c)
        got = {}
        while True:
            res = ms.poll()
            if not res:
                break
            for _, k, out in res:
                got[k] = out
        ms.close(0)
        for _, k, out in ms.drain():
            got[k] = out
        return ms.dropped_segments(0), got

    d1, got1 = run([sig])                      # one giant chunk
    d2, got2 = run(np.array_split(sig, 23))    # same audio, small chunks
    assert d1 == d2 > 0
    assert sorted(got1) == sorted(got2) == list(range(d1, n_off))
    for k in got1:
        np.testing.assert_allclose(
            np.asarray(got1[k]["mel_fbank_segment"]),
            np.asarray(offline.mel_fbank_segment[k]), atol=1e-9,
        )


def test_online_flush_closes_eagerly():
    """flush() must close the stream AT CALL TIME, not on first iteration of
    the returned generator: a dropped iterator still ends the stream, and
    feeding after flush raises (review finding, confirmed by repro)."""
    cfg = default_cfg_2d()
    online = OnlineSndEnv(cfg, SR, dtype=jnp.float64)
    online.feed(tone(500.0, 0.15, SR))
    it = online.flush()  # NOT iterated yet
    with pytest.raises(RuntimeError):
        list(online.feed(np.zeros(100)))
    # the un-iterated generator still drains the frozen-at-flush stream
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    offline = env.process(env.pad(tone(500.0, 0.15, SR)))
    got = dict(it)
    assert len(got) == offline.power_segment.shape[0]
    np.testing.assert_allclose(
        np.asarray(got[0].mel_fbank_segment),
        np.asarray(offline.mel_fbank_segment[0]), atol=1e-9,
    )


def test_online_rejects_feature_stats():
    """feature_stats is a corpus-level reduction; the online paths would
    compute and silently discard it every poll (review finding)."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    with pytest.raises(ValueError, match="feature_stats"):
        OnlineSndEnv(default_cfg_2d(), SR, feature_stats=True)
    with pytest.raises(ValueError, match="feature_stats"):
        MultiStreamOnline(default_cfg_2d(), SR, n_streams=2,
                          feature_stats=True)


def test_multistream_f16_saturates_instead_of_inf():
    """float16 poll transfers must saturate out-of-range values (DC power
    at full scale is (win)^2 = 160k > f16 max 65504), never ship inf."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    keys = ("power_segment", "step_valid")
    ms = MultiStreamOnline(cfg, SR, n_streams=1, outputs=keys,
                           transfer_dtype="float16")
    ms.feed(0, np.ones(ms._post + ms.env.timing.stride_samples, np.float32))
    res = ms.poll()
    assert res
    p = res[0][2]["power_segment"]
    assert np.isfinite(p).all()
    assert p.max() == np.float16(65504.0)  # saturated, not inf


def test_online_spectrum_method_plumbs_through():
    """env_kw forwarding: the factored frontend is selectable for the
    online/serving paths, and matches the default frontend online."""
    rng = np.random.default_rng(11)
    cfg = default_cfg_2d()
    sig = (0.1 * rng.standard_normal(int(0.4 * SR))).astype(np.float32)
    outs = {}
    for m in (None, "factored"):
        o = OnlineSndEnv(cfg, SR, outputs=("mel_fbank_segment", "step_valid"),
                         spectrum_method=m)
        assert (o.env.factored_plan is not None) == (m == "factored")
        crng = np.random.default_rng(5)  # identical chunking per frontend
        got = []
        for ch in chunks_of(sig, crng):
            got += [np.asarray(out.mel_fbank_segment) for _i, out in o.feed(ch)]
        got += [np.asarray(out.mel_fbank_segment) for _i, out in o.flush()]
        outs[m] = np.stack(got) if got else np.zeros(0)
    assert outs[None].shape == outs["factored"].shape and outs[None].size
    np.testing.assert_allclose(outs["factored"], outs[None],
                               atol=3e-5, rtol=1e-5)


def test_multistream_poll_k_matches_k1():
    """max_segments_per_poll=K drains up to K segments per device call;
    every emitted segment must equal the K=1 run (same window grid, the
    seg axis is just batched) across interleaved feeds, close, drain."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    durs = [0.53, 0.21, 0.77]
    sigs = [tone(500.0 + 350 * i, d, SR) for i, d in enumerate(durs)]

    def run(k):
        ms = MultiStreamOnline(cfg, SR, n_streams=3, dtype=jnp.float64,
                               max_segments_per_poll=k)
        rng = np.random.default_rng(11)
        cursors = [0, 0, 0]
        got = {}
        polls = []
        while any(c < len(s) for c, s in zip(cursors, sigs)):
            i = int(rng.integers(0, 3))
            if cursors[i] >= len(sigs[i]):
                continue
            n = int(rng.integers(200, 6000))
            ms.feed(i, sigs[i][cursors[i] : cursors[i] + n])
            cursors[i] += n
            res = ms.poll()
            polls.append(res)
            got.update({(i_, k_): out for i_, k_, out in res})
        for i in range(3):
            ms.close(i)
        for i_, k_, out in ms.drain():
            got[(i_, k_)] = out
        return got, polls

    ref, _ = run(1)
    k4, polls = run(4)
    assert set(k4) == set(ref)
    # at least one poll actually drained >1 segment for some stream
    multi = any(
        sum(1 for i_, _, _ in res if i_ == s) > 1
        for res in polls for s in range(3)
    )
    assert multi
    for sk in ref:
        for key in ("mel_fbank_segment", "gabor_raw", "step_valid"):
            np.testing.assert_allclose(
                k4[sk][key], ref[sk][key], atol=1e-9,
                err_msg=f"{sk} {key}",
            )


def test_multistream_poll_k_int8_layout():
    """K>1 with int8 transfer: the (K,)+view layout and the seg-axis
    broadcast of per-stream scales must dequantize within the int8
    tolerance of a K>1 f32 run."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    keys = ("mel_fbank_segment", "gabor_kwta", "step_valid")
    sig = tone(900.0, 0.61, SR).astype(np.float32)

    def run(transfer):
        ms = MultiStreamOnline(cfg, SR, n_streams=2, outputs=keys,
                               transfer_dtype=transfer,
                               max_segments_per_poll=3)
        for s in range(2):
            ms.feed(s, sig * (1.0 if s == 0 else 0.4))
            ms.close(s)
        return {(i, k): out for i, k, out in ms.drain()}

    ref = run(None)
    q = run("int8")
    assert set(q) == set(ref)
    for sk, rout in ref.items():
        np.testing.assert_array_equal(
            q[sk]["step_valid"], rout["step_valid"])
        for key in ("mel_fbank_segment", "gabor_kwta"):
            a, b = q[sk][key], rout[key]
            rng_ = float(np.nanmax(b) - np.nanmin(b)) if b.size else 0.0
            tol = max(rng_ / 254.0 * 1.01, 1e-6)
            fin = np.isfinite(b)
            assert np.array_equal(np.isfinite(a), fin)
            assert np.max(np.abs(a[fin] - b[fin]), initial=0.0) <= tol


def test_multistream_poll_k_drains_backlog_in_one_call():
    """Under producer overload, one poll with K=4 empties a 4-segment
    backlog that K=1 would need 4 polls for."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    ms = MultiStreamOnline(cfg, SR, n_streams=2,
                           outputs=("mel_fbank_segment", "step_valid"),
                           max_segments_per_poll=4)
    t = ms.env.timing
    need = 3 * t.stride_samples + ms._post  # backs exactly segments 0..3
    rng = np.random.default_rng(3)
    for s in range(2):
        ms.feed(s, rng.standard_normal(need).astype(np.float32))
    res = ms.poll()
    per_stream = {s: sorted(k for i, k, _ in res if i == s) for s in (0, 1)}
    assert per_stream[0] == [0, 1, 2, 3]
    assert per_stream[1] == [0, 1, 2, 3]
    # nothing left pending until more audio arrives
    assert ms.poll() == []


def test_multistream_poll_k_validation():
    from auditory_tpu.pipeline.online import MultiStreamOnline

    with pytest.raises(ValueError, match="max_segments_per_poll"):
        MultiStreamOnline(default_cfg_2d(), SR, n_streams=1,
                          max_segments_per_poll=0)


def test_multistream_overlapping_segments_geometry():
    """stride_ms=50 makes segments overlap: the single-segment poll span
    already backs 2 grid segments (seg_cnt(span) = 2), which the K-poll
    constructor briefly rejected even at the default K=1 (round-4 review
    finding). It must construct, emit only the first K segments per poll
    (trailing span segments are computed-then-discarded), and match the
    single-stream OnlineSndEnv segment-for-segment at every K."""
    from auditory_tpu.config import WindowParams
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d(params=WindowParams(stride_ms=50.0))
    sig = tone(700.0, 0.83, SR)

    ref_env = OnlineSndEnv(cfg, SR)
    got_ref = {}
    for k, out in ref_env.feed(sig):
        got_ref[k] = out
    for k, out in ref_env.flush():
        got_ref[k] = out
    assert len(got_ref) >= 3  # the overlap actually multiplies segments

    def run(k, depth=1):
        ms = MultiStreamOnline(cfg, SR, n_streams=2,
                               max_segments_per_poll=k,
                               pipeline_depth=depth)
        assert ms._prog_segs > ms._k or k > 1
        for s in range(2):
            ms.feed(s, sig)
            ms.close(s)
        return {(i, j): out for i, j, out in ms.drain()}

    k1 = run(1)
    k2 = run(2)
    assert set(k1) == set(k2)
    # pipelined poll over the overlapping-segment geometry: the trailing
    # computed-then-discarded span segments must not leak into the claim
    p2 = run(1, depth=2)
    assert set(p2) == set(k1)
    for key, out in k1.items():
        np.testing.assert_array_equal(
            p2[key]["mel_fbank_segment"], out["mel_fbank_segment"]
        )
    assert sorted(j for (i, j) in k1 if i == 0) == sorted(got_ref)
    for (i, j), out in k1.items():
        np.testing.assert_allclose(
            out["mel_fbank_segment"],
            np.asarray(got_ref[j].mel_fbank_segment),
            atol=1e-6, err_msg=f"stream {i} seg {j}",
        )
        np.testing.assert_allclose(
            k2[(i, j)]["mel_fbank_segment"], out["mel_fbank_segment"],
            atol=1e-5, err_msg=f"K=2 vs K=1: stream {i} seg {j}",
        )


@pytest.mark.parametrize("depth", [2, 3])
def test_multistream_pipelined_matches_sync(depth):
    """pipeline_depth=D keeps up to D-1 device calls in flight (poll N+1's
    compute overlaps poll N's host copy on a real device). Every emitted
    (stream, seg_idx, value) must equal the synchronous depth=1 run, no
    segment may be emitted twice or skipped, and the pipeline must
    actually fill (some polls return [] with work in flight)."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    durs = [0.53, 0.21, 0.77]
    sigs = [tone(500.0 + 350 * i, d, SR) for i, d in enumerate(durs)]

    def run(d, k=1):
        ms = MultiStreamOnline(cfg, SR, n_streams=3, dtype=jnp.float64,
                               pipeline_depth=d, max_segments_per_poll=k)
        rng = np.random.default_rng(11)
        cursors = [0, 0, 0]
        got = {}
        deferred = 0

        def collect(res):
            for i_, k_, out in res:
                assert (i_, k_) not in got, f"duplicate emit {(i_, k_)}"
                got[(i_, k_)] = out

        while any(c < len(s) for c, s in zip(cursors, sigs)):
            i = int(rng.integers(0, 3))
            if cursors[i] >= len(sigs[i]):
                continue
            n = int(rng.integers(200, 6000))
            ms.feed(i, sigs[i][cursors[i] : cursors[i] + n])
            cursors[i] += n
            res = ms.poll()
            if not res and ms._inflight:
                deferred += 1
            collect(res)
        for i in range(3):
            ms.close(i)
        collect(list(ms.drain()))
        assert not ms._inflight
        assert not ms._inflight_segs.any()
        return got, deferred

    ref, _ = run(1)
    pipe, deferred = run(depth)
    assert deferred > 0  # the pipeline actually held calls in flight
    assert set(pipe) == set(ref)
    for sk in ref:
        for key in ("mel_fbank_segment", "gabor_raw", "step_valid"):
            np.testing.assert_allclose(
                pipe[sk][key], ref[sk][key], atol=1e-9,
                err_msg=f"{sk} {key}",
            )
    # composes with K>1 draining
    pk, _ = run(depth, k=3)
    assert set(pk) == set(ref)
    for sk in ref:
        np.testing.assert_allclose(
            pk[sk]["mel_fbank_segment"], ref[sk]["mel_fbank_segment"],
            atol=1e-9, err_msg=f"pipelined K=3 {sk}",
        )


def test_multistream_pipelined_failure_rolls_back():
    """A device failure at harvest must roll back EVERY in-flight claim:
    nothing is skipped, and the next polls re-emit the exact segments the
    failed calls covered."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    sig = tone(660.0, 0.53, SR)

    sync = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64)
    sync.feed(0, sig)
    sync.close(0)
    ref = {k: out for _, k, out in sync.drain()}
    assert len(ref) >= 2

    ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                           pipeline_depth=2)
    ms.feed(0, sig)
    ms.close(0)
    assert ms.poll() == []  # pipeline fills: call A in flight
    assert len(ms._inflight) == 1
    claimed = ms._inflight_segs.copy()
    assert claimed[0] >= 1

    class Boom:
        def __array__(self, *a, **k):
            raise RuntimeError("injected device failure")

    ms._inflight[0] = dict(ms._inflight[0], packed=Boom())
    with pytest.raises(RuntimeError, match="injected"):
        # dispatches call B then harvests the poisoned A
        ms.poll()
    assert ms._inflight == []  # B's claim was rolled back with A's
    assert not ms._inflight_segs.any()

    got = {k: out for _, k, out in ms.drain()}
    assert set(got) == set(ref)  # every segment re-emitted, none skipped
    for k in ref:
        np.testing.assert_allclose(
            got[k]["mel_fbank_segment"], ref[k]["mel_fbank_segment"],
            atol=1e-9, err_msg=f"segment {k}",
        )


def test_multistream_pipelined_validation():
    from auditory_tpu.pipeline.online import MultiStreamOnline

    with pytest.raises(ValueError, match="pipeline_depth"):
        MultiStreamOnline(default_cfg_2d(), SR, n_streams=1,
                          pipeline_depth=0)


def test_multistream_flush_pipeline():
    """flush_pipeline() harvests in-flight calls without dispatching new
    work, even when backlog would make poll() dispatch again."""
    from auditory_tpu.pipeline.online import MultiStreamOnline

    cfg = default_cfg_2d()
    ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                           pipeline_depth=2)
    assert ms.flush_pipeline() == []  # idle: nothing in flight
    ms.feed(0, tone(440.0, 0.9, SR))  # backlog of several segments
    assert ms.poll() == []  # fills the pipeline
    assert len(ms._inflight) == 1
    got = ms.flush_pipeline()
    assert got and not ms._inflight
    # backlog remains buffered (flush did NOT dispatch): next poll drains
    assert ms._ready_streams().size == 1
    seg_idx = [k for _, k, _ in got]
    assert seg_idx == list(range(len(seg_idx)))


def test_multistream_pipelined_drop_oldest_accounting():
    """drop_oldest while a pipelined call is in flight: in-flight segments
    were already copied out of the ring at dispatch, so they must be
    EMITTED (never counted dropped), dropped+emitted indices must be
    disjoint and cover the range, and surviving segments must stay
    bit-identical to the offline run."""
    from auditory_tpu.pipeline.online import MultiStreamOnline
    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    sig = tone(820.0, 1.7, SR)
    offline = env.process(env.pad(sig))
    n_off = offline.mel_fbank_segment.shape[0]

    ms = MultiStreamOnline(cfg, SR, n_streams=1, dtype=jnp.float64,
                           max_buffer_seconds=0.0, overflow="drop_oldest",
                           pipeline_depth=2)
    got = {}
    need = ms._post + ms.env.timing.stride_samples  # first segment ready
    ms.feed(0, sig[:need])
    assert ms.poll() == []  # call A in flight, claiming segment(s)
    claimed = int(ms._inflight_segs[0])
    assert claimed >= 1
    # the 0-second cap may already have dropped a leading segment before
    # the first poll; the claim starts wherever the cursor then stood
    seg0_a = int(ms._inflight[0]["seg0"][0])
    # overfeed with NO harvest: drop_oldest must floor at the claimed
    # cursor, never dropping what call A already copied out
    for chunk in np.array_split(sig[need:], 5):
        ms.feed(0, chunk)
    assert ms._next_seg[0] >= claimed  # drops happened past the claim
    dropped_mid = ms.dropped_segments(0)
    assert dropped_mid > 0
    for _, k, out in ms.poll() + ms.flush_pipeline():
        assert k not in got
        got[k] = out
    ms.close(0)
    for _, k, out in ms.drain():
        assert k not in got
        got[k] = out
    assert not ms._inflight and not ms._inflight_segs.any()

    dropped = ms.dropped_segments(0)
    ks = sorted(got)
    # the in-flight claim was emitted despite the drops advancing past it
    for j in range(claimed):
        assert seg0_a + j in got, (seg0_a, j, ks)
    # emitted and dropped partition [0, n_off): count matches and no
    # emitted index was counted dropped
    assert len(ks) + dropped == n_off, (len(ks), dropped, n_off)
    for k in ks:
        np.testing.assert_allclose(
            np.asarray(got[k]["mel_fbank_segment"]),
            np.asarray(offline.mel_fbank_segment[k]),
            atol=1e-9, err_msg=f"segment {k}",
        )


def test_online_window_fn_matches_offline():
    """The opt-in analysis window reaches the streaming path: OnlineSndEnv
    with window_fn='hamming' is bit-identical to the offline hamming run
    and differs from the rectangular default (the basis fold is shared
    through SndEnv, but the ONLINE-specific chunk reassembly must not
    bypass it)."""
    import dataclasses as dc

    cfg = default_cfg_2d()
    hcfg = dc.replace(cfg, dft=dc.replace(cfg.dft, window_fn="hamming"))
    sig = tone(987.0, 0.45, SR)

    env = SndEnv(hcfg, SR, dtype=jnp.float64, spectrum_method="fft")
    offline = env.process(env.pad(sig))

    online = OnlineSndEnv(hcfg, SR, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    got = {}
    for chunk in chunks_of(sig, rng):
        for k, out in online.feed(chunk):
            got[k] = out
    for k, out in online.flush():
        got[k] = out
    assert len(got) == offline.power_segment.shape[0]
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k].mel_fbank_segment),
            np.asarray(offline.mel_fbank_segment[k]),
            atol=1e-9, err_msg=f"segment {k}",
        )

    rect = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft").process(
        env.pad(sig)
    )
    assert not np.allclose(
        np.asarray(offline.mel_fbank_segment),
        np.asarray(rect.mel_fbank_segment),
    )
