"""Randomized config fuzz: sample valid pipeline configurations and assert
oracle parity end-to-end. Catches geometry corner cases the hand-picked
sweeps miss (seeded -> deterministic)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.config import (
    FilterBank,
    GaborSet,
    MelParams,
    SndEnvConfig,
    WindowParams,
    default_gabor_specs,
)
from auditory_tpu.pipeline.sndenv import SndEnv
from auditory_tpu.refemu.goref import SndEnvRef
from tests.conftest import tone
from tests.test_pipeline_parity import assert_segments_match


def sample_cfg(rng: np.random.Generator):
    """One random valid configuration + sample rate."""
    sr = int(rng.choice([8000, 16000, 22050]))
    step_ms = float(rng.choice([5.0, 8.0, 10.0, 12.5]))
    steps_per_seg = int(rng.integers(6, 14))
    segment_ms = step_ms * steps_per_seg
    stride_mult = int(rng.integers(1, max(2, steps_per_seg)))
    stride_ms = step_ms * stride_mult if rng.random() < 0.7 else segment_ms * 0.95
    win_ms = float(rng.choice([16.0, 20.0, 25.0]))
    border = int(rng.integers(0, 4))

    n_filters = int(rng.choice([24, 32, 40]))
    hi_hz = float(min(sr / 2, rng.choice([4000.0, 6000.0, 8000.0])))
    lo_hz = float(rng.choice([0.0, 100.0, 300.0]))

    gsize = int(rng.choice([6, 8, 9]))
    gstride = int(rng.integers(2, gsize + 1))
    cfg = SndEnvConfig(
        params=WindowParams(
            win_ms=win_ms, step_ms=step_ms, segment_ms=segment_ms,
            stride_ms=stride_ms, border_steps=border,
        ),
        mel=MelParams(
            fbank=FilterBank(n_filters=n_filters, lo_hz=lo_hz, hi_hz=hi_hz),
            mfcc=bool(rng.random() < 0.8),
            deltas=bool(rng.random() < 0.8),
        ),
        gabor=GaborSet(
            size_x=gsize, size_y=gsize, stride_x=gstride, stride_y=gstride,
            gain=float(rng.choice([1.0, 1.5, 2.0])),
            specs=default_gabor_specs(
                phases=(0.0, 1.5708) if rng.random() < 0.5 else (0.0,)
            ),
        ),
        energy_mode=str(
            rng.choice(["sndenv", "sndenv", "gaborview", "spectral"])
        ),
        delta_mode="sndenv" if rng.random() < 0.7 else "gaborview",
    )
    if rng.random() < 0.15:  # opt-in analysis-window extension
        cfg = dataclasses.replace(
            cfg, dft=dataclasses.replace(
                cfg.dft, window_fn=str(rng.choice(["hamming", "hann"]))
            )
        )
    # previously-unsampled knobs (each plumbed through both the pipeline
    # and the goref oracle; sampled independently so their interactions
    # with geometry/frontends get fuzzed too):
    if rng.random() < 0.2:  # temporal smoothing recurrence (dft/dft.go:67-69)
        cfg = dataclasses.replace(cfg, dft=dataclasses.replace(
            cfg.dft, prev_smooth=float(rng.choice([0.3, 0.5, 0.7]))))
    if rng.random() < 0.15:  # power-only mode (no log spectrum output)
        cfg = dataclasses.replace(cfg, dft=dataclasses.replace(
            cfg.dft, comp_log_pow=False))
    if rng.random() < 0.2:  # log floors (log_offset=0 hits the ==0 -> LogMin
        cfg = dataclasses.replace(cfg, dft=dataclasses.replace(  # floor path)
            cfg.dft,
            log_offset=float(rng.choice([0.0, 0.5])),
            log_min=float(rng.choice([-100.0, -50.0]))))
    if rng.random() < 0.2:  # mel log floors (mel/mel.go:133-139)
        cfg = dataclasses.replace(cfg, mel=dataclasses.replace(
            cfg.mel, fbank=dataclasses.replace(
                cfg.mel.fbank,
                log_off=float(rng.choice([0.0, 1.0])),
                log_min=float(rng.choice([-10.0, -5.0])))))
    if cfg.mel.mfcc and rng.random() < 0.3:  # DCT truncation width
        cfg = dataclasses.replace(cfg, mel=dataclasses.replace(
            cfg.mel, n_coefs=int(rng.choice([8, 13, 20]))))
    return cfg, sr


def config_is_runnable(cfg: SndEnvConfig, sr: int) -> bool:
    """Skip configs the reference itself cannot run (documented Go panics)."""
    t = cfg.params.derive(sr)
    # mel triangle wider than NFilters+2 bins -> reference panics
    try:
        SndEnvRef(cfg).init(np.zeros(max(t.segment_samples, 10)), sr)
    except ValueError:
        return False
    # gabor wider than the mel matrix -> both sides raise; skip
    if cfg.gabor.size_x > t.segment_steps:
        return False
    if cfg.gabor.size_y > cfg.mel.fbank.n_filters:
        return False
    # 'sndenv' energy quirk requires steps <= n_bins (reference would read OOB)
    if t.segment_steps > t.n_bins:
        return False
    return True


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_config_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = sr = None
    for _ in range(50):
        c, s = sample_cfg(rng)
        if config_is_runnable(c, s):
            cfg, sr = c, s
            break
    assert cfg is not None, "no runnable config sampled"

    t = cfg.params.derive(sr)
    dur = (t.segment_samples + 2 * t.stride_samples + 321) / sr
    sig = tone(float(rng.uniform(200, min(3500, sr / 2 - 500))), dur, sr)
    env = SndEnv(cfg, sr, dtype=jnp.float64)
    sig = env.pad(sig)
    # fuzz the spectrum frontend too: every uniform-GEMM formulation must
    # hit the same oracle numbers at any sampled geometry (off-grid
    # configs transparently route the method through the gather fallback)
    method = str(rng.choice(
        ["fft", "matmul", "conv", "frames", "windowed", "sliced"]
    ))
    assert_segments_match(cfg, sig, sr, spectrum_method=method)


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_4d_and_bytime_parity(seed):
    """Fuzz the gabor output layouts too: 4-D pooled (with consistent pool
    counts) and 2-D byTime."""
    from auditory_tpu.dsp.gabor import gabor_out_counts

    rng = np.random.default_rng(5000 + seed)
    cfg = sr = None
    for _ in range(50):
        c, s = sample_cfg(rng)
        if config_is_runnable(c, s):
            cfg, sr = c, s
            break
    assert cfg is not None

    t = cfg.params.derive(sr)
    if rng.random() < 0.5:
        # consistent 4-D pools from the valid conv counts
        fc, tc = gabor_out_counts(
            (cfg.mel.fbank.n_filters, t.segment_steps), cfg.gabor, None
        )
        cfg = dataclasses.replace(
            cfg, gbor_out_pools_y=fc, gbor_out_pools_x=tc,
            gbor_out_units_y=2, gbor_out_units_x=cfg.gabor.n_filters,
        )
    else:
        cfg = dataclasses.replace(cfg, by_time=True)

    dur = (t.segment_samples + 2 * t.stride_samples + 123) / sr
    sig = tone(float(rng.uniform(300, min(3000, sr / 2 - 600))), dur, sr)
    env = SndEnv(cfg, sr, dtype=jnp.float64)
    sig = env.pad(sig)
    assert_segments_match(cfg, sig, sr)


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_online_matches_offline(seed):
    """Fuzz the streaming path's border/span geometry against offline."""
    from auditory_tpu.pipeline.online import OnlineSndEnv

    rng = np.random.default_rng(9000 + seed)
    cfg = sr = None
    for _ in range(50):
        c, s = sample_cfg(rng)
        if not config_is_runnable(c, s):
            continue
        try:
            OnlineSndEnv(c, s, dtype=jnp.float64)
        except ValueError:
            continue  # border offset not ms-representable
        cfg, sr = c, s
        break
    assert cfg is not None

    t = cfg.params.derive(sr)
    dur = (t.segment_samples + 3 * t.stride_samples + 77) / sr
    sig = tone(float(rng.uniform(300, min(3000, sr / 2 - 600))), dur, sr)
    env = SndEnv(cfg, sr, dtype=jnp.float64, spectrum_method="fft")
    offline = env.process(env.pad(sig))

    online = OnlineSndEnv(cfg, sr, dtype=jnp.float64)
    got = {}
    i = 0
    while i < len(sig):
        n = int(rng.integers(100, 4000))
        got.update(dict(online.feed(sig[i : i + n])))
        i += n
    got.update(dict(online.flush()))
    assert len(got) == offline.power_segment.shape[0], (
        len(got), offline.power_segment.shape[0],
    )
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k].mel_fbank_segment),
            np.asarray(offline.mel_fbank_segment[k]),
            atol=1e-9, err_msg=f"seed {seed} segment {k}",
        )


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_segment_pipeline(seed):
    """Fuzz the gaborview segment path: random slices + gabor geometry vs a
    literal per-step oracle run (goref building blocks + gbv quirks)."""
    from auditory_tpu.config import GaborSet, KWTAParams, default_gabor_specs
    from auditory_tpu.config import msec_to_samples
    from auditory_tpu.pipeline.segments import SegmentPipeline, SegmentWindowParams
    from auditory_tpu.refemu import goref

    rng = np.random.default_rng(12000 + seed)
    sr = int(rng.choice([16000, 22050]))
    gsize = int(rng.choice([6, 8]))
    gset = GaborSet(
        size_x=gsize, size_y=gsize,
        stride_x=int(rng.integers(2, gsize + 1)),
        stride_y=int(rng.integers(2, gsize + 1)),
        gain=1.5, specs=default_gabor_specs(phases=(0.0,)),
    )
    wp = SegmentWindowParams(resize=bool(rng.random() < 0.7),
                             border_steps=int(rng.integers(0, 3)))
    from auditory_tpu.config import MelParams

    mel_params = MelParams()
    pipe = SegmentPipeline(
        sr, wp, mel=mel_params, gabor=gset, kwta=KWTAParams(on=False),
        dtype=jnp.float64, spectrum_method="fft",
    )
    sig = tone(float(rng.uniform(300, 3000)), 0.8, sr)
    a = float(rng.uniform(30, 300))
    b = a + float(rng.uniform(40, 250))
    start_ms, end_ms, steps = pipe.setup(a, b)
    out = pipe.process(sig, a, b)

    # literal oracle at the same window starts
    n_bins = pipe.win_samples // 2 + 1
    nf = mel_params.fbank.n_filters
    power = np.zeros(n_bins); logpow = np.zeros(n_bins)
    power_seg = np.zeros((n_bins, steps)); logpow_seg = np.zeros((n_bins, steps))
    fbank = np.zeros(nf); mel_seg = np.zeros((nf, steps))
    bin_pts, _, tri = goref.init_filters(mel_params.fbank, pipe.win_samples, sr)
    start_sample = msec_to_samples(start_ms, sr)
    for s in range(steps):
        st = start_sample + pipe.step_samples * (s - wp.border_steps)
        en = st + pipe.win_samples
        if en > len(sig):
            break
        window = (np.concatenate([np.zeros(-st), sig[:en]]) if st < 0
                  else sig[st:en])
        goref.dft_filter(pipe.dft, s, window, pipe.win_samples, power, logpow,
                         power_seg, logpow_seg)
        goref.filter_dft(mel_params, s, power, mel_seg, fbank, tri, bin_pts)
    np.testing.assert_allclose(
        np.asarray(out["mel_fbank_segment"]), mel_seg, atol=1e-5, rtol=0,
        err_msg=f"seed {seed}",
    )
    e_ref = logpow_seg[:steps, :].sum(axis=0)
    np.testing.assert_allclose(np.asarray(out["energy"]), e_ref,
                               atol=1e-6, rtol=1e-9)
