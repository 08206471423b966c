"""Physical/mathematical property tests (SURVEY.md section 4 plan item b):
tone -> correct mel band, silence -> log floors, Parseval energy identity."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.config import DFTParams, MelParams, FilterBank
from auditory_tpu.dsp import design
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


@pytest.mark.parametrize("freq", [300.0, 1000.0, 2500.0, 6000.0])
def test_tone_lands_in_correct_mel_band(freq):
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    sig = env.pad(tone(freq, 0.3, SR))
    out = env.process(sig)
    mel = np.asarray(out.mel_fbank_segment[0])  # [n_mel, steps]
    band = int(np.argmax(mel.mean(axis=1)))
    lo = env.mel_des.hz_pts[band]
    hi = env.mel_des.hz_pts[band + 2]
    assert lo <= freq <= hi, f"{freq} Hz not in band {band} [{lo:.0f},{hi:.0f}]"


def test_silence_hits_log_floors():
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    out = env.process(np.zeros(4000))
    valid = np.asarray(out.step_valid[0])
    mel = np.asarray(out.mel_fbank_segment[0])
    # mel sum of zero power + LogOff(0) == 0 -> LogMin=-10 (mel/mel.go:135)
    assert np.all(mel[:, valid] == cfg.mel.fbank.log_min)
    # log power: power 0 + LogOffSet 1 -> ln(1) = 0 (dft/dft.go:75-80)
    lp = np.asarray(out.log_power_segment[0])
    assert np.all(lp[:, valid] == 0.0)


def test_parseval_energy_identity():
    """Unnormalized DFT Parseval: sum|X[k]|^2 over ALL N bins == N * sum x^2.
    Our one-sided power keeps bins 0..N/2; reconstruct the full sum by
    mirroring (bins 1..ceil(N/2)-1 appear twice)."""
    rng = np.random.default_rng(3)
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64, spectrum_method="fft")
    n = env.timing.win_samples
    sig = rng.normal(size=env.timing.segment_samples + 2 * 320).astype(np.float64)
    out = env.process(env.pad(sig))
    power = np.asarray(out.power_segment[0])  # [n_bins, steps]
    valid = np.asarray(out.step_valid[0])
    starts = np.asarray(
        [env.timing.step_samples * (i - cfg.params.border_steps)
         for i in range(env.timing.segment_steps)]
    )
    padded = env.pad(sig)
    for s in np.flatnonzero(valid):
        st = starts[s]
        window = (
            np.concatenate([np.zeros(-st), padded[: st + n]])
            if st < 0
            else padded[st : st + n]
        )
        full = power[0, s] + power[-1, s] + 2 * power[1:-1, s].sum()
        if n % 2 == 1:
            full = power[0, s] + 2 * power[1:, s].sum()
        np.testing.assert_allclose(
            full, n * np.sum(window**2), rtol=1e-9,
            err_msg=f"Parseval violated at step {s}",
        )


def test_mel_triangles_partition_band():
    """Interior FFT bins covered by two adjacent triangles sum to ~1 (the
    classic mel-triangle complement property, away from NaN/edge bins)."""
    fb = FilterBank(n_filters=32, lo_hz=0.0, hi_hz=8000.0)
    des = design.mel_design(fb, 400, SR)
    w = des.weights
    cover = np.nansum(w, axis=0)
    inner = slice(int(des.bin_pts[2]) + 1, int(des.bin_pts[-2]))
    assert np.nanmax(np.abs(cover[inner] - 1.0)) < 0.35  # floor-bin jitter


def test_dc_tone_energy_scales_with_amplitude():
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    o1 = env.process(env.pad(tone(1000.0, 0.2, SR, amp=0.2, dither=0)))
    o2 = env.process(env.pad(tone(1000.0, 0.2, SR, amp=0.4, dither=0)))
    p1 = np.asarray(o1.power_segment[0]).max()
    p2 = np.asarray(o2.power_segment[0]).max()
    np.testing.assert_allclose(p2 / p1, 4.0, rtol=1e-6)  # power ~ amp^2
