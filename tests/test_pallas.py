"""Pallas fused frame+DFT+power+log+mel kernel vs the XLA path (interpret
mode on CPU; the compiled path is exercised on real TPU by bench/verify)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.config import DFTParams, FilterBank
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


def make_envs(cfg):
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=True)
    assert pal._pallas_interpret  # CPU test runs interpret mode
    return xla, pal


def test_pallas_matches_xla_full_pipeline():
    cfg = default_cfg_2d()
    xla, pal = make_envs(cfg)
    sig = xla.pad(tone(1234.0, 0.3, SR)).astype(np.float32)
    o1 = xla.process(sig)
    o2 = pal.process(sig)
    np.testing.assert_allclose(
        np.asarray(o1.power_segment), np.asarray(o2.power_segment),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o1.log_power_segment), np.asarray(o2.log_power_segment),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o1.mfcc_segment), np.asarray(o2.mfcc_segment),
        rtol=1e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(o1.gabor_raw), np.asarray(o2.gabor_raw),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(o1.step_valid), np.asarray(o2.step_valid)
    )


def test_pallas_negative_starts_and_overrun():
    """Left border windows (negative starts) and step-overrun masking must
    match: the kernel reads host-shifted padding."""
    cfg = default_cfg_2d()
    xla, pal = make_envs(cfg)
    sig = tone(700.0, 0.217, SR).astype(np.float32)  # unpadded -> overruns
    o1 = xla.process(sig)
    o2 = pal.process(sig)
    np.testing.assert_array_equal(
        np.asarray(o1.step_valid), np.asarray(o2.step_valid)
    )
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )


def test_pallas_batched():
    cfg = default_cfg_2d()
    xla, pal = make_envs(cfg)
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length

    sigs = [xla.pad(tone(400 + 250 * i, d, SR)) for i, d in
            enumerate([0.25, 0.4, 0.18])]
    smax = bucket_length(max(len(s) for s in sigs), xla.timing)
    batch = np.zeros((3, smax), np.float32)
    lengths = np.array([len(s) for s in sigs], np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    o1, v1 = BatchedSndEnv(xla).process(batch, lengths)
    o2, v2 = BatchedSndEnv(pal).process(batch, lengths)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # f32 log-domain floor noise: linear-domain agreement is what matters
    m1 = np.asarray(o1.mel_fbank_segment)
    m2 = np.asarray(o2.mel_fbank_segment)
    np.testing.assert_allclose(np.exp(m1), np.exp(m2), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(m1, m2, atol=2e-2)


def test_pallas_requires_f32_and_no_smooth():
    cfg = default_cfg_2d()
    with pytest.raises(ValueError):
        SndEnv(cfg, SR, dtype=jnp.float64, use_pallas=True)
    cfg2 = dataclasses.replace(cfg, dft=DFTParams(prev_smooth=0.3))
    with pytest.raises(ValueError):
        SndEnv(cfg2, SR, dtype=jnp.float32, use_pallas=True)


@pytest.mark.parametrize("passes,atol", [(1, 2e-4), (3, 5e-3), (6, 2e-4)])
def test_pallas_passes_variants(passes, atol):
    """The emulation levels track the XLA path at their documented grades.
    Interpret mode evaluates the bf16 limb casts literally, so passes=3
    carries its real ~2^-16 truncation (log-amplified at quiet mel bins)
    while passes=6 reconstructs f32 exactly; passes=1 is trivially f32 here
    because interpret-mode dots do not round operands like the MXU."""
    cfg = default_cfg_2d()
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=True, pallas_passes=passes)
    sig = xla.pad(tone(987.0, 0.25, SR)).astype(np.float32)
    o1, o2 = xla.process(sig), pal.process(sig)
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=atol,
    )
    with pytest.raises(ValueError, match="passes"):
        SndEnv(cfg, SR, use_pallas=True, pallas_passes=2)


def test_limb_split_exact():
    """The bf16 limb split must reconstruct f32 exactly at 3 limbs (24
    mantissa bits) and to ~2^-16 at 2 limbs."""
    from auditory_tpu.ops.framefft import _split_limbs

    r = np.random.default_rng(0)
    x = jnp.asarray(
        (r.standard_normal(4096) * np.exp(r.uniform(-20, 20, 4096)))
        .astype(np.float32)
    )
    l3 = _split_limbs(x, 3)
    recon3 = sum(h.astype(jnp.float32) for h in l3)
    np.testing.assert_array_equal(np.asarray(recon3), np.asarray(x))
    l2 = _split_limbs(x, 2)
    recon2 = sum(h.astype(jnp.float32) for h in l2)
    err = np.abs(np.asarray(recon2 - x)) / np.maximum(np.abs(np.asarray(x)), 1e-30)
    assert err.max() < 2 ** -15
