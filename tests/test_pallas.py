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


def make_envs(cfg, mode="grouped"):
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=True, pallas_mode=mode)
    assert pal._pallas_interpret  # CPU test runs interpret mode
    return xla, pal


@pytest.mark.parametrize("mode", ["grouped", "masked", "merged"])
def test_pallas_matches_xla_full_pipeline(mode):
    cfg = default_cfg_2d()
    xla, pal = make_envs(cfg, mode)
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


@pytest.mark.parametrize("mode", ["grouped", "masked", "merged"])
@pytest.mark.parametrize("passes,atol", [(1, 2e-4), (3, 5e-3), (6, 2e-4)])
def test_pallas_passes_variants(passes, atol, mode):
    """The emulation levels track the XLA path at their documented grades.
    Interpret mode evaluates the bf16 limb casts literally, so passes=3
    carries its real ~2^-16 truncation (log-amplified at quiet mel bins)
    while passes=6 reconstructs f32 exactly; passes=1 is trivially f32 here
    because interpret-mode dots do not round operands like the MXU."""
    cfg = default_cfg_2d()
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=True, pallas_passes=passes, pallas_mode=mode)
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


def test_pallas_odd_stride_period128():
    """Odd steps (gcd(step,128)=1, e.g. 441 @44.1 kHz) have residue period
    128 > the default block of 64: the gate must route them to XLA unless
    pallas_block raises the cap, and the kernel must then agree with the
    XLA path (128 residue variants, M=block/128 rows each). In COMPILED
    mode this geometry is rejected regardless of block: the basis-variant
    tensor (p * chunk * k_pad) measured 600 MB vs 128 MB of VMEM on chip
    (BENCH_NOTES_r03.md); interpret mode has no VMEM, so the CPU test can
    still verify the kernel's residue math at p=128. (The test geometry is
    a small odd-stride one -- step 161 @16 kHz, win 128 -- not 44.1 kHz
    itself: interpret mode pays 128 residue-variant matmuls per block, so
    the full 1102-pt geometry costs ~270 s of CPU for the same coverage.)"""
    from auditory_tpu.config import WindowParams

    sr = 16000
    outs = ("power_segment", "mel_fbank_segment", "step_valid")
    # stride/segment stay multiples of the odd step so the shared-window
    # grid (a pallas precondition) holds: 1610 = 10 * 161 samples
    wp = WindowParams(win_ms=8.0, step_ms=10.0625, segment_ms=100.625,
                      stride_ms=100.625)
    cfg = default_cfg_2d(params=wp)
    xla = SndEnv(cfg, sr, dtype=jnp.float32, spectrum_method="conv",
                 use_pallas=False, outputs=outs)
    assert xla.timing.step_samples == 161  # odd stride: residue period 128

    sig = xla.pad(tone(1234.0, 0.1, sr)).astype(np.float32)

    # default block: not supported -> silently falls back to XLA
    pal_off = SndEnv(cfg, sr, dtype=jnp.float32, use_pallas=True,
                     outputs=outs)
    pal_off.process(sig)
    assert not pal_off._pallas_active

    # block >= period: supported in interpret mode (no VMEM)
    pal = SndEnv(cfg, sr, dtype=jnp.float32, use_pallas=True,
                 pallas_block=128, outputs=outs)
    o1, o2 = xla.process(sig), pal.process(sig)
    assert pal._pallas_active

    # ... but the compiled path must reject it: the VMEM estimate gates it
    from auditory_tpu.ops.framefft import supported_geometry

    assert supported_geometry(441, max_block=128, win=1102, interpret=True)
    assert not supported_geometry(441, max_block=128, win=1102,
                                  interpret=False)
    # the 16 kHz geometry stays supported compiled (p=4, ~4 MB variants)
    assert supported_geometry(160, win=400, interpret=False)
    np.testing.assert_array_equal(
        np.asarray(o1.step_valid), np.asarray(o2.step_valid)
    )
    np.testing.assert_allclose(
        np.asarray(o1.power_segment), np.asarray(o2.power_segment),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )

    # a direct caller below the period still gets a loud error
    from auditory_tpu.ops.framefft import fused_frame_power_mel

    with pytest.raises(ValueError, match="block"):
        fused_frame_power_mel(
            jnp.zeros((1, 4096), jnp.float32), 441, 0, 8,
            jnp.zeros((441, 256), jnp.float32),
            jnp.zeros((441, 256), jnp.float32),
            jnp.zeros((256, 128), jnp.float32),
            win=441, n_bins=221, n_mel=32,
            dft=xla.cfg.dft, fbank=xla.cfg.mel.fbank,
        )


def test_pallas_masked_odd_stride():
    """Masked mode lifts the grouped kernel's two odd-stride blockers: the
    block auto-raises to the residue period (no pallas_block needed) and
    there is no residue-variant VMEM blowup, so the 44.1 kHz geometry that
    grouped mode cannot compile (600 MB of basis variants) is
    masked-eligible COMPILED, and the small odd-stride geometry runs at the
    default block."""
    from auditory_tpu.config import WindowParams
    from auditory_tpu.ops.framefft import masked_vmem_bytes, supported_geometry

    # 44.1 kHz: grouped rejected compiled, masked supported (tiny basis)
    assert not supported_geometry(441, max_block=128, win=1102,
                                  interpret=False, mode="grouped")
    assert supported_geometry(441, max_block=128, win=1102,
                              interpret=False, mode="masked")
    assert masked_vmem_bytes(441, 1102, passes=6, block=128) < 16 * 2 ** 20

    sr = 16000
    outs = ("power_segment", "mel_fbank_segment", "step_valid")
    wp = WindowParams(win_ms=8.0, step_ms=10.0625, segment_ms=100.625,
                      stride_ms=100.625)
    cfg = default_cfg_2d(params=wp)
    xla = SndEnv(cfg, sr, dtype=jnp.float32, spectrum_method="conv",
                 use_pallas=False, outputs=outs)
    assert xla.timing.step_samples == 161  # odd stride: residue period 128

    sig = xla.pad(tone(1234.0, 0.1, sr)).astype(np.float32)
    pal = SndEnv(cfg, sr, dtype=jnp.float32, use_pallas=True,
                 pallas_mode="masked", outputs=outs)  # default block: fine
    o1, o2 = xla.process(sig), pal.process(sig)
    assert pal._pallas_active
    np.testing.assert_array_equal(
        np.asarray(o1.step_valid), np.asarray(o2.step_valid)
    )
    np.testing.assert_allclose(
        np.asarray(o1.power_segment), np.asarray(o2.power_segment),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )


@pytest.mark.parametrize("mode", ["masked", "merged"])
def test_pallas_masked_analysis_window(mode):
    """With window_fn set, masked mode must move the analysis window into
    the per-slot mask (the tiled basis stays a pure complex exponential:
    a window folded into the basis rows would NOT tile -- w[(rem+n) mod W]
    != w[n]) and still match the XLA path, which folds the window into its
    basis."""
    import dataclasses as dc

    outs = ("power_segment", "mel_fbank_segment", "step_valid")
    cfg = default_cfg_2d()
    cfg = dc.replace(cfg, dft=dc.replace(cfg.dft, window_fn="hamming"))
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False, outputs=outs)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, use_pallas=True,
                 pallas_mode=mode, outputs=outs)
    sig = xla.pad(tone(987.0, 0.25, SR)).astype(np.float32)
    o1, o2 = xla.process(sig), pal.process(sig)
    assert pal._pallas_active
    np.testing.assert_allclose(
        np.asarray(o1.power_segment), np.asarray(o2.power_segment),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )


@pytest.mark.parametrize("mode", ["grouped", "masked", "merged"])
def test_pallas_emit_gating(mode):
    """Output gating: a mel-only env must skip the kernel's wide power/
    log-power HBM writes (the fields come back None) yet still match the
    XLA mel; an mfcc-requesting env must still emit power internally (the
    Energy chain feeds coef0) and match the XLA mfcc bit-for-bit in
    structure."""
    cfg = default_cfg_2d()
    outs = ("mel_fbank_segment", "step_valid")
    xla = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                 use_pallas=False, outputs=outs)
    pal = SndEnv(cfg, SR, dtype=jnp.float32, use_pallas=True,
                 pallas_mode=mode, outputs=outs)
    sig = xla.pad(tone(1234.0, 0.3, SR)).astype(np.float32)
    o1, o2 = xla.process(sig), pal.process(sig)
    assert pal._pallas_active
    assert o2.power_segment is None and o2.log_power_segment is None
    np.testing.assert_allclose(
        np.asarray(o1.mel_fbank_segment), np.asarray(o2.mel_fbank_segment),
        rtol=1e-5, atol=1e-4,
    )

    # mfcc without power_segment: power must still be emitted for Energy
    outs2 = ("mfcc_segment", "energy", "step_valid")
    xla2 = SndEnv(cfg, SR, dtype=jnp.float32, spectrum_method="matmul",
                  use_pallas=False, outputs=outs2)
    pal2 = SndEnv(cfg, SR, dtype=jnp.float32, use_pallas=True,
                  pallas_mode=mode, outputs=outs2)
    o3, o4 = xla2.process(sig), pal2.process(sig)
    assert o4.power_segment is None  # field still dropped from outputs
    np.testing.assert_allclose(
        np.asarray(o3.energy), np.asarray(o4.energy), rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o3.mfcc_segment), np.asarray(o4.mfcc_segment),
        rtol=1e-4, atol=2e-3,
    )


def test_pallas_mode_validation():
    from auditory_tpu.ops.framefft import fused_frame_power_mel

    cfg = default_cfg_2d()
    with pytest.raises(ValueError, match="pallas_mode"):
        SndEnv(cfg, SR, use_pallas=True, pallas_mode="rotate")
    # an explicit window is a masked-mode-only argument
    with pytest.raises(ValueError, match="masked"):
        fused_frame_power_mel(
            jnp.zeros((1, 4096), jnp.float32), 160, 0, 8,
            jnp.zeros((400, 256), jnp.float32),
            jnp.zeros((400, 256), jnp.float32),
            jnp.zeros((256, 128), jnp.float32),
            win=400, n_bins=201, n_mel=32,
            dft=cfg.dft, fbank=cfg.mel.fbank,
            mode="grouped", window=np.hamming(400),
        )
