"""processspeech-style streaming processor: multi-stride offsets, segment
cursor, per-channel tensors; plus segment-axis (CP) sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.config import (
    DFTParams,
    GaborSet,
    MelParams,
    WindowParams,
    default_gabor_specs,
)
from auditory_tpu.parallel.mesh import make_mesh
from auditory_tpu.pipeline.batch import BatchedSndEnv
from auditory_tpu.pipeline.sndenv import SndEnv
from auditory_tpu.pipeline.streaming import StreamingProcessor
from tests.conftest import default_cfg_2d, tone

SR = 16000


def make_sp(**kw):
    gset = GaborSet(
        size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
        specs=default_gabor_specs(phases=(0.0, 1.5708)),
    )
    return StreamingProcessor(
        WindowParams(), DFTParams(), MelParams(), gset, SR,
        dtype=jnp.float64, spectrum_method="fft", **kw,
    )


def test_multistride_offsets():
    sp = make_sp()
    # processspeech.go:276-282: strides=1, stepsPerStride=10 ->
    # stepsBack = 10*0 + 2 = 2 => same as sndenv for default geometry
    assert sp.steps_back == 2
    # 300ms segment, 100ms stride: strides=3 -> stepsBack = 10*2+2 = 22
    sp2 = StreamingProcessor(
        WindowParams(segment_ms=300.0), DFTParams(), MelParams(),
        GaborSet(specs=default_gabor_specs()), SR,
    )
    assert sp2.steps_back == 22
    assert sp2.step_offsets[0] == -22 * sp2.timing.step_samples


def test_cursor_and_more_segments():
    sp = make_sp()
    sig = tone(900.0, 0.55, SR)
    sp.load(sig)
    n_done = 0
    while sp.more_segments and n_done < 20:
        out = sp.process_segment()
        n_done += 1
    # exact count for this geometry: 0.55 s = 8800 samples, segments
    # advance by segment_samples=1600; the remaining-check stops after
    # segment k where 8800 - 1600(k+1) < 1600 -> 5 segments, and no
    # segment-0..4 window overruns (last end 4*1600+2160 = 8560 <= 8800)
    n = sp.signal.shape[-1]
    assert n == 8800 and sp.timing.segment_samples == 1600
    assert n_done == 5, n_done
    assert not sp.more_segments
    # cursor restarts like the reference (processspeech.go:333-335)
    out = sp.process_segment()
    assert sp.segment == 0


def test_streaming_shapes_and_reference_layout():
    sp = make_sp(channels=1)
    sig = tone(1200.0, 0.3, SR)
    sp.load(sig)
    out = sp.process_segment()
    nb = sp.timing.n_bins
    steps = sp.timing.segment_steps
    assert out["power_segment"].shape == (nb, steps, 1)
    assert out["mel_fbank_segment"].shape == (32, steps, 1)
    # 5-D gabor layout [ch, y, x, 2, nf] (processspeech.go:265)
    assert out["gabor"].shape[0] == 1 and out["gabor"].shape[3] == 2


def test_streaming_first_segment_matches_sndenv():
    """With default geometry (strides=1) the streaming offsets equal SndEnv's,
    and segment 0 starts at 0 in both -> identical power/mel."""
    sp = make_sp()
    env = SndEnv(default_cfg_2d(), SR, dtype=jnp.float64, spectrum_method="fft")
    sig = env.pad(tone(750.0, 0.35, SR))
    sp.load(sig, pad=False)
    s_out = sp.process_segment()
    e_out = env.process(sig)
    np.testing.assert_allclose(
        np.asarray(s_out["power_segment"])[:, :, 0],
        np.asarray(e_out.power_segment[0]), atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(s_out["mel_fbank_segment"])[:, :, 0],
        np.asarray(e_out.mel_fbank_segment[0]), atol=1e-9,
    )


def test_streaming_stereo_channels():
    sp = make_sp(channels=2)
    sig0 = tone(500.0, 0.3, SR)
    sig1 = tone(2000.0, 0.3, SR)
    sp.load(np.stack([sig0, sig1]))
    out = sp.process_segment()
    mel = np.asarray(out["mel_fbank_segment"])  # [32, steps, 2]
    # channel 0 peaks lower than channel 1
    assert np.argmax(mel[:, 4, 0]) < np.argmax(mel[:, 4, 1])


def test_segment_axis_sharding_long_utterance():
    """One long utterance sharded over the segment axis across 8 devices."""
    env = SndEnv(default_cfg_2d(), SR, dtype=jnp.float64, spectrum_method="fft")
    mesh = make_mesh()
    long_sig = env.pad(tone(640.0, 1.65, SR))  # 16 segments
    plain = env.process(long_sig)

    benv = BatchedSndEnv(env, mesh=mesh, shard_axis="segment")
    out, seg_valid = benv.process(long_sig[None], np.array([len(long_sig)]))
    assert out.mel_fbank_segment.shape[1] == plain.mel_fbank_segment.shape[0]
    np.testing.assert_allclose(
        np.asarray(out.mel_fbank_segment[0]),
        np.asarray(plain.mel_fbank_segment), atol=1e-9,
    )
    shard_devs = {s.device for s in out.mel_fbank_segment.addressable_shards}
    assert len(shard_devs) == 8, "segment axis must be sharded over the mesh"


def test_step_valid_shape_and_overrun_stops_cursor():
    """step_valid is the per-step mask [steps]; any overrunning window sets
    more_segments False (processspeech.go:340-345 SoundToWindow failure)."""
    sp = make_sp()
    t = sp.timing
    # signal long enough for segment 0 but whose segment-0 forward windows
    # overrun: length between segment_samples and the last window end
    last_end = (t.segment_steps - 1 - sp.steps_back) * t.step_samples + \
        t.win_samples
    n = t.segment_samples + (last_end - t.segment_samples) // 2
    sp.load(tone(700.0, n / SR, SR)[:n], pad=False)
    out = sp.process_segment()
    sv = np.asarray(out["step_valid"])
    assert sv.shape == (t.segment_steps,)
    assert not sv.all()
    assert not sp.more_segments


def test_load_pad_default_is_reference_faithful():
    """The reference discards Pad's return value (processspeech.go:319), so
    load() must not pad by default; pad=True opts in."""
    sp = make_sp()
    sig = tone(600.0, 0.31, SR)
    sp.load(sig)
    assert sp.signal.shape[-1] == len(sig)
    sp.load(sig, pad=True)
    assert sp.signal.shape[-1] > len(sig)
