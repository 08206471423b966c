"""Verify probe (round 4): canonical library drive on the real TPU plus a
factored-frontend equality check with the round-4 corrected split plan.

- Canonical drive (skills/verify): 2000 Hz tone -> hottest mel band must
  bracket the tone frequency.
- Factored probe: spectrum_method='factored' (new contraction-padded plan
  pick, e.g. 48 kHz 48x25 instead of 75x16) must match 'conv' on chip to
  exact-f32 grade.
"""
import numpy as np
import jax

import auditory_tpu as at
from auditory_tpu.io import load_wav


def main() -> None:
    w = load_wav("/root/reference/examples/processspeech/sounds/2000.wav")
    cfg = at.SndEnvConfig(
        gabor=at.GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=at.default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )
    env = at.SndEnv(cfg, w.sample_rate)
    out = jax.block_until_ready(env.process(env.pad(w.sound_to_tensor())))
    mel0 = np.asarray(out.mel_fbank_segment[0])
    band = int(np.argmax(mel0.mean(axis=1)))
    assert env.mel_des.hz_pts[band] <= 2000 <= env.mel_des.hz_pts[band + 2], (
        band, env.mel_des.hz_pts[band], env.mel_des.hz_pts[band + 2])
    print(f"canonical drive OK: 2000 Hz tone -> mel band {band} "
          f"[{env.mel_des.hz_pts[band]:.0f}, "
          f"{env.mel_des.hz_pts[band + 2]:.0f}] Hz")

    import dataclasses

    import jax.numpy as jnp

    from auditory_tpu.config import SndEnvConfig, clamp_mel_to_nyquist
    from auditory_tpu.pipeline.sndenv import SndEnv

    sr = 48000
    rng = np.random.default_rng(13)
    sig = (0.2 * np.sin(2 * np.pi * 1000 * np.arange(sr) / sr)
           + 0.02 * rng.standard_normal(sr)).astype(np.float32)
    cfg48 = clamp_mel_to_nyquist(SndEnvConfig(), sr)
    outs = ("power_segment", "mel_fbank_segment", "step_valid")
    fac = SndEnv(cfg48, sr, dtype=jnp.float32, spectrum_method="factored",
                 outputs=outs)
    plan = fac.factored_plan
    conv = SndEnv(cfg48, sr, dtype=jnp.float32, spectrum_method="conv",
                  outputs=outs)
    of = jax.block_until_ready(fac.process(fac.pad(sig)))
    oc = jax.block_until_ready(conv.process(conv.pad(sig)))
    pf, pc = np.asarray(of.power_segment), np.asarray(oc.power_segment)
    rel = np.abs(pf - pc).max() / np.abs(pc).max()
    assert rel < 1e-5, rel
    mf = np.asarray(of.mel_fbank_segment)
    mc = np.asarray(oc.mel_fbank_segment)
    np.testing.assert_allclose(mf, mc, atol=5e-4)
    print(f"factored(48 kHz, N1xN2={plan.n1}x{plan.n2}) == conv on chip: "
          f"power rel-to-peak {rel:.2e}, mel atol<=5e-4 OK")


if __name__ == "__main__":
    main()
