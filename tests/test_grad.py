"""Differentiability contracts: gradients flow through the full frontend.

The reference is a pure feature extractor feeding neural nets
(sound/sndenv.go orchestrates features consumed by emergent sims); because
this rebuild is functional JAX, the same pipeline is additionally
*differentiable* -- losses can backpropagate through gabor/mel/DFT into the
input signal or into the gabor filter bank itself (learnable frontend).
These tests pin that capability: gradients must exist, be finite, be nonzero,
and match finite differences where the math is smooth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from auditory_tpu.config import KWTAParams
from auditory_tpu.dsp.design import gabor_filters
from auditory_tpu.dsp.gabor import convolve
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d, tone

SR = 16000


def _signal(dur=0.35, seed=3):
    sig = tone(1200.0, dur, SR, amp=0.4).astype(np.float64)
    r = np.random.default_rng(seed)
    return sig + 0.02 * r.standard_normal(sig.shape)


def test_grad_wrt_signal_full_pipeline():
    """d(loss)/d(signal) through frame+DFT+mel+MFCC+gabor: finite, nonzero,
    and equal to central finite differences at the largest-|g| samples."""
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    sig = env.pad(_signal())
    n = sig.shape[-1]
    fn = env.process_fn(n, 0)
    lens = jnp.asarray([n])

    def mel_loss(s):
        out, _ = fn(s[None], lens)
        return jnp.sum(out.mel_fbank_segment ** 2)

    def full_loss(s):
        out, _ = fn(s[None], lens)
        return mel_loss(s) + jnp.sum(out.gabor_raw ** 2)

    g_full = np.asarray(jax.grad(full_loss)(jnp.asarray(sig)))
    assert np.all(np.isfinite(g_full))
    assert np.max(np.abs(g_full)) > 0

    # tight central finite differences on the pure-f64 mel path (gabor_raw is
    # float32 by contract -- its loss quantization would swamp a 1e-6 step)
    g = np.asarray(jax.grad(mel_loss)(jnp.asarray(sig)))
    eps = 1e-6
    base = np.asarray(sig)
    for i in np.argsort(-np.abs(g))[:3]:
        hi, lo = base.copy(), base.copy()
        hi[i] += eps
        lo[i] -= eps
        fd = (
            float(mel_loss(jnp.asarray(hi))) - float(mel_loss(jnp.asarray(lo)))
        ) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-5, atol=1e-8)


def test_grad_wrt_signal_kwta_on():
    """Gradients flow (finite) through the 20-iteration FFFB/XX1 settle."""
    cfg = default_cfg_2d(kwta=KWTAParams(on=True))
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    sig = env.pad(_signal())
    n = sig.shape[-1]
    fn = env.process_fn(n, 0)
    lens = jnp.asarray([n])

    def loss(s):
        out, _ = fn(s[None], lens)
        return jnp.sum(out.gabor_kwta ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(sig)))
    assert np.all(np.isfinite(g))
    assert np.max(np.abs(g)) > 0


def test_grad_wrt_gabor_filters():
    """d(loss)/d(filters) through agabor convolve: the filter bank is a
    trainable parameter (learnable-frontend path, examples/learnable_frontend
    .py); finite-difference checked."""
    cfg = default_cfg_2d()
    gset = cfg.gabor
    filters = jnp.asarray(gabor_filters(gset), dtype=jnp.float64)
    r = np.random.default_rng(11)
    mel_seg = jnp.asarray(r.standard_normal((2, 32, 24)))

    def loss(f):
        return jnp.sum(convolve(mel_seg, f, gset) ** 2)

    g = np.asarray(jax.grad(loss)(filters))
    assert g.shape == filters.shape
    assert np.all(np.isfinite(g))
    assert np.max(np.abs(g)) > 0

    # convolve outputs float32 by contract, so the loss is f32-quantized:
    # use a coarse step and tolerance (this checks AD structure, not ulps)
    eps = 1e-3
    base = np.asarray(filters)
    flat = np.argsort(-np.abs(g).ravel())[:3]
    for j in flat:
        idx = np.unravel_index(j, g.shape)
        hi, lo = base.copy(), base.copy()
        hi[idx] += eps
        lo[idx] -= eps
        fd = (float(loss(jnp.asarray(hi))) - float(loss(jnp.asarray(lo)))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2)


def test_grad_jit_vmap_compose():
    """grad composes with jit and vmap over a batch of signals."""
    cfg = default_cfg_2d()
    env = SndEnv(cfg, SR, dtype=jnp.float64)
    sig = env.pad(_signal(dur=0.25))
    n = sig.shape[-1]
    fn = env.process_fn(n, 0)
    lens = jnp.asarray([n])

    def loss(s):
        out, _ = fn(s[None], lens)
        return jnp.sum(out.mel_fbank_segment ** 2)

    batch = jnp.stack([jnp.asarray(sig), jnp.asarray(sig) * 0.5])
    gs = jax.jit(jax.vmap(jax.grad(loss)))(batch)
    gs = np.asarray(gs)
    assert gs.shape == batch.shape
    assert np.all(np.isfinite(gs))
    # scaling the input changes the gradient: rows must differ
    assert np.max(np.abs(gs[0] - gs[1])) > 0
