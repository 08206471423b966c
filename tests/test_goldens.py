"""Frozen golden-vector regression: the JAX pipeline vs version-controlled
oracle outputs (guards against the oracle and implementation drifting
together)."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import default_cfg_2d

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


@pytest.mark.parametrize("path", GOLDENS, ids=[os.path.basename(p) for p in GOLDENS])
def test_golden(path):
    import dataclasses as dc

    g = np.load(path)
    sr = int(g["sample_rate"])
    sig = g["signal"]
    channels = int(g["channels"]) if "channels" in g.files else 1
    wfn = str(g["window_fn"]) if "window_fn" in g.files else ""
    cfg = default_cfg_2d()
    if wfn:
        # frozen EXTENSION case (opt-in analysis window)
        cfg = dc.replace(cfg, dft=dc.replace(cfg.dft, window_fn=wfn))
    env = SndEnv(cfg, sr, dtype=jnp.float64,
                 spectrum_method="fft", channels=channels)
    out = env.process(sig)
    n_seg = int(g["n_segments"])
    assert out.power_segment.shape[0] == n_seg
    for key, tol in (
        ("power_segment", 1e-5), ("log_power_segment", 1e-5),
        ("mel_fbank_segment", 1e-5), ("energy", 1e-5),
        ("mfcc_segment", 1e-5), ("mfcc_deltas", 1e-5),
        ("mfcc_delta_deltas", 1e-5),
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(out, key)), g[key], atol=tol, rtol=1e-7,
            err_msg=f"{os.path.basename(path)}:{key}",
        )
    np.testing.assert_allclose(
        np.asarray(out.gabor_raw), g["gabor_raw"], atol=1e-4, rtol=1e-5,
    )


def test_goldens_exist():
    assert len(GOLDENS) >= 2, "run tools/make_goldens.py"
