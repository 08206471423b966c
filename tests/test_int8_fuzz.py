"""Fuzz the int8 packed transfer across random configurations.

The pack/unpack path has config-dependent geometry (2-D vs 4-D gabor fold,
byTime layouts, NaN mel triangles, multi-rate windows); each sampled config
runs the f32 and int8 packed pipelines side by side and asserts the
documented contract: per-row error within half a quantization step of that
row's own range, NaN positions identical, folded-gabor exact zeros kept."""

import jax.numpy as jnp
import numpy as np
import pytest

from auditory_tpu.pipeline.batch import (
    BatchedSndEnv,
    PackedBatch,
    bucket_length,
)
from auditory_tpu.pipeline.sndenv import SndEnv
from tests.conftest import tone
from tests.test_fuzz_parity import config_is_runnable, sample_cfg

KEYS = ("mel_fbank_segment", "mfcc_segment", "energy", "gabor_raw")


@pytest.mark.parametrize("seed", [910001, 910004, 910007, 910011, 910016,
                                  910021])
def test_int8_roundtrip_fuzz(seed):
    # resample until runnable (a fixed-seed skip would silently drop
    # coverage if the sampler or runnability guard shifts)
    for attempt in range(50):
        rng = np.random.default_rng(seed + 7919 * attempt)
        cfg, sr = sample_cfg(rng)
        if config_is_runnable(cfg, sr):
            break
    else:
        raise AssertionError("no runnable config in 50 resamples")
    keys = tuple(k for k in KEYS if cfg.mel.mfcc or "mfcc" not in k)
    env = SndEnv(cfg, sr, outputs=keys + ("step_valid",))
    sigs = [
        tone(float(rng.uniform(200, sr / 2 * 0.8)), float(rng.uniform(0.3, 0.6)),
             sr, amp=float(rng.uniform(1e-3, 0.9))).astype(np.float32)
        for _ in range(3)
    ]
    sigs = [env.pad(s) for s in sigs]
    blen = bucket_length(max(len(s) for s in sigs), env.timing)
    batch = np.zeros((3, blen), np.float32)
    lengths = np.zeros(3, np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)

    outs = {}
    for td in (None, jnp.int8):
        b = BatchedSndEnv(env, transfer_dtype=td, pack_keys=keys)
        packed, *_ = b.process(batch, lengths)
        assert isinstance(packed, PackedBatch)
        outs[td] = packed.unpack()

    fh, qh = outs[None], outs[jnp.int8]
    assert set(fh) == set(qh)
    for k in fh:
        for i in range(3):
            fv, qv = fh[k][i], qh[k][i]
            assert fv.shape == qv.shape, (k, i)
            fin = np.isfinite(fv)
            assert np.array_equal(np.isfinite(qv), fin), (k, i)
            if not fin.any():
                continue
            rng_ = np.nanmax(fv) - np.nanmin(fv)
            tol = max(float(rng_) / 254.0, 1e-6)
            dev = np.max(np.abs(qv[fin] - fv[fin]), initial=0.0)
            assert dev <= tol, (k, i, dev, tol)
    if "gabor_raw" in fh:
        z = fh["gabor_raw"] == 0
        assert np.all(qh["gabor_raw"][z] == 0)
