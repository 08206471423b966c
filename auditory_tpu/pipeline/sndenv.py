"""The SndEnv pipeline: WAV signal -> power/log-power -> mel -> MFCC(+deltas)
-> gabor -> (neighbor inhibition) -> (kwta), for all segments of an utterance
in one jitted tensor program.

TPU-native replacement for the reference orchestrator ``sound.SndEnv``
(sound/sndenv.go:73-497). Where the reference loops one window at a time
(ProcessSegment -> ProcessStep, sndenv.go:342-452), this builds a single XLA
graph over [n_segments, segment_steps] windows: one gather, two (or zero) DFT
matmuls, one mel matmul, one DCT matmul, one grouped conv -- everything fused
by XLA and executed batched on the MXU.

Output arrays keep the reference's per-segment shapes with a leading segment
axis, e.g. ``power_segment[seg]`` == the reference's PowerSegment [freq, step]
after ProcessSegment(seg).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SndEnvConfig, msec_to_samples
from ..dsp import design
from ..dsp.dft import dft_power_pipeline
from ..dsp.frame import extract_windows, pad_signal, window_starts
from ..dsp.gabor import convolve, gabor_out_counts, to_layout_2d
from ..dsp.mel import apply_mel, energy, mfcc_dct, mfcc_deltas
from ..nn.kwta import kwta_layer, kwta_pool
from ..nn.neigh_inhib import inhib4

__all__ = ["SndEnvOutputs", "SndEnv"]


@jax.tree_util.register_dataclass
@dataclass
class SndEnvOutputs:
    """Per-utterance pipeline outputs (leading axis = segment).

    Shapes follow the reference tensors (sndenv.go:95-163):
      power_segment      [seg, n_bins, steps]     <- PowerSegment
      log_power_segment  [seg, n_bins, steps]     <- LogPowerSegment
      mel_fbank_segment  [seg, n_mel, steps]      <- MelFBankSegment
      energy             [seg, steps]             <- Energy
      mfcc_segment       [seg, n_coefs, steps]    <- MFCCSegment
      mfcc_deltas        [seg, n_coefs, steps]    <- MFCCDeltas
      mfcc_delta_deltas  [seg, n_coefs, steps]    <- MFCCDeltaDeltas
      gabor_raw          [seg, ...]               <- GborOutput (2-D or 4-D layout)
      gabor_kwta         [seg, ...]               <- GborKwta
      step_valid         [seg, steps] bool        (True where the reference
                                                   would have processed the step)
    """

    power_segment: Any
    log_power_segment: Any
    mel_fbank_segment: Any
    energy: Any
    mfcc_segment: Optional[Any]
    mfcc_deltas: Optional[Any]
    mfcc_delta_deltas: Optional[Any]
    gabor_raw: Any
    gabor_kwta: Any
    step_valid: Any


class SndEnv:
    """Configured pipeline for a fixed sample rate.

    Usage::

        env = SndEnv(cfg, sample_rate=16000)
        out = env.process(signal)           # all segments, device arrays

    ``process`` jit-compiles per distinct signal length; call
    :meth:`padded_length` / :func:`dsp.frame.pad_signal` to bucket lengths.
    """

    def __init__(
        self,
        cfg: SndEnvConfig,
        sample_rate: int,
        dtype=jnp.float32,
        spectrum_method: Optional[str] = None,
    ):
        self.cfg = cfg
        self.sample_rate = sample_rate
        self.dtype = jnp.dtype(dtype)
        self.timing = cfg.params.derive(sample_rate)
        if spectrum_method is None:
            spectrum_method = "matmul" if self.dtype == jnp.float32 else "fft"
        self.spectrum_method = spectrum_method

        # host-built constants
        self.mel_des = design.mel_design(
            cfg.mel.fbank, self.timing.win_samples, sample_rate
        )
        self.dct_mat = design.dct1_matrix(cfg.mel.fbank.n_filters)
        self.gabor_bank = design.gabor_filters(cfg.gabor)
        self.analysis_win = design.analysis_window(
            cfg.dft.window_fn, self.timing.win_samples
        )
        if spectrum_method == "matmul":
            self.dft_basis = design.dft_matrices(self.timing.win_samples)
        else:
            self.dft_basis = None

        self._orients = tuple(
            s.with_defaults().orientation for s in cfg.gabor.active_specs()
        )
        self._jit_cache: Dict[Tuple[int, int], Any] = {}

    # ------------------------------------------------------------------
    # geometry helpers
    # ------------------------------------------------------------------

    @property
    def is_4d(self) -> bool:
        # sndenv.go:214-223: both pools zero => 2-D layout
        return self.cfg.gbor_out_pools_x > 0 and self.cfg.gbor_out_pools_y > 0

    def gabor_output_shape(self) -> Tuple[int, ...]:
        cfg = self.cfg
        n_mel = cfg.mel.fbank.n_filters
        steps = self.timing.segment_steps
        nf = cfg.gabor.n_filters
        if self.is_4d:
            return (
                cfg.gbor_out_pools_y,
                cfg.gbor_out_pools_x,
                2,
                nf,
            )
        fc, tc = gabor_out_counts((n_mel, steps), cfg.gabor, None)
        uy = cfg.gbor_out_units_y or fc * 2
        ux = cfg.gbor_out_units_x or tc * nf
        return (uy, ux)

    def seg_cnt(self, n_samples: int) -> int:
        return self.timing.seg_cnt(n_samples)

    # ------------------------------------------------------------------
    # core program
    # ------------------------------------------------------------------

    def _build(self, n_samples: int, add_ms: int):
        cfg = self.cfg
        t = self.timing
        seg_cnt = max(self.seg_cnt(n_samples), 0)
        starts = jnp.asarray(window_starts(t, seg_cnt, add_ms))
        mel_w = jnp.asarray(self.mel_des.weights, dtype=self.dtype)
        dct_m = jnp.asarray(self.dct_mat, dtype=self.dtype)
        gab = jnp.asarray(self.gabor_bank, dtype=self.dtype)
        basis = (
            tuple(jnp.asarray(b, dtype=self.dtype) for b in self.dft_basis)
            if self.dft_basis is not None
            else None
        )
        awin = (
            jnp.asarray(self.analysis_win, dtype=self.dtype)
            if self.analysis_win is not None
            else None
        )
        pools = (
            (cfg.gbor_out_pools_y, cfg.gbor_out_pools_x) if self.is_4d else None
        )
        n_mel = cfg.mel.fbank.n_filters
        steps = t.segment_steps

        def program(signal: jnp.ndarray, signal_len: jnp.ndarray):
            signal = signal.astype(self.dtype)
            windows, valid = extract_windows(
                signal, starts, t.win_samples, signal_len
            )  # [seg, steps, W], [seg, steps]
            power, logp = dft_power_pipeline(
                windows,
                cfg.dft,
                method=self.spectrum_method,
                basis=basis,
                analysis_window=awin,
            )  # [seg, steps, n_bins]
            vmask = valid[..., None]
            power = jnp.where(vmask, power, 0)
            logp = jnp.where(vmask, logp, 0)

            mel_vals = apply_mel(power, mel_w, cfg.mel.fbank)  # [seg, steps, n_mel]
            mel_vals = jnp.where(valid[..., None], mel_vals, 0)

            en = energy(logp, cfg.energy_mode)  # [seg, steps]

            mfcc = deltas = ddeltas = None
            if cfg.mel.mfcc:
                mfcc = mfcc_dct(mel_vals, dct_m, cfg.mel.n_coefs)
                mfcc = jnp.where(valid[..., None], mfcc, 0)
                # coef0 <- Energy for ALL steps (sndenv.go:368-372; runs after
                # the step loop regardless of step validity)
                mfcc = mfcc.at[..., 0].set(en)
                if cfg.mel.deltas:
                    deltas = mfcc_deltas(mfcc, npn=2, mode=cfg.delta_mode)
                    ddeltas = mfcc_deltas(deltas, npn=2, mode=cfg.delta_mode)

            # gabor over the [n_mel, steps] mel matrix (sndenv.go:481-497)
            mel_fs = jnp.swapaxes(mel_vals, -1, -2)  # [seg, n_mel, steps]
            gab4 = convolve(mel_fs, gab, cfg.gabor, out_pools=pools)
            # [seg, fc, tc, 2, nf]

            if self.is_4d:
                py, px = pools
                fc, tc = gab4.shape[1], gab4.shape[2]
                gabor_raw = jnp.zeros(
                    (gab4.shape[0], py, px, 2, gab4.shape[-1]), dtype=jnp.float32
                )
                gabor_raw = gabor_raw.at[:, :fc, :tc].set(gab4)
                ext_gi = inhib4(cfg.neigh_inhib, gabor_raw, self._orients)
                if cfg.kwta.on:
                    if cfg.kwta_pool:
                        gabor_kwta = jax.vmap(
                            lambda g, e: kwta_pool(cfg.kwta, g, e)
                        )(gabor_raw, ext_gi)
                    else:
                        gabor_kwta = jax.vmap(
                            lambda g, e: kwta_layer(cfg.kwta, g, e)
                        )(gabor_raw, ext_gi)
                else:
                    gabor_kwta = gabor_raw
            else:
                _, tms = gabor_out_counts((n_mel, steps), cfg.gabor, None)
                gabor_raw = to_layout_2d(gab4, cfg.by_time, tms)
                uy, ux = self.gabor_output_shape()
                if gabor_raw.shape[-2:] != (uy, ux):
                    buf = jnp.zeros(
                        (gabor_raw.shape[0], uy, ux), dtype=jnp.float32
                    )
                    buf = buf.at[
                        :, : gabor_raw.shape[-2], : gabor_raw.shape[-1]
                    ].set(gabor_raw)
                    gabor_raw = buf
                # NeighInhib is 4-D only (gbv.go:823-828) => no ext_gi in 2-D
                if cfg.kwta.on:
                    gabor_kwta = jax.vmap(lambda g: kwta_layer(cfg.kwta, g))(
                        gabor_raw
                    )
                else:
                    gabor_kwta = gabor_raw

            return SndEnvOutputs(
                power_segment=jnp.swapaxes(power, -1, -2),
                log_power_segment=jnp.swapaxes(logp, -1, -2),
                mel_fbank_segment=mel_fs,
                energy=en,
                mfcc_segment=(
                    jnp.swapaxes(mfcc, -1, -2) if mfcc is not None else None
                ),
                mfcc_deltas=(
                    jnp.swapaxes(deltas, -1, -2) if deltas is not None else None
                ),
                mfcc_delta_deltas=(
                    jnp.swapaxes(ddeltas, -1, -2) if ddeltas is not None else None
                ),
                gabor_raw=gabor_raw,
                gabor_kwta=gabor_kwta,
                step_valid=valid,
            )

        return program

    def process_fn(self, n_samples: int, add_ms: int = 0):
        """The jitted program for signals of exactly ``n_samples`` samples."""
        key = (n_samples, add_ms)
        if key not in self._jit_cache:
            program = self._build(n_samples, add_ms)
            self._jit_cache[key] = jax.jit(program)
        return self._jit_cache[key]

    def process(
        self, signal: np.ndarray, add_ms: int = 0, signal_len: Optional[int] = None
    ) -> SndEnvOutputs:
        """Process one utterance (all segments)."""
        signal = jnp.asarray(signal)
        n = signal.shape[-1]
        fn = self.process_fn(n, add_ms)
        return fn(signal, jnp.asarray(n if signal_len is None else signal_len))

    def pad(self, signal: np.ndarray, value: float = 0.0) -> np.ndarray:
        """SndEnv.Pad (sndenv.go:510-519)."""
        return pad_signal(np.asarray(signal), self.timing, value)

    def adjust_for_silence(
        self, signal: np.ndarray, add: float, existing: float
    ) -> Tuple[np.ndarray, int]:
        """SndEnv.AdjustForSilence (sndenv.go:274-294); host-side trim/pad."""
        offset = 0
        out = np.asarray(signal)
        if add >= 0:
            if add < existing:
                offset = int(existing - add)
                n = msec_to_samples(float(offset), self.sample_rate)
                out = out[n:]
            elif add > existing:
                offset = int(add - existing)
                n = msec_to_samples(float(offset), self.sample_rate)
                out = np.concatenate([np.zeros(n, dtype=out.dtype), out])
        return out, offset
