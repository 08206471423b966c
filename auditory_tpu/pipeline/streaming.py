"""Streaming multi-segment processing (the ``examples/processspeech`` path).

The reference's processspeech app (examples/processspeech/processspeech.go)
predates SndEnv and differs from it in ways reproduced here:

- step offsets use the multi-stride formula
  ``stepsBack = stepsPerStride*(strides-1) + BorderSteps`` with
  ``strides = SegmentMs/StrideMs`` and ``stepsPerStride = StrideMs/StepMs``
  (processspeech.go:276-282), instead of SndEnv's plain BorderSteps.
- segments advance by SegmentSamples (``start = segment*SegmentSamples +
  offset``, processspeech.go:375-377), not StrideSamples.
- a ``MoreSegments`` cursor streams through the file one segment per call
  (processspeech.go:332-352), restarting from the top when exhausted.
- multi-channel sounds are processed per channel into [freq, step, channel]
  tensors (processspeech.go:208-217); here the channel axis is vmapped.

The device computation is shared with :class:`..pipeline.sndenv.SndEnv`'s
building blocks; only the window geometry and the cursor differ.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    DFTParams,
    GaborSet,
    MelParams,
    WindowParams,
    msec_to_samples,
)
from ..dsp import design
from ..dsp.dft import dft_power_pipeline
from ..dsp.frame import extract_windows
from ..dsp.gabor import convolve
from ..dsp.mel import apply_mel, mfcc_dct

__all__ = ["StreamingProcessor"]


class StreamingProcessor:
    """Segment-cursor streaming over a (possibly multi-channel) signal.

    Usage::

        sp = StreamingProcessor(wparams, dft, mel, gabor, sample_rate, channels)
        sp.load(signal)              # [S] or [channels, S]
        while sp.more_segments:
            out = sp.process_segment()   # tensors for the current segment
    """

    def __init__(
        self,
        wparams: WindowParams,
        dft: DFTParams,
        mel: MelParams,
        gabor: GaborSet,
        sample_rate: int,
        channels: int = 1,
        dtype=jnp.float32,
        spectrum_method: Optional[str] = None,
        pad_value: float = 0.0,
    ):
        self.wparams = wparams
        self.dft = dft
        self.mel = mel
        self.gabor = gabor
        self.sample_rate = sample_rate
        self.channels = channels
        self.dtype = jnp.dtype(dtype)
        self.pad_value = pad_value
        if spectrum_method is None:
            spectrum_method = "matmul" if self.dtype == jnp.float32 else "fft"
        self.spectrum_method = spectrum_method

        self.timing = wparams.derive(sample_rate)
        # processspeech.go:276-282 multi-stride offsets
        strides = int(wparams.segment_ms / wparams.stride_ms)
        steps_per_stride = int(wparams.stride_ms / wparams.step_ms)
        steps_back = steps_per_stride * (strides - 1) + wparams.border_steps
        self.steps_back = steps_back
        self.step_offsets = np.asarray(
            [
                self.timing.step_samples * (i - steps_back)
                for i in range(self.timing.segment_steps)
            ],
            dtype=np.int64,
        )

        self.mel_des = design.mel_design(
            mel.fbank, self.timing.win_samples, sample_rate
        )
        self.dct_mat = design.dct1_matrix(mel.fbank.n_filters)
        self.gabor_bank = design.gabor_filters(gabor)
        # optional analysis window (opt-in extension; the reference is
        # rectangular): folded into the matmul basis, applied explicitly on
        # the fft path -- same treatment as SndEnv
        self.analysis_win = design.analysis_window(
            dft.window_fn, self.timing.win_samples
        )
        if spectrum_method == "matmul":
            cos_m, sin_m = design.dft_matrices(self.timing.win_samples)
            if self.analysis_win is not None:
                cos_m = cos_m * self.analysis_win[:, None]
                sin_m = sin_m * self.analysis_win[:, None]
            self.dft_basis = (cos_m, sin_m)
        else:
            self.dft_basis = None

        self.segment = -1
        self.more_segments = False
        self.signal: Optional[np.ndarray] = None
        self._jit_cache: Dict[Tuple[int, int], object] = {}

    # processspeech.go:406-422 (same arithmetic as sndenv.go's Pad --
    # frame.pad_len is the single source of truth)
    def pad(self, signal: np.ndarray) -> np.ndarray:
        from ..dsp.frame import pad_signal

        return pad_signal(signal, self.timing, self.pad_value)

    def load(self, signal: np.ndarray, pad: bool = False) -> None:
        """Load a new sound; resets the segment cursor
        (processspeech.go:307-329 ProcessSound semantics, minus the GUI).

        ``pad=False`` default, faithfully: the reference CALLS Pad but
        DISCARDS its return value (processspeech.go:319 -- `sp.Pad(...)`
        returns the padded slice, never assigned), so every length check in
        the app sees the unpadded signal. ``pad=True`` applies the padding
        Pad was evidently meant to apply (an opt-in extension)."""
        signal = np.asarray(signal)
        if signal.ndim == 1:
            signal = signal[None, :]
        assert signal.shape[0] == self.channels
        if pad:
            signal = self.pad(signal)
        if signal.shape[-1] > np.iinfo(np.int32).max - self.timing.win_samples:
            # same loud refusal as frame.window_starts: int32 window starts
            # would wrap on a >2^31-sample signal and silently read the
            # left zero-pad with valid=True
            raise ValueError(
                f"signal length {signal.shape[-1]} exceeds the int32 "
                "window-start range; split the stream"
            )
        self.signal = signal
        # upload ONCE: process_segment runs per segment, and re-converting
        # the full host array each call would re-pay the host->device
        # transfer hundreds of times on long files
        self._signal_dev = jnp.asarray(signal)
        self.segment = -1
        self.more_segments = True

    def _program(self, n_samples: int):
        t = self.timing
        mel_w = jnp.asarray(self.mel_des.weights, dtype=self.dtype)
        dct_m = jnp.asarray(self.dct_mat, dtype=self.dtype)
        gab = jnp.asarray(self.gabor_bank, dtype=self.dtype)
        basis = (
            tuple(jnp.asarray(b, dtype=self.dtype) for b in self.dft_basis)
            if self.dft_basis is not None
            else None
        )

        def program(signal: jnp.ndarray, segment: jnp.ndarray):
            # [channels, S]; starts per processspeech.go:375-377
            starts = (
                segment.astype(jnp.int32) * t.segment_samples
                + jnp.asarray(self.step_offsets, dtype=jnp.int32)
            )[None, :]
            signal = signal.astype(self.dtype)
            windows, valid = extract_windows(
                signal, starts, t.win_samples, n_samples
            )  # [ch, 1, steps, W]
            awin = (
                jnp.asarray(self.analysis_win, dtype=self.dtype)
                if self.analysis_win is not None
                and self.spectrum_method == "fft"
                else None
            )
            power, logp = dft_power_pipeline(
                windows, self.dft, method=self.spectrum_method, basis=basis,
                analysis_window=awin,
            )
            vmask = valid[..., None]
            power = jnp.where(vmask, power, 0)
            logp = jnp.where(vmask, logp, 0)
            mel_vals = apply_mel(power, mel_w, self.mel.fbank)
            mel_vals = jnp.where(vmask, mel_vals, 0)
            mfcc = None
            if self.mel.mfcc:
                mfcc = mfcc_dct(mel_vals, dct_m, self.mel.fbank.n_filters)
                mfcc = jnp.where(vmask, mfcc, 0)

            mel_fs = jnp.swapaxes(mel_vals, -1, -2)  # [ch, 1, n_mel, steps]
            gab4 = convolve(mel_fs, gab, self.gabor, out_pools=None)
            # processspeech 5-D layout [ch, y, x, 2, nf] (processspeech.go:265)
            gabor5 = gab4[:, 0]

            def refshape(x):  # [ch, 1, steps, k] -> [k, steps, ch]
                return jnp.transpose(x[:, 0], (2, 1, 0))

            return {
                "power_segment": refshape(power),
                "log_power_segment": refshape(logp),
                "mel_fbank_segment": refshape(mel_vals),
                "mfcc_segment": refshape(mfcc) if mfcc is not None else None,
                "gabor": gabor5,
                "step_valid": valid[0],  # [steps] (valid is [1, steps])
            }

        return program

    def process_segment(self) -> Dict[str, jnp.ndarray]:
        """Process the next segment (processspeech.go:332-352). When the
        sound is exhausted the cursor restarts from segment 0 on the next
        call, exactly like the reference's ProcessSegment re-entering
        ProcessSound on the same file (processspeech.go:333-335); check
        ``more_segments`` to drive the loop."""
        if self.signal is None:
            raise RuntimeError("load() a sound first")
        if not self.more_segments:
            # reference re-enters ProcessSound on the same file
            self.segment = -1
            self.more_segments = True
        self.segment += 1
        n = self.signal.shape[-1]
        key = (n, 0)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._program(n))
        out = self._jit_cache[key](
            self._signal_dev, jnp.asarray(self.segment)
        )
        # SoundToWindow failure semantics (processspeech.go:340-345): any
        # step whose window overruns the signal sets MoreSegments=false.
        # DOCUMENTED DEVIATION: the reference still runs the DFT/mel/DCT on
        # the FAILING step with the previous step's stale window
        # (ProcessStep calls the filters unconditionally,
        # processspeech.go:357-364) and never re-zeroes the segment
        # tensors, so trailing steps keep segment N-1's columns; we zero
        # the overrunning steps and report them in step_valid instead --
        # stale-window garbage is mutable-state residue, not signal.
        if not bool(np.all(np.asarray(out["step_valid"]))):
            self.more_segments = False
        remaining = n - self.timing.segment_samples * (self.segment + 1)
        if remaining < self.timing.segment_samples:
            self.more_segments = False
        return out
