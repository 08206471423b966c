"""Phone/unit-segment analysis pipeline (the ``examples/gaborview`` path).

The reference's gaborview app (examples/gaborview/gbv.go) processes one
time-aligned slice [SegmentStart, SegmentEnd] of an utterance -- typically one
TIMIT phone -- through the same DFT/mel/MFCC/gabor pipeline, with its own
quirks reproduced here:

- optional *resize* of the segment so its duration aligns with the gabor
  filter size and stride (gbv.go:456-479): widen to one filter width, or up
  to the next stride boundary, extending half before/half after (all after
  when the start would go negative).
- duration "rounded up to the nearest step interval" via
  ``segmentMs += stepMs * (int(segmentMs) % int(stepMs))`` (gbv.go:489-491)
  -- the reference's literal arithmetic, which over-extends rather than
  rounds (quirk).
- BorderSteps defaults to 0 (gbv.go:330-336 WinDefaults).
- energy mode 'gaborview' (sum over the first StepsTotal frequency rows,
  gbv.go:553-560) and delta mode 'gaborview' (d = nume/2*n^2, gbv.go:590-592).
- gabor output is the 2-D layout with byTime=True (gbv.go:300) and
  KWTALayer-only sparsification (gbv.go:839-849; NeighInhib is 4-D-only and
  skipped, gbv.go:823-828).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    DFTParams,
    GaborSet,
    KWTAParams,
    MelParams,
    SndEnvConfig,
    default_gabor_specs,
    msec_to_samples,
)
from ..dsp import design
from ..dsp.dft import dft_power_pipeline
from ..dsp.frame import extract_windows
from ..dsp.gabor import convolve, gabor_out_counts, to_layout_2d
from ..dsp.mel import apply_mel, energy, mfcc_dct, mfcc_deltas
from ..nn.kwta import kwta_layer

__all__ = [
    "SegmentWindowParams",
    "resize_segment",
    "SegmentPipeline",
    "compare_segments",
]


@dataclass(frozen=True)
class SegmentWindowParams:
    """gaborview WinParams (gbv.go:203-240); defaults per WinDefaults
    (gbv.go:330-336)."""

    win_ms: float = 25.0
    step_ms: float = 10.0
    border_steps: int = 0
    resize: bool = True


def resize_segment(
    start_ms: float,
    end_ms: float,
    step_ms: float,
    gset: GaborSet,
) -> Tuple[float, float]:
    """gbv.go:456-479: widen [start, end] to align with the gabor grid."""
    duration = end_ms - start_ms
    size_x_ms = float(gset.size_x) * step_ms
    stride_x_ms = float(gset.stride_x) * step_ms
    add = 0.0
    if duration < size_x_ms:
        add = size_x_ms - duration
    else:
        d = duration - size_x_ms
        rem = float(int(d) % int(stride_x_ms))
        if rem > 0:
            add = stride_x_ms - rem
    if start_ms - add < 0:
        end_ms += add
    else:
        start_ms -= add / 2
        end_ms += add / 2
    return start_ms, end_ms


class SegmentPipeline:
    """Process time slices of an utterance (one phone/CV at a time, or a
    batch of equal-length slices).

    DOCUMENTED DEVIATION: gbv.go's ProcessSetup force-sets
    ``Mel.FBank.NFilters = 32`` (gbv.go:497) and ``LoHz = 0`` (gbv.go:509)
    regardless of user configuration; this class honors arbitrary
    ``MelParams`` instead (a capability extension). To reproduce a literal
    gaborview run, pass the defaults (32 filters, lo_hz=0)."""

    def __init__(
        self,
        sample_rate: int,
        wparams: SegmentWindowParams = SegmentWindowParams(),
        dft: DFTParams = DFTParams(),
        mel: Optional[MelParams] = None,
        gabor: Optional[GaborSet] = None,
        kwta: Optional[KWTAParams] = None,
        by_time: bool = True,
        dtype=jnp.float32,
        spectrum_method: Optional[str] = None,
    ):
        self.sample_rate = sample_rate
        self.wparams = wparams
        self.dft = dft
        self.mel = mel if mel is not None else MelParams()
        # gbv.go InitGabors (gbv.go:318-357): 8x8, stride (6,3), gain 1.5
        # AND the 4-orientation spec grid (0/45/90/135, wavelen 2, phase 0,
        # sigma 0.5, CircleEdge) -- a bare GaborSet() has specs=() and would
        # silently emit zero-filter output
        self.gabor = (
            gabor if gabor is not None
            else GaborSet(specs=default_gabor_specs())
        )
        self.kwta = kwta if kwta is not None else KWTAParams()
        self.by_time = by_time
        self.dtype = jnp.dtype(dtype)
        if spectrum_method is None:
            spectrum_method = "matmul" if self.dtype == jnp.float32 else "fft"
        self.spectrum_method = spectrum_method

        self.win_samples = msec_to_samples(wparams.win_ms, sample_rate)
        self.step_samples = msec_to_samples(wparams.step_ms, sample_rate)
        self.mel_des = design.mel_design(
            self.mel.fbank, self.win_samples, sample_rate
        )
        self.dct_mat = design.dct1_matrix(self.mel.fbank.n_filters)
        self.gabor_bank = design.gabor_filters(self.gabor)
        # optional analysis window (opt-in extension; rectangular by
        # default): folded into the matmul basis / applied on the fft path,
        # same treatment as SndEnv
        self.analysis_win = design.analysis_window(
            dft.window_fn, self.win_samples
        )
        if spectrum_method == "matmul":
            cos_m, sin_m = design.dft_matrices(self.win_samples)
            if self.analysis_win is not None:
                cos_m = cos_m * self.analysis_win[:, None]
                sin_m = sin_m * self.analysis_win[:, None]
            self.dft_basis = (cos_m, sin_m)
        else:
            self.dft_basis = None
        self._jit_cache: Dict[Tuple[int, int], object] = {}

    # gbv.go:489-492 -- the reference's literal "round up" arithmetic
    def steps_total(self, start_ms: float, end_ms: float) -> int:
        segment_ms = end_ms - start_ms
        segment_ms = segment_ms + self.wparams.step_ms * float(
            int(segment_ms) % int(self.wparams.step_ms)
        )
        steps = int(segment_ms / self.wparams.step_ms)
        return steps + 2 * self.wparams.border_steps

    def setup(
        self, start_ms: float, end_ms: float
    ) -> Tuple[float, float, int]:
        """Apply resize + step rounding; returns (start_ms, end_ms, steps)."""
        if end_ms <= start_ms:
            # gbv.go:451-454: "SegmentEnd must be greater than SegmentStart"
            raise ValueError(
                f"SegmentEnd ({end_ms}) must be greater than SegmentStart "
                f"({start_ms}) (gbv.go:451-454)"
            )
        if self.wparams.resize:
            start_ms, end_ms = resize_segment(
                start_ms, end_ms, self.wparams.step_ms, self.gabor
            )
        return start_ms, end_ms, self.steps_total(start_ms, end_ms)

    def _program(self, n_samples: int, steps: int):
        del n_samples  # the program reads signal.shape[-1]; the jit
        # cache key carries the length so one entry per (S, steps)

        mel_w = jnp.asarray(self.mel_des.weights, dtype=self.dtype)
        dct_m = jnp.asarray(self.dct_mat, dtype=self.dtype)
        gab = jnp.asarray(self.gabor_bank, dtype=self.dtype)
        basis = (
            tuple(jnp.asarray(b, dtype=self.dtype) for b in self.dft_basis)
            if self.dft_basis is not None
            else None
        )
        n_mel = self.mel.fbank.n_filters
        offsets = np.asarray(
            [
                self.step_samples * (i - self.wparams.border_steps)
                for i in range(steps)
            ],
            dtype=np.int32,
        )[None, :]  # one "segment"

        def program(signal: jnp.ndarray, start_sample: jnp.ndarray):
            signal = signal.astype(self.dtype)
            starts = jnp.asarray(offsets) + start_sample.astype(jnp.int32)
            windows, valid = extract_windows(
                signal, starts, self.win_samples, signal.shape[-1]
            )
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
            mel_vals = jnp.where(valid[..., None], mel_vals, 0)
            en = energy(logp, "gaborview")
            mfcc = deltas = ddeltas = None
            if self.mel.mfcc:
                mfcc = mfcc_dct(mel_vals, dct_m, self.mel.n_coefs)
                mfcc = jnp.where(valid[..., None], mfcc, 0)
                mfcc = mfcc.at[..., 0].set(en)
                if self.mel.deltas:
                    deltas = mfcc_deltas(mfcc, npn=2, mode="gaborview")
                    ddeltas = mfcc_deltas(deltas, npn=2, mode="gaborview")

            mel_fs = jnp.swapaxes(mel_vals, -1, -2)
            gab4 = convolve(mel_fs, gab, self.gabor, out_pools=None)
            _, tms = gabor_out_counts((n_mel, steps), self.gabor, None)
            graw = to_layout_2d(gab4, self.by_time, tms)
            gk = (
                jax.vmap(lambda g: kwta_layer(self.kwta, g))(graw)
                if self.kwta.on
                else graw
            )
            # inputs are always [B, S] (process() normalizes); drop the
            # grid's singleton "segment" axis but KEEP the batch axis --
            # indexing [0] here would silently discard slices 1..B-1.
            # step_valid is shared across the batch (same slice geometry).
            return {
                "power_segment": jnp.swapaxes(power, -1, -2)[:, 0],
                "log_power_segment": jnp.swapaxes(logp, -1, -2)[:, 0],
                "mel_fbank_segment": mel_fs[:, 0],
                "energy": en[:, 0],
                "mfcc_segment": (
                    jnp.swapaxes(mfcc, -1, -2)[:, 0]
                    if mfcc is not None else None
                ),
                "mfcc_deltas": (
                    jnp.swapaxes(deltas, -1, -2)[:, 0]
                    if deltas is not None else None
                ),
                "mfcc_delta_deltas": (
                    jnp.swapaxes(ddeltas, -1, -2)[:, 0]
                    if ddeltas is not None
                    else None
                ),
                "gabor_raw": graw[:, 0],
                "gabor_kwta": gk[:, 0],
                "step_valid": valid[0],
            }

        return program

    def process(
        self, signal: np.ndarray, start_ms: float, end_ms: float
    ) -> Dict[str, jnp.ndarray]:
        """ProcessSetup + Process for one [start, end] slice (gbv.go:371-625).

        ``signal`` may be 1-D (one utterance; outputs have no batch axis) or
        [B, S] (B equal-length utterances sharing the slice; every output
        except the shared ``step_valid`` gains a leading batch axis)."""
        start_ms, end_ms, steps = self.setup(start_ms, end_ms)
        signal = jnp.asarray(signal)
        if signal.ndim not in (1, 2):
            raise ValueError(
                f"signal must be 1-D or [B, S], got shape {signal.shape}"
            )
        squeeze = signal.ndim == 1
        sig2 = signal[None] if squeeze else signal
        if sig2.shape[-1] > np.iinfo(np.int32).max - self.win_samples:
            # int32 window starts would wrap (same loud refusal as
            # frame.window_starts and StreamingProcessor.load)
            raise ValueError(
                f"signal length {sig2.shape[-1]} exceeds the int32 "
                "window-start range; slice the utterance first"
            )
        key = (sig2.shape[-1], steps)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._program(sig2.shape[-1], steps))
        start_sample = msec_to_samples(start_ms, self.sample_rate)
        out = self._jit_cache[key](sig2, jnp.asarray(start_sample))
        if squeeze:
            out = {
                k: (
                    v[0]
                    if v is not None and k != "step_valid"
                    else v
                )
                for k, v in out.items()
            }
        return out


def _activity_summary(arr: np.ndarray) -> Dict[str, float]:
    """NaN-aware side stats: the NaN mel-triangle quirk makes NaN a
    legitimate value, and a NaN max/mean would leak non-strict JSON through
    ``cli segment --compare``'s json.dumps."""
    finite = arr[np.isfinite(arr)] if arr.size else arr
    return {
        "shape": list(arr.shape),
        "max_abs": float(np.max(np.abs(finite))) if finite.size else 0.0,
        "mean": float(finite.mean()) if finite.size else 0.0,
        "active_frac": float(np.mean(arr != 0)) if arr.size else 0.0,
        **(
            {"nan_frac": float(np.isnan(arr).mean())}
            if arr.size and np.isnan(arr).any()
            else {}
        ),
    }


def compare_segments(
    pipe_a: "SegmentPipeline",
    pipe_b: "SegmentPipeline",
    signal: np.ndarray,
    start_ms: float,
    end_ms: float,
    signal_b: Optional[np.ndarray] = None,
    start_ms_b: Optional[float] = None,
    end_ms_b: Optional[float] = None,
) -> Dict[str, object]:
    """A/B dual-parameter comparison -- the gaborview app's core capability
    (gbv.go:243-258 WParams1/2, PParams1/2, GParams1/2; dual result tabs
    gbv.go:1209-1313): process the same time slice (or two different slices,
    like the reference's CurSnd1/CurSnd2) through two independent parameter
    stacks and summarize how the outputs differ.

    Returns ``{"a": outputs, "b": outputs, "diff": {key: {...}}}`` where each
    diff entry carries both sides' shape/max-abs/mean/active-fraction, the
    active-fraction delta, and -- when the shapes agree -- the max-abs
    elementwise difference.
    """
    out_a = pipe_a.process(signal, start_ms, end_ms)
    out_b = pipe_b.process(
        signal if signal_b is None else signal_b,
        start_ms if start_ms_b is None else start_ms_b,
        end_ms if end_ms_b is None else end_ms_b,
    )
    diff: Dict[str, Dict[str, object]] = {}
    for k in sorted(set(out_a) | set(out_b)):
        va, vb = out_a.get(k), out_b.get(k)
        if va is None and vb is None:
            continue  # disabled on both sides (e.g. mfcc off): no entry
        if va is None or vb is None:
            diff[k] = {"only_in": "a" if vb is None else "b"}
            continue
        na, nb = np.asarray(va), np.asarray(vb)
        if na.dtype == bool:
            na = na.astype(np.float64)
        if nb.dtype == bool:
            nb = nb.astype(np.float64)
        sa, sb = _activity_summary(na), _activity_summary(nb)
        entry: Dict[str, object] = {
            "a": sa,
            "b": sb,
            "active_frac_delta": sb["active_frac"] - sa["active_frac"],
        }
        if na.shape == nb.shape:
            # NaN-aware (the NaN mel-triangle quirk makes NaN a legitimate
            # value): max_abs_diff is the max over positions where BOTH
            # sides are finite (plain np.max would be NaN even for
            # identical sides, hiding real differences in the report and
            # emitting non-strict JSON), and nan_mismatch separately flags
            # NaN placement differing between the sides.
            d = np.abs(na - nb)
            finite = np.isfinite(d)
            entry["max_abs_diff"] = (
                float(d[finite].max()) if finite.any() else 0.0
            )
            mismatch = np.isnan(na) != np.isnan(nb)
            if mismatch.any():
                entry["nan_mismatch"] = int(mismatch.sum())
        diff[k] = entry
    return {"a": out_a, "b": out_b, "diff": diff}
