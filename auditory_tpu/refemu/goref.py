"""Literal float64 emulation of the reference pipeline, used as the golden
oracle for parity tests.

The upstream reference (``emer/auditory``, Go) ships no tests and no golden
vectors, and no Go toolchain is available in this environment, so this module
transcribes the reference's *numeric semantics* statement-by-statement into
NumPy scalar loops. It intentionally reproduces the reference's quirks:

- rectangular window straight into the FFT (dft/dft.go:42-59)
- log(power + LogOffSet) with exact ==0 -> LogMin floor (dft/dft.go:73-83)
- mel triangle build with floor-based FreqToBin and possible 0/0 -> NaN
  weights when adjacent mel points land in the same bin (mel/mel.go:99-116)
- Renorm force-disabled by InitFilters (mel/mel.go:80)
- gonum fourier.NewDCT == unnormalized DCT-I (mel/mel.go:198-204)
- Energy[s] = sum over steps of LogPowerSegment[s, :] -- the reference
  indexes the [freq, step] matrix with the *step* index as the frequency row
  (sndenv.go:360-366, FloatValRowCell(s, f) with f ranging over Dim(1))
- MFCC coef0 overwritten with Energy after the DCT already replaced it
  (sndenv.go:368-372)
- the accumulating delta/delta-delta recurrences (sndenv.go:379-432) and the
  gaborview variant with d = nume/2*denom (gbv.go:570-620)
- gabor convolution NaN->0.5 substitution, on/off half-rectification, and
  pos/neg-separate filter renormalization (agabor/gabor.go:194-315)
- left zero-padding for negative window starts; step loop breaks (leaving
  zeros) when a window overruns the signal (sndenv.go:353-359,455-478)

This module is NOT the production path -- it is slow by design and exists so
the vectorized JAX implementation in auditory_tpu/dsp can be tested against
an independent, literal transcription.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from ..config import (
    DFTParams,
    FilterBank,
    GaborSet,
    GaborSpec,
    MelParams,
    SndEnvConfig,
    WindowParams,
    msec_to_samples,
)

# ---------------------------------------------------------------------------
# dft (reference dft/dft.go)
# ---------------------------------------------------------------------------


def dft_filter(
    dft: DFTParams,
    step: int,
    window: np.ndarray,
    win_samples: int,
    power: np.ndarray,
    log_power: np.ndarray,
    power_seg: np.ndarray,
    log_power_seg: np.ndarray,
) -> None:
    """dft.Params.Filter + Power (dft/dft.go:42-85). Mutates the arrays."""
    coefs = np.fft.fft(window.astype(np.complex128))  # unnormalized forward DFT
    for k in range(win_samples // 2 + 1):
        rl = coefs[k].real
        im = coefs[k].imag
        powr = rl * rl + im * im
        if step > 0:
            powr = dft.prev_smooth * power[k] + dft.cur_smooth * powr
        power[k] = powr
        power_seg[k, step] = powr
        if dft.comp_log_pow:
            powr = powr + dft.log_offset
            if powr == 0:
                logp = dft.log_min
            else:
                # np.log, NOT math.log: Go math.Log returns NaN for a
                # negative argument (possible when the user sets a negative
                # LogOffSet, dft/dft.go:79); math.log would raise instead
                with np.errstate(invalid="ignore", divide="ignore"):
                    logp = float(np.log(powr))
            log_power[k] = logp
            log_power_seg[k, step] = logp


# ---------------------------------------------------------------------------
# mel (reference mel/mel.go)
# ---------------------------------------------------------------------------


def freq_to_mel(freq: float) -> float:
    return 1127.0 * math.log(1.0 + freq / 700.0)  # mel/mel.go:156-158


def mel_to_freq(mel: float) -> float:
    return 700.0 * (math.exp(mel / 1127.0) - 1.0)  # mel/mel.go:161-163


def freq_to_bin(freq: float, n_fft: float, sample_rate: float) -> int:
    return int(math.floor(((n_fft + 1) * freq) / sample_rate))  # mel/mel.go:166-168


def init_filters(
    fbank: FilterBank, dft_size: int, sample_rate: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """mel.Params.InitFilters (mel/mel.go:77-117).

    Returns (bin_pts[int32, nf+2], hz_pts[nf+2], filters[nf, nf+2]).
    Renorm is force-disabled by the reference at mel/mel.go:80; callers that
    want renorm must apply it per fbank.renorm_after_init.
    """
    nf = fbank.n_filters
    bin_pts = np.zeros(nf + 2, dtype=np.int64)
    hz_pts = np.zeros(nf + 2, dtype=np.float64)

    hi_mel = freq_to_mel(fbank.hi_hz)
    lo_mel = freq_to_mel(fbank.lo_hz)
    incr = (hi_mel - lo_mel) / float(nf + 1)

    for i in range(nf + 2):
        ml = lo_mel + float(i) * incr
        hz = mel_to_freq(ml)
        hz_pts[i] = hz
        bin_pts[i] = freq_to_bin(hz, float(dft_size), float(sample_rate))

    max_bins = nf + 2
    widest = int(np.max(bin_pts[2:] - bin_pts[:-2])) + 1
    if widest > max_bins:
        raise ValueError(
            f"filter spans {widest} bins > NFilters+2={max_bins}: the Go "
            "reference would panic (index out of range) on this config "
            "(mel/mel.go:96-116 sizes the weight tensor to NFilters+2)"
        )
    filters = np.zeros((nf, max_bins), dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f in range(nf):
            bin_min = int(bin_pts[f])
            bin_ctr = int(bin_pts[f + 1])
            bin_max = int(bin_pts[f + 2])
            pkmin = np.float64(bin_ctr - bin_min)
            pkmax = np.float64(bin_max - bin_ctr)
            fi = 0
            b = bin_min
            while b <= bin_ctr:
                filters[f, fi] = np.float64(b - bin_min) / pkmin
                b += 1
                fi += 1
            while b <= bin_max:
                filters[f, fi] = np.float64(bin_max - b) / pkmax
                b += 1
                fi += 1
    return bin_pts, hz_pts, filters


def filter_dft(
    mel: MelParams,
    step: int,
    power: np.ndarray,
    segment_data: np.ndarray,
    fbank_data: np.ndarray,
    filters: np.ndarray,
    bin_pts: np.ndarray,
) -> None:
    """mel.Params.FilterDft (mel/mel.go:120-153). Mutates fbank_data/segment_data."""
    fb = mel.fbank
    for flt in range(fb.n_filters):
        min_bin = int(bin_pts[flt])
        max_bin = int(bin_pts[flt + 2])
        s = 0.0
        fi = 0
        for b in range(min_bin, max_bin + 1):
            s += filters[flt, fi] * power[b]
            fi += 1
        s += fb.log_off
        if s == 0:
            val = fb.log_min
        else:
            with np.errstate(invalid="ignore", divide="ignore"):
                val = float(np.log(np.float64(s)))
        if fb.renorm_effective:
            val -= fb.renorm_min
            if val < 0.0:
                val = 0.0
            val *= fb.renorm_scale
            if val > 1.0:
                val = 1.0
        fbank_data[flt] = val
        segment_data[flt, step] = val


def dct1(src: np.ndarray) -> np.ndarray:
    """Unnormalized DCT-I, the transform computed by gonum fourier.NewDCT
    (used at mel/mel.go:198-202):

        dst[k] = src[0] + (-1)^k src[n-1] + 2*sum_{i=1}^{n-2} src[i] cos(pi*i*k/(n-1))
    """
    n = len(src)
    if n < 2:
        # gonum fourier.NewDCT(n) panics for n < 2; panic -> ValueError
        raise ValueError(
            f"DCT-I needs n >= 2 inputs, got {n}: gonum NewDCT panics"
        )
    k = np.arange(n, dtype=np.float64)
    i = np.arange(1, n - 1, dtype=np.float64)
    inner = np.cos(np.pi * np.outer(k, i) / (n - 1)) @ src[1 : n - 1]
    return src[0] + ((-1.0) ** k) * src[n - 1] + 2.0 * inner


def cepstrum_dct(
    mel: MelParams, step: int, fbank_data: np.ndarray, mfcc_segment: np.ndarray
) -> None:
    """mel.Params.CepstrumDct (mel/mel.go:192-212). Mutates mfcc_segment."""
    out = dct1(fbank_data.copy())
    el0 = out[0]
    out[0] = math.log(1.0 + el0 * el0)
    for i in range(mel.n_coefs):
        mfcc_segment[i, step] = out[i]


# ---------------------------------------------------------------------------
# agabor (reference agabor/gabor.go)
# ---------------------------------------------------------------------------


def gabor_to_tensor(specs: Tuple[GaborSpec, ...], gset: GaborSet) -> np.ndarray:
    """agabor.ToTensor (gabor.go:89-222): render active specs + pos/neg renorm."""
    active = [s for s in specs if not s.off]
    nhf = nvf = 0
    if gset.distribute:
        for f in active:
            if f.orientation == 0:
                nhf += 1
            elif f.orientation == 90:
                nvf += 1
    else:
        nhf = nvf = 1

    sx, sy = gset.size_x, gset.size_y
    radius_x = float(sx) / 2.0
    radius_y = float(sy) / 2.0
    ctr_x = float(sx - 1) / 2.0
    ctr_y = float(sy - 1) / 2.0
    h_ctr_inc = float(sy - 1) / float(nhf + 1)
    v_ctr_inc = float(sx - 1) / float(nvf + 1)
    h_cnt = v_cnt = 0

    filters = np.zeros((len(active), sy, sx), dtype=np.float64)
    for i, spec in enumerate(active):
        f = spec.with_defaults()
        two_pi_norm = (2.0 * math.pi) / f.wavelen
        l_norm = 1.0 / (2.0 * f.sigma_length * f.sigma_length) if f.sigma_length else 0.0
        w_norm = 1.0 / (2.0 * f.sigma_width * f.sigma_width)

        h_pos = v_pos = 0.0
        if gset.distribute:
            if f.orientation == 0:
                h_pos = h_ctr_inc * float(h_cnt + 1)
                h_cnt += 1
            if f.orientation == 90:
                v_pos = v_ctr_inc * float(v_cnt + 1)
                v_cnt += 1
        else:
            h_pos = h_ctr_inc * float(h_cnt + 1)
            v_pos = v_ctr_inc * float(v_cnt + 1)

        if not f.circular:
            for y in range(sy):
                for x in range(sx):
                    xf = float(x) - ctr_x
                    yf = float(y) - ctr_y
                    if f.orientation == 0:
                        yf = float(y) - h_pos
                    if f.orientation == 90:
                        xf = float(x) - v_pos
                    xfn = xf / radius_x
                    yfn = yf / radius_y
                    dist = math.hypot(xfn, yfn)
                    val = 0.0
                    if not (f.circle_edge and dist > 1.0):
                        radians = f.orientation * math.pi / 180.0
                        nx = xfn * math.cos(radians) - yfn * math.sin(radians)
                        ny = yfn * math.cos(radians) + xfn * math.sin(radians)
                        gauss = math.exp(-(w_norm * nx * nx + l_norm * ny * ny))
                        sin_val = math.sin(two_pi_norm * ny + f.phase_offset)
                        val = gauss * sin_val
                    filters[i, y, x] = val
        else:  # circular variant (gabor.go:172-191)
            norm = 1.0 / (2.0 * f.sigma_width * f.sigma_width)
            for y in range(sy):
                for x in range(sx):
                    xfn = (float(x) - ctr_x) / radius_x
                    yfn = (float(y) - ctr_y) / radius_y
                    nx = xfn * xfn * norm
                    ny = yfn * yfn * norm
                    gauss = math.sqrt(nx + ny)
                    sin_val = math.sin(two_pi_norm * nx * ny)
                    filters[i, y, x] = -gauss * sin_val

    # renorm each half (gabor.go:194-221)
    for i in range(filters.shape[0]):
        pos_sum = filters[i][filters[i] > 0].sum()
        neg_sum = filters[i][filters[i] < 0].sum()
        with np.errstate(divide="ignore"):
            pos_norm = 1.0 / pos_sum if pos_sum != 0 else np.inf
            neg_norm = -1.0 / neg_sum if neg_sum != 0 else np.inf
        fl = filters[i]
        filters[i] = np.where(fl > 0, fl * pos_norm, np.where(fl < 0, fl * neg_norm, fl))
    return filters


def gabor_convolve(
    mel_data: np.ndarray,
    gset: GaborSet,
    filters: np.ndarray,
    raw_out: np.ndarray,
    by_time: bool,
) -> None:
    """agabor.Convolve (gabor.go:225-315). Mutates raw_out (float32)."""
    if mel_data.shape[1] < gset.size_x:
        return

    t_max = 1
    f_max = 1
    t_max_strides = 1
    if raw_out.ndim == 2:
        x = mel_data.shape[1] - gset.size_x
        if not (x == 0 or x < gset.stride_x):
            t_max = x + 1
        z = mel_data.shape[1] - gset.size_x
        t_max_strides = z // gset.stride_x + 1
        y = mel_data.shape[0] - gset.size_y
        if not (y == 0 or y < gset.stride_y):
            f_max = y + 1
    elif raw_out.ndim == 4:
        t_max = min(raw_out.shape[1] * gset.stride_x, mel_data.shape[1] - gset.stride_x)
        f_max = min(raw_out.shape[0] * gset.stride_y, mel_data.shape[0] - gset.stride_y)
    else:
        return

    nf = filters.shape[0]
    t_idx = 0
    for t in range(0, t_max, gset.stride_x):
        f_idx = 0
        for f in range(0, f_max, gset.stride_y):
            for flt in range(nf):
                f_sum = 0.0
                for ff in range(gset.size_y):
                    for ft in range(gset.size_x):
                        i_val = mel_data[f + ff, t + ft]
                        if math.isnan(i_val):
                            i_val = 0.5
                        f_sum += filters[flt, ff, ft] * i_val
                pos = f_sum >= 0.0
                act = np.float32(gset.gain * abs(f_sum))
                if raw_out.ndim == 2:
                    yy = f_idx * 2
                    if by_time:
                        xx = t_idx + t_max_strides * flt
                    else:
                        xx = flt + t_idx * nf
                    if pos:
                        raw_out[yy, xx] = act
                        raw_out[yy + 1, xx] = 0
                    else:
                        raw_out[yy, xx] = 0
                        raw_out[yy + 1, xx] = act
                else:
                    if pos:
                        raw_out[f_idx, t_idx, 0, flt] = act
                        raw_out[f_idx, t_idx, 1, flt] = 0
                    else:
                        raw_out[f_idx, t_idx, 0, flt] = 0
                        raw_out[f_idx, t_idx, 1, flt] = act
            f_idx += 1
        t_idx += 1


# ---------------------------------------------------------------------------
# SndEnv (reference sound/sndenv.go)
# ---------------------------------------------------------------------------


class SndEnvRef:
    """Literal emulation of sound.SndEnv's segment pipeline (sndenv.go:195-497).

    Usage: construct with a config, call init(signal, sample_rate), then
    process_segment(seg) and apply_gabor() per segment, reading the public
    arrays (power_segment, log_power_segment, mel_fbank_segment,
    mfcc_segment, mfcc_deltas, mfcc_delta_deltas, energy, gbor_output).
    """

    def __init__(self, cfg: SndEnvConfig):
        self.cfg = cfg

    def init(self, signal: np.ndarray, sample_rate: int, channels: int = 1) -> None:
        cfg = self.cfg
        self.signal = np.asarray(signal, dtype=np.float64)
        self.t = cfg.params.derive(sample_rate)
        self.sample_rate = sample_rate
        self.channels = channels

        self.gabor_filters = gabor_to_tensor(cfg.gabor.active_specs(), cfg.gabor)
        self.bin_pts, self.hz_pts, self.mel_filters = init_filters(
            cfg.mel.fbank, self.t.win_samples, sample_rate
        )

        nb = self.t.n_bins
        ss = self.t.segment_steps
        nfmel = cfg.mel.fbank.n_filters
        # opt-in analysis window (extension; the reference is rectangular).
        # Independent of dsp.design on purpose: the classic closed forms,
        # matching np.hamming/np.hanning (symmetric, N-1 denominator).
        if cfg.dft.window_fn is None:
            self._analysis_win = None
        elif cfg.dft.window_fn in ("hamming", "hann"):
            w = self.t.win_samples
            ii = np.arange(w, dtype=np.float64)
            c = np.cos(2.0 * np.pi * ii / (w - 1))
            self._analysis_win = (
                0.54 - 0.46 * c if cfg.dft.window_fn == "hamming"
                else 0.5 - 0.5 * c
            )
        else:
            raise ValueError(f"unknown window_fn: {cfg.dft.window_fn}")
        self.window = np.zeros(self.t.win_samples, dtype=np.float64)
        self.power = np.zeros(nb, dtype=np.float64)
        self.log_power = np.zeros(nb, dtype=np.float64)
        self.power_segment = np.zeros((nb, ss), dtype=np.float64)
        self.log_power_segment = np.zeros((nb, ss), dtype=np.float64)
        self.mel_fbank = np.zeros(nfmel, dtype=np.float64)
        self.mel_fbank_segment = np.zeros((nfmel, ss), dtype=np.float64)
        self.energy = np.zeros(ss, dtype=np.float64)
        if cfg.mel.mfcc:
            self.mfcc_segment = np.zeros((cfg.mel.n_coefs, ss), dtype=np.float64)
            self.mfcc_deltas = np.zeros((cfg.mel.n_coefs, ss), dtype=np.float64)
            self.mfcc_delta_deltas = np.zeros((cfg.mel.n_coefs, ss), dtype=np.float64)
        self.seg_cnt = self.t.seg_cnt(len(self.signal), channels)

        # gabor output geometry (sndenv.go:214-223). The reference requires
        # the caller to preset GborOutUnitsY/X (e.g. gbv.go:799-812 computes
        # sy=(floor((melY-gaborY)/strideY)+1)*2, sx=(floor((melX-gaborX)/
        # strideX)+1)*nf); when left 0 we derive those same counts.
        if (cfg.gbor_out_pools_x > 0) != (cfg.gbor_out_pools_y > 0):
            # sndenv.go:220-222 rejects mixed pools ("must both be == 0 or
            # > 0") and leaves GborOutput unshaped -- processing is invalid,
            # so the oracle must not fabricate a zero-sized tensor for it
            raise ValueError(
                "GborOutPoolsX & GborOutPoolsY must both be == 0 or > 0 "
                "(sndenv.go:220-222)"
            )
        if cfg.gbor_out_pools_x == 0 and cfg.gbor_out_pools_y == 0:
            uy, ux = cfg.gbor_out_units_y, cfg.gbor_out_units_x
            if uy == 0 and ux == 0:
                nfilt = len(cfg.gabor.active_specs())
                fc = (nfmel - cfg.gabor.size_y) // cfg.gabor.stride_y + 1
                tc = (ss - cfg.gabor.size_x) // cfg.gabor.stride_x + 1
                uy, ux = fc * 2, tc * nfilt
            self.gbor_output = np.zeros((uy, ux), dtype=np.float32)
        else:
            self.gbor_output = np.zeros(
                (
                    cfg.gbor_out_pools_y,
                    cfg.gbor_out_pools_x,
                    cfg.gbor_out_units_y,
                    cfg.gbor_out_units_x,
                ),
                dtype=np.float32,
            )

    # sndenv.go:455-478
    def _snd_to_window(self, start: int) -> bool:
        end = start + self.t.win_samples
        if end > len(self.signal):
            return False
        if start < 0 and end <= 0:
            self.window = np.zeros(end - start, dtype=np.float64)
        elif start < 0:
            self.window = np.concatenate(
                [np.zeros(-start, dtype=np.float64), self.signal[:end]]
            )
        else:
            self.window = self.signal[start:end]
        return True

    # sndenv.go:438-452
    def _process_step(self, segment: int, step: int, add: int) -> bool:
        offset = self.t.step_offsets[step] + msec_to_samples(float(add), self.sample_rate)
        start = segment * self.t.stride_samples + offset
        if not self._snd_to_window(start):
            return False
        win = self.window
        if self._analysis_win is not None:
            # opt-in analysis-window extension (the reference is
            # rectangular); the oracle applies it before the FFT exactly
            # like the production pipelines fold it into the basis
            win = win * self._analysis_win
        dft_filter(
            self.cfg.dft,
            step,
            win,
            self.t.win_samples,
            self.power,
            self.log_power,
            self.power_segment,
            self.log_power_segment,
        )
        filter_dft(
            self.cfg.mel,
            step,
            self.power,
            self.mel_fbank_segment,
            self.mel_fbank,
            self.mel_filters,
            self.bin_pts,
        )
        if self.cfg.mel.mfcc:
            cepstrum_dct(self.cfg.mel, step, self.mel_fbank, self.mfcc_segment)
        return True

    def process_segment(self, segment: int, add: int = 0) -> None:
        """sndenv.go:342-433."""
        cfg = self.cfg
        ss = self.t.segment_steps
        self.power[:] = 0
        self.log_power[:] = 0
        self.power_segment[:] = 0
        self.log_power_segment[:] = 0
        self.energy[:] = 0
        self.mel_fbank_segment[:] = 0
        if cfg.mel.mfcc:
            self.mfcc_segment[:] = 0

        for s in range(ss):
            if not self._process_step(segment, s, add):
                break  # reference prints the error and breaks (sndenv.go:353-359)

        # Energy, per cfg.energy_mode:
        # - 'sndenv' (sndenv.go:360-366): FloatValRowCell(s, f) uses the
        #   *step* index s as the frequency row of the [freq, step] matrix;
        # - 'gaborview' (gbv.go:553-560): sums the first `steps` frequency
        #   rows at step s instead;
        # - 'spectral': the bug-free full-column sum (extension).
        for s in range(ss):
            e = 0.0
            if cfg.energy_mode == "sndenv":
                for f in range(self.log_power_segment.shape[1]):
                    e += self.log_power_segment[s, f]
            elif cfg.energy_mode == "gaborview":
                for f in range(ss):
                    e += self.log_power_segment[f, s]
            else:  # spectral
                for f in range(self.log_power_segment.shape[0]):
                    e += self.log_power_segment[f, s]
            self.energy[s] = e

        if cfg.mel.mfcc:
            for s in range(ss):
                self.mfcc_segment[0, s] = self.energy[s]

        npn = 2
        if cfg.mel.mfcc and cfg.mel.deltas:
            self._deltas(self.mfcc_segment, self.mfcc_deltas, npn)
            self._deltas(self.mfcc_deltas, self.mfcc_delta_deltas, npn)

    def _deltas(self, src: np.ndarray, dst: np.ndarray, npn: int) -> None:
        """The accumulating delta recurrence (sndenv.go:379-432) and the
        gaborview variant (gbv.go:570-620) selected by cfg.delta_mode."""
        ss = self.t.segment_steps
        ncoef = self.cfg.mel.n_coefs
        gbv = self.cfg.delta_mode == "gaborview"
        for s in range(ss):
            prv = 0.0
            nxt = 0.0
            for i in range(ncoef):
                nume = 0.0
                for n in range(1, npn + 1):
                    sprv = max(s - n, 0)
                    snxt = min(s + n, ss - 1)
                    prv += src[i, sprv]
                    nxt += src[i, snxt]
                    nume += float(n) * (nxt - prv)
                    denom = float(2 * n * n)
                    if gbv:
                        d = nume / 2.0 * float(n * n)  # gbv.go:590-592
                    else:
                        d = nume / denom  # sndenv.go:398-399
                    dst[i, s] = d

    def apply_gabor(self) -> np.ndarray:
        """sndenv.go:481-497 without the kwta/neigh-inhib stages (external dep;
        see auditory_tpu/nn for the behavioral equivalents)."""
        self.gbor_output[:] = 0
        gabor_convolve(
            self.mel_fbank_segment,
            self.cfg.gabor,
            self.gabor_filters,
            self.gbor_output,
            self.cfg.by_time,
        )
        return self.gbor_output

    # sndenv.go:503-519 -- note Go's % takes the sign of the dividend
    def tail(self, signal: np.ndarray) -> int:
        if self.t.stride_samples == 0:
            # Go panics (integer divide by zero, sndenv.go:506); panic ->
            # ValueError per the documented convention -- do NOT invent a
            # value for a config the reference cannot run
            raise ValueError(
                "stride_samples == 0: the reference panics (sndenv.go:506)"
            )
        temp = len(signal) - self.t.segment_samples
        return int(math.fmod(temp, self.t.stride_samples))

    def pad(self, signal: np.ndarray, value: float = 0.0) -> np.ndarray:
        tail = self.tail(signal)
        pad_len = (
            self.t.segment_samples
            - self.t.step_samples
            - int(math.fmod(tail, self.t.step_samples))
        )
        return np.concatenate([signal, np.full(pad_len, value, dtype=np.float64)])

    # sndenv.go:274-294
    def adjust_for_silence(self, add: float, existing: float) -> int:
        offset = 0
        if add >= 0:
            if add < existing:
                offset = int(existing - add)
                n = msec_to_samples(float(offset), self.sample_rate)
                self.signal = self.signal[n:]
            elif add > existing:
                offset = int(add - existing)
                n = msec_to_samples(float(offset), self.sample_rate)
                self.signal = np.concatenate([np.zeros(n, dtype=np.float64), self.signal])
        return offset
