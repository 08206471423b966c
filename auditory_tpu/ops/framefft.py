"""Pallas TPU kernel: fused frame-extract + DFT power + log + mel filterbank.

The hot path of the pipeline (SURVEY.md call stack 3.1, hot loop #1) is
window -> DFT -> power -> log -> mel, executed for every (segment, step) of
every utterance. The XLA version materializes the gathered windows
[B, n_windows, W] and the re/im spectra in HBM between fusions; this kernel
keeps everything in VMEM: the signal row is loaded once per utterance, each
window is dynamically sliced in-register, the DFT runs as two MXU matmuls
against the cos/sin basis (for the 400-1102 point windows used here a dense
DFT matmul beats an FFT on the MXU and is exact), and power/log/mel never
leave the chip until the final [B, n_windows, n_mel] result.

Semantics preserved (dft/dft.go:62-85, mel/mel.go:120-153):
- power[k] = re^2 + im^2 of the unnormalized DFT, bins 0..N/2
- log = ln(power + LogOffSet) with the ==0 -> LogMin floor
- mel = ln(sum_bins W[f, k] power[k] + LogOff), ==0 -> LogMin floor

Caller contract (see pipeline integration): the signal must be pre-padded so
every window start is >= 0 and start+W <= len(signal_padded); invalid steps
are masked by the caller (they read zero padding here). prev_smooth > 0 is
not supported (falls back to the XLA path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DFTParams, FilterBank

__all__ = ["fused_frame_power_mel", "WINDOW_BLOCK"]

WINDOW_BLOCK = 16  # windows processed per grid step (f32 sublane multiple)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    # scalar prefetch
    starts_ref,              # [n_win_pad] int32 window starts (SMEM)
    # inputs
    signal_ref,              # [1, 1, s_pad] f32 (VMEM) one utterance row
    cos_ref,                 # [w, k_pad] f32
    sin_ref,                 # [w, k_pad] f32
    melw_ref,                # [k_pad, m_pad] f32
    # outputs
    power_ref,               # [1, BLK, k_pad] f32
    logp_ref,                # [1, BLK, k_pad] f32
    mel_ref,                 # [1, BLK, m_pad] f32
    *,
    win: int,
    log_offset: float,
    log_min: float,
    mel_log_off: float,
    mel_log_min: float,
    comp_log: bool,
):
    wblk = pl.program_id(1)
    base = wblk * WINDOW_BLOCK

    # gather this block's windows into VMEM: [BLK, win]
    def load_window(i):
        start = starts_ref[base + i]
        return signal_ref[0, 0, pl.ds(start, win)]

    windows = jnp.stack([load_window(i) for i in range(WINDOW_BLOCK)])

    re = jnp.dot(windows, cos_ref[:, :], preferred_element_type=jnp.float32)
    im = jnp.dot(windows, sin_ref[:, :], preferred_element_type=jnp.float32)
    power = re * re + im * im
    power_ref[0] = power

    if comp_log:
        shifted = power + log_offset
        logp_ref[0] = jnp.where(
            shifted == 0.0, log_min, jnp.log(jnp.where(shifted == 0.0, 1.0, shifted))
        )
    else:
        logp_ref[0] = jnp.zeros_like(power)

    mel_sum = (
        jnp.dot(power, melw_ref[:, :], preferred_element_type=jnp.float32)
        + mel_log_off
    )
    mel_ref[0] = jnp.where(
        mel_sum == 0.0, mel_log_min, jnp.log(jnp.where(mel_sum == 0.0, 1.0, mel_sum))
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "win", "n_bins", "n_mel", "dft", "fbank", "interpret",
    ),
)
def fused_frame_power_mel(
    signal_padded: jnp.ndarray,   # [B, s_pad] f32, all starts in-range
    starts: jnp.ndarray,          # [n_win] int32
    cos_basis: jnp.ndarray,       # [win, k_pad]
    sin_basis: jnp.ndarray,       # [win, k_pad]
    mel_weights: jnp.ndarray,     # [k_pad, m_pad] (zero rows beyond n_bins)
    *,
    win: int,
    n_bins: int,
    n_mel: int,
    dft: DFTParams,
    fbank: FilterBank,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (power, log_power, log_mel): [B, n_win, n_bins] x2 and
    [B, n_win, n_mel]."""
    assert dft.prev_smooth == 0.0, "prev_smooth>0 uses the XLA path"
    b, s_pad = signal_padded.shape
    # lane-align the signal row and give it a unit sublane dim so the block
    # shape (1, 1, s_pad) satisfies the TPU tiling constraints
    s_aligned = _round_up(max(s_pad, 128), 128)
    if s_aligned != s_pad:
        signal_padded = jnp.pad(signal_padded, ((0, 0), (0, s_aligned - s_pad)))
        s_pad = s_aligned
    signal_padded = signal_padded[:, None, :]
    (n_win,) = starts.shape
    k_pad = cos_basis.shape[1]
    m_pad = mel_weights.shape[1]
    n_win_pad = _round_up(max(n_win, 1), WINDOW_BLOCK)
    if n_win_pad != n_win:
        starts = jnp.concatenate(
            [starts, jnp.zeros(n_win_pad - n_win, dtype=starts.dtype)]
        )

    kernel = functools.partial(
        _kernel,
        win=win,
        log_offset=float(dft.log_offset),
        log_min=float(dft.log_min),
        mel_log_off=float(fbank.log_off),
        mel_log_min=float(fbank.log_min),
        comp_log=bool(dft.comp_log_pow),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_win_pad // WINDOW_BLOCK),
        in_specs=[
            pl.BlockSpec((1, 1, s_pad), lambda bi, wi, starts: (bi, 0, 0)),
            pl.BlockSpec((win, k_pad), lambda bi, wi, starts: (0, 0)),
            pl.BlockSpec((win, k_pad), lambda bi, wi, starts: (0, 0)),
            pl.BlockSpec((k_pad, m_pad), lambda bi, wi, starts: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, WINDOW_BLOCK, k_pad), lambda bi, wi, starts: (bi, wi, 0)
            ),
            pl.BlockSpec(
                (1, WINDOW_BLOCK, k_pad), lambda bi, wi, starts: (bi, wi, 0)
            ),
            pl.BlockSpec(
                (1, WINDOW_BLOCK, m_pad), lambda bi, wi, starts: (bi, wi, 0)
            ),
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((b, n_win_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, n_win_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, n_win_pad, m_pad), jnp.float32),
    ]
    flops = 2 * b * n_win_pad * win * k_pad * 2 + 2 * b * n_win_pad * k_pad * m_pad
    power, logp, mel = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (b * s_pad + b * n_win_pad * (2 * k_pad + m_pad)),
            transcendentals=b * n_win_pad * (k_pad + m_pad),
        ),
    )(starts, signal_padded, cos_basis, sin_basis, mel_weights)

    return (
        power[:, :n_win, :n_bins],
        logp[:, :n_win, :n_bins],
        mel[:, :n_win, :n_mel],
    )


def pad_basis(
    cos_m: np.ndarray, sin_m: np.ndarray, mel_w: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad DFT basis columns (bins) and mel rows/cols to lane multiples.

    mel_w comes in as [n_mel, n_bins] (design layout) and is returned
    transposed-padded as [k_pad, m_pad] with zero rows for the padding bins,
    so padded power bins contribute exactly 0 to every mel sum.
    """
    n_bins = cos_m.shape[1]
    n_mel = mel_w.shape[0]
    k_pad = _round_up(n_bins, 128)
    m_pad = _round_up(n_mel, 128)
    cos_p = np.zeros((cos_m.shape[0], k_pad), dtype=np.float32)
    sin_p = np.zeros((sin_m.shape[0], k_pad), dtype=np.float32)
    cos_p[:, :n_bins] = cos_m
    sin_p[:, :n_bins] = sin_m
    w_p = np.zeros((k_pad, m_pad), dtype=np.float32)
    w_p[:n_bins, :n_mel] = mel_w.T
    return cos_p, sin_p, w_p
