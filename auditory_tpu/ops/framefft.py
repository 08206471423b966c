"""Pallas TPU kernel: fused frame-extract + DFT power + log + mel filterbank.

The hot path of the pipeline (SURVEY.md call stack 3.1, hot loop #1) is
window -> DFT -> power -> log -> mel for every window of every utterance.
The XLA production path (``dsp.dft.power_spectrum_conv``) already turns this
into a strided conv + matmul; this kernel additionally keeps the power
spectrum entirely in VMEM (one HBM round trip fewer) and demonstrates the
full fusion: per grid step it loads 128-lane-aligned signal chunks, extracts
the windows with static in-register slices, runs the DFT as two MXU matmuls
against the cos/sin basis, and applies power/log/mel without leaving the
chip.

Mosaic on this TPU only supports *dynamic* lane-dim loads at 128-aligned
offsets (verified empirically; unaligned dynamic slices and dynamic rolls
crash the compiler). The kernel therefore requires the uniform window grid
``start_i = step*i + c`` and exploits that the start residues mod 128 repeat
with period p = 128/gcd(step, 128): with a block of BLOCK windows (BLOCK a
multiple of p), the residue of each block slot is a compile-time constant,
so every load is an aligned dynamic base + static slot offset, and the
unaligned remainder moves into residue-shifted copies of the DFT basis
(Mosaic also rejects unaligned static value-slices).

Semantics preserved (dft/dft.go:62-85, mel/mel.go:120-153):
- power[k] = re^2 + im^2 of the unnormalized DFT, bins 0..N/2
- log = ln(power + LogOffSet) with the exact ==0 -> LogMin floor
- mel = ln(sum_k W[f,k] power[k] + LogOff), ==0 -> LogMin floor

Caller contract: signal pre-padded so every window start is >= 0 and
start + chunk <= len(signal_padded); invalid steps are masked by the caller
(they read zero padding here). prev_smooth > 0 uses the XLA path.

PRECISION (round 3): the in-kernel `precision=` argument cannot replicate
XLA's multi-pass f32 emulation (an HLO-level rewrite Mosaic does not
perform), so the kernel performs it MANUALLY: f32 operands split into bf16
limbs (constants pre-split on the host; signal/power split in-kernel) and
the significant cross-products accumulated on the MXU. ``passes=1`` is the
native bf16-operand mode (~2.5e-3 rel power error), ``passes=3`` the hi/lo
grade (~2^-16), ``passes=6`` full f32 emulation -- verified on chip at the
same exact-f32 parity bounds as the conv path (power 7.0e-7 rel-to-peak,
mel 1.05e-4 abs; tools/tpu_parity_check.py --pallas 6).

PERFORMANCE (measured, B=512 x 3 s mel-only, 16 kHz): masked mode fixes
grouped mode's row starvation -- passes=6 halves from 9.84 ms (grouped) to
5.88-5.98 ms, and passes=1 with output gating TIES the conv default tier
(3.44 vs 3.45 ms) -- but the XLA conv stays ahead at the exact grade
(4.6-4.8 ms): the manual limb emulation (12 in-kernel dots + per-block
operand splits) costs more than XLA's HLO-level pass structure. block=128
measured WORSE than 64 both modes (n_pad padding waste: 384 vs 320 rows
for 300 windows). At 44.1 kHz (masked-only eligibility) the kernel loses
to dense frames at both grades (26.5 vs 18.1 exact; 9.42 vs 9.01
default): chunk pads 1103 -> 1280 and p=128 forces block=128's 28% n_pad
waste. The XLA dense frontends remain the dispatch picks at every grade;
the kernel stays the opt-in fused-fusion position (use_pallas=True). See
BENCH_NOTES_r04.md.

'merged' mode probed whether the dot COUNT (vs MACs) carries any of the
deficit: one cos|sin operand makes each limb product a single [block,
chunk] x [chunk, 2*k_pad] dot -- the conv's per-pass GEMM shape, half the
dots, identical MACs. Measured NEUTRAL at 6/3 passes (5.81/4.25 ms vs
masked 5.75/4.22, same invocation) and WORSE at passes=1 (4.28 vs 3.49):
MXU time tracks padded MACs, not dot count. With that, the kernel's cost
is linear in the limb-PRODUCT count (~3.5 + k*0.75 ms for k products)
while the conv's HIGHEST==HIGH time says the conv is data-movement-bound,
not MAC-bound: the exact grade needs 6 bf16x bf16 products (3 limbs) by
arithmetic necessity, so no kernel of this family can beat the conv at
exact. The one tier where the kernel leads is high/3-pass (masked 4.22 vs
conv 4.57, -8%, single reading) -- not enough margin to move the dispatch.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..config import DFTParams, FilterBank

__all__ = ["fused_frame_power_mel", "pad_basis", "supported_geometry"]

# Kernel formulations (fused_frame_power_mel(mode=...)):
#   "grouped": residue-grouped matmuls -- one MXU matmul per start-residue
#       variant (M = block/period rows each) against residue-shifted basis
#       copies. Round-2/3 design; loses to the conv frontend because the
#       per-variant matmuls row-starve the MXU and the p basis copies bloat
#       VMEM (44.1 kHz p=128 infeasible compiled).
#   "masked": mask-and-tile -- ALL block rows load at their 128-aligned
#       offsets, a static per-slot mask zeroes (or analysis-windows) each
#       row outside its true window, and ONE full-M matmul runs against a
#       single row-tiled basis (row m = basis[m mod win]; exact, since
#       cos/-sin are win-periodic in the row index). The alignment shift
#       becomes a per-bin phase e^{-2pi*i*k*rem/win} on the DFT -- an
#       isometry that CANCELS in the power spectrum, and power is all this
#       kernel emits -- so no rotation is materialized. Fixes both grouped
#       losses (full-M matmul, one basis copy) and lifts the residue-period
#       VMEM blowup: odd strides (44.1 kHz) become Pallas-eligible.
#   "merged": masked + fused re|im basis -- the cos and -sin tiled bases
#       concatenate along the bin axis into one [chunk, 2*k_pad] operand,
#       so each limb product is ONE MXU dot producing [block, 2*k_pad]
#       (re | im by static column split) instead of two k_pad-wide dots.
#       Identical MACs and identical per-product f32 accumulation (the
#       MXU contracts per output column), but half the dot count: the XLA
#       conv frontend owes part of its exact-grade lead to computing
#       re+im as output channels of a single contraction per pass -- this
#       gives the kernel the same GEMM shape per pass.
PALLAS_MODES = ("grouped", "masked", "merged")
# modes sharing the mask-and-tile load/mask structure (single tiled basis)
_MASKLIKE = ("masked", "merged")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def variants_vmem_bytes(step_samples: int, win: int, passes: int = 6) -> int:
    """VMEM footprint of the kernel's residue-variant basis tensors at the
    given pass count ([limbs, p, chunk, k_pad] bf16 when passes > 1, f32
    [p, chunk, k_pad] at passes=1). The kernel holds TWO such tensors
    (cos_v AND sin_v) single-buffered in VMEM simultaneously, so both are
    counted; they — not the block size — are the binding constraint on
    large residue periods. Measured on chip: the 44.1 kHz geometry (p=128,
    win=1102) at passes=6 wants bf16[3,128,1280,640] = 600 MB *per tensor*
    against 128 MB of VMEM and fails to compile."""
    p = 128 // math.gcd(step_samples, 128)
    chunk = _round_up(win, 128) + 128
    k_pad = _round_up(win // 2 + 1, 128)
    bytes_per = 4 if passes == 1 else 2 * _n_limbs(passes)
    return 2 * p * chunk * k_pad * bytes_per  # cos_v + sin_v


_VMEM_VARIANTS_BUDGET = 64 * 1024 * 1024  # half of v5e VMEM for cos_v+sin_v
# combined: leave the other half for the signal window, mel-weight limbs
# and the double-buffered output blocks


def masked_vmem_bytes(
    step_samples: int, win: int, passes: int = 6, block: int = 64
) -> int:
    """VMEM footprint of masked-mode constants: the single row-tiled basis
    pair ([limbs, chunk, k_pad] bf16 when passes > 1, f32 at passes=1) plus
    the f32 [block, chunk] window mask. No residue-variant axis -- this is
    what makes odd strides (p=128) feasible where grouped mode wants 600 MB
    (see :func:`variants_vmem_bytes`)."""
    p = 128 // math.gcd(step_samples, 128)
    blk = _round_up(max(p, block), p)
    chunk = _round_up(win + 127, 128)  # worst-case residue slack
    k_pad = _round_up(win // 2 + 1, 128)
    bytes_per = 4 if passes == 1 else 2 * _n_limbs(passes)
    return 2 * chunk * k_pad * bytes_per + blk * chunk * 4


def supported_geometry(
    step_samples: int, max_block: int = 64, win: int = 0,
    interpret: bool = False, passes: int = 6, mode: str = "grouped",
) -> bool:
    """True when the geometry compiles under the given kernel mode.

    ``grouped``: the residue period p = 128/gcd(step,128) must fit in one
    block AND the residue-variant basis tensor must fit the VMEM budget
    (the compiled kernel's real constraint -- see
    :func:`variants_vmem_bytes`; the footprint scales with the pass count's
    limb count, so passes=1/3 geometries can be feasible where passes=6 is
    not). Interpret mode (CPU tests) has no VMEM, so the budget check is
    skipped there; ``win=0`` (unknown) also skips it.

    ``masked``/``merged``: the block auto-raises to the residue period
    (p <= 128 always, and M = block full matmul rows cost nothing extra),
    so only the -- tiny -- tiled-basis VMEM budget applies: every
    uniform-grid geometry is supported, including odd strides (merged
    holds the same total basis bytes as masked, just concatenated)."""
    if mode not in PALLAS_MODES:
        raise ValueError(f"mode must be one of {PALLAS_MODES}, got {mode!r}")
    p = 128 // math.gcd(step_samples, 128)
    if mode in _MASKLIKE:
        if win and not interpret:
            return (
                masked_vmem_bytes(step_samples, win, passes, max_block)
                <= _VMEM_VARIANTS_BUDGET
            )
        return True
    if p > max_block:
        return False
    if win and not interpret:
        return (
            variants_vmem_bytes(step_samples, win, passes)
            <= _VMEM_VARIANTS_BUDGET
        )
    return True


def residue_grouping(rems: Tuple[int, ...]):
    """Single source of truth for the kernel/caller row-order contract:
    returns (variant_slots, row_of_slot) where variant_slots[v] lists the
    block slots using residue variant v (in slot order) and row_of_slot[u]
    is the grouped-output row holding slot u's result."""
    rem_values = sorted(set(rems))
    rem_index = {r: i for i, r in enumerate(rem_values)}
    variant_slots = tuple(
        tuple(u for u in range(len(rems)) if rem_index[rems[u]] == v)
        for v in range(len(rem_values))
    )
    row_of_slot = np.zeros(len(rems), dtype=np.int64)
    row = 0
    for slots in variant_slots:
        for u in slots:
            row_of_slot[u] = row
            row += 1
    return variant_slots, row_of_slot


def _n_limbs(passes: int) -> int:
    """bf16 limbs per f32 operand for a pass count: 1 -> native single dot,
    3 -> 2 limbs (hi/lo, skip lo*lo), 6 -> 3 limbs (XLA HIGHEST's full f32
    emulation: products b_i * c_j with i + j <= 2)."""
    if passes == 1:
        return 1
    if passes == 3:
        return 2
    if passes == 6:
        return 3
    raise ValueError(f"passes must be 1, 3 or 6, got {passes}")


def _split_limbs(x: jnp.ndarray, n: int):
    """In-kernel f32 -> n bf16 limbs (each residual subtraction is exact in
    f32, the standard multi-word emulation split)."""
    limbs = []
    r = x
    for _ in range(n):
        h = r.astype(jnp.bfloat16)
        limbs.append(h)
        r = r - h.astype(jnp.float32)
    return limbs


def _limb_dot(x_limbs, y_limbs, passes: int) -> jnp.ndarray:
    """Sum of the significant bf16 cross-products b_i * c_j (i + j < n_limbs)
    accumulated in f32 on the MXU; smallest terms first so the biggest
    product lands last in the f32 additions."""
    n = len(x_limbs)
    terms = [
        (i + j, i, j)
        for i in range(n)
        for j in range(n)
        if i + j < n
    ]
    acc = None
    for _, i, j in sorted(terms, reverse=True):
        d = jnp.dot(
            x_limbs[i], y_limbs[j], preferred_element_type=jnp.float32
        )
        acc = d if acc is None else acc + d
    return acc


def _make_tail(
    *,
    log_offset: float,
    log_min: float,
    mel_log_off: float,
    mel_log_min: float,
    comp_log: bool,
    passes: int,
    emit_power: bool,
    emit_logp: bool,
):
    """Shared power -> (log, mel) kernel tail (dft/dft.go:80-85,
    mel/mel.go:134-153 semantics) used by both kernel modes.

    ``emit_power``/``emit_logp`` gate the wide per-bin outputs: XLA cannot
    dead-code-eliminate through the pallas_call boundary, so a mel-only
    caller would otherwise pay 2 x [n_win, k_pad] of pure HBM write
    traffic per batch. ``out_refs`` holds only the requested refs, in
    (power, log_power, mel) order; mel is always last."""
    nl = _n_limbs(passes)

    def tail(power, melw_ref, out_refs):
        i = 0
        if emit_power:
            out_refs[i][0] = power
            i += 1

        if emit_logp:
            if comp_log:
                sh = power + log_offset
                out_refs[i][0] = jnp.where(
                    sh == 0.0, log_min,
                    jnp.log(jnp.where(sh == 0.0, 1.0, sh)),
                )
            else:
                out_refs[i][0] = jnp.zeros_like(power)
            i += 1

        if passes == 1:
            mel_sum = jnp.dot(
                power, melw_ref[:, :], preferred_element_type=jnp.float32
            )
        else:
            p_limbs = _split_limbs(power, nl)
            mel_sum = _limb_dot(
                p_limbs, [melw_ref[l] for l in range(nl)], passes
            )
        mel_sum = mel_sum + mel_log_off
        out_refs[i][0] = jnp.where(
            mel_sum == 0.0,
            mel_log_min,
            jnp.log(jnp.where(mel_sum == 0.0, 1.0, mel_sum)),
        )

    return tail


def _make_kernel(
    *,
    win: int,
    chunk: int,
    block: int,
    step: int,
    rems: Tuple[int, ...],
    stat_aligned: Tuple[int, ...],
    n_residues: int,
    log_offset: float,
    log_min: float,
    mel_log_off: float,
    mel_log_min: float,
    comp_log: bool,
    passes: int,
    emit_power: bool,
    emit_logp: bool,
):
    # Mosaic on this TPU supports neither unaligned dynamic loads nor
    # unaligned static value-slices, so the residue shift moves into the
    # BASIS: cos/sin arrive as [n_residues, chunk, k_pad] where variant r is
    # the basis zero-padded so rows rem_r..rem_r+win hold the true rows
    # 0..win. Each slot's [1, chunk] aligned chunk then multiplies its
    # residue's variant; slots are grouped per residue into one MXU matmul
    # and the results recombined with static row masks.
    # slots grouped by residue variant: one MXU matmul per variant over its
    # block/period slots (minimal FLOPs); output rows come out grouped and the
    # caller de-permutes with a static row gather (see residue_grouping)
    variant_slots, _ = residue_grouping(rems)

    nl = _n_limbs(passes)

    def kernel(signal_ref, cos_ref, sin_ref, melw_ref, *out_refs):
        wblk = pl.program_id(1)
        # dynamic block base on the signal axis; multiple of 128 because
        # block*step is (block is padded to the residue period)
        dyn = wblk * (block * step)

        re_groups = []
        im_groups = []
        for v in range(n_residues):
            rows = []
            for u in variant_slots[v]:
                aligned = pl.multiple_of(dyn + stat_aligned[u], 128)
                rows.append(signal_ref[0, 0, pl.ds(aligned, chunk)])
            group = jnp.stack(rows)  # [block/period, chunk]
            if passes == 1:
                # NOTE on precision: single-pass dots run at the MXU's
                # native f32 precision, i.e. bf16-rounded operands (~2.5e-3
                # rel power error). The in-kernel `precision=` argument
                # does not help (measured: unchanged deviation, 2.4x cost)
                # -- XLA's multi-pass f32 emulation is an HLO-level rewrite
                # Mosaic does not replicate. passes=3/6 below perform that
                # emulation MANUALLY via bf16 limb splits.
                re_groups.append(
                    jnp.dot(
                        group, cos_ref[v], preferred_element_type=jnp.float32
                    )
                )
                im_groups.append(
                    jnp.dot(
                        group, sin_ref[v], preferred_element_type=jnp.float32
                    )
                )
            else:
                g_limbs = _split_limbs(group, nl)
                cos_l = [cos_ref[l, v] for l in range(nl)]
                sin_l = [sin_ref[l, v] for l in range(nl)]
                re_groups.append(_limb_dot(g_limbs, cos_l, passes))
                im_groups.append(_limb_dot(g_limbs, sin_l, passes))
        re = jnp.concatenate(re_groups, axis=0)  # [block, k_pad] grouped order
        im = jnp.concatenate(im_groups, axis=0)
        tail(re * re + im * im, melw_ref, out_refs)

    tail = _make_tail(
        log_offset=log_offset,
        log_min=log_min,
        mel_log_off=mel_log_off,
        mel_log_min=mel_log_min,
        comp_log=comp_log,
        passes=passes,
        emit_power=emit_power,
        emit_logp=emit_logp,
    )
    return kernel


def _make_masked_kernel(
    *,
    chunk: int,
    block: int,
    step: int,
    stat_aligned: Tuple[int, ...],
    log_offset: float,
    log_min: float,
    mel_log_off: float,
    mel_log_min: float,
    comp_log: bool,
    passes: int,
    emit_power: bool,
    emit_logp: bool,
    merged_k_pad: int = 0,
):
    # Mask-and-tile formulation (see PALLAS_MODES): every block slot loads
    # its 128-aligned [1, chunk] chunk, the static mask zeroes (or
    # analysis-windows) each row outside [rem_u, rem_u + win), and ONE
    # full-M matmul runs against the row-tiled basis. The masked row's DFT
    # comes out phase-rotated by e^{-2pi*i*k*rem_u/win} (shift theorem);
    # power = re^2 + im^2 is rotation-invariant, so the result is exact.
    #
    # merged_k_pad > 0 selects the merged formulation: one cos|sin basis
    # ref of [.., chunk, 2*k_pad], ONE dot per limb product, re/im by
    # static column split (see PALLAS_MODES 'merged').
    nl = _n_limbs(passes)
    tail = _make_tail(
        log_offset=log_offset,
        log_min=log_min,
        mel_log_off=mel_log_off,
        mel_log_min=mel_log_min,
        comp_log=comp_log,
        passes=passes,
        emit_power=emit_power,
        emit_logp=emit_logp,
    )

    def _load_group(signal_ref, mask_ref):
        wblk = pl.program_id(1)
        # dynamic block base on the signal axis; multiple of 128 because
        # block*step is (block is padded to the residue period)
        dyn = wblk * (block * step)
        rows = []
        for u in range(block):
            aligned = pl.multiple_of(dyn + stat_aligned[u], 128)
            rows.append(signal_ref[0, 0, pl.ds(aligned, chunk)])
        return jnp.stack(rows) * mask_ref[:, :]  # [block, chunk]

    def kernel(signal_ref, mask_ref, cos_ref, sin_ref, melw_ref, *out_refs):
        group = _load_group(signal_ref, mask_ref)
        if passes == 1:
            re = jnp.dot(
                group, cos_ref[:, :], preferred_element_type=jnp.float32
            )
            im = jnp.dot(
                group, sin_ref[:, :], preferred_element_type=jnp.float32
            )
        else:
            g_limbs = _split_limbs(group, nl)
            re = _limb_dot(g_limbs, [cos_ref[l] for l in range(nl)], passes)
            im = _limb_dot(g_limbs, [sin_ref[l] for l in range(nl)], passes)
        tail(re * re + im * im, melw_ref, out_refs)

    def merged_kernel(signal_ref, mask_ref, cs_ref, melw_ref, *out_refs):
        group = _load_group(signal_ref, mask_ref)
        if passes == 1:
            reim = jnp.dot(
                group, cs_ref[:, :], preferred_element_type=jnp.float32
            )
        else:
            g_limbs = _split_limbs(group, nl)
            reim = _limb_dot(
                g_limbs, [cs_ref[l] for l in range(nl)], passes
            )
        re = reim[:, :merged_k_pad]
        im = reim[:, merged_k_pad:]
        tail(re * re + im * im, melw_ref, out_refs)

    return merged_kernel if merged_k_pad else kernel


def fused_frame_power_mel(
    signals: jnp.ndarray,     # [B, S] f32 (not yet padded)
    step_samples: int,
    offset0: int,             # start of window 0 (may be negative)
    n_windows: int,
    cos_basis: jnp.ndarray,   # [win, k_pad] f32
    sin_basis: jnp.ndarray,   # [win, k_pad]
    mel_weights: jnp.ndarray, # [k_pad, m_pad]
    *,
    win: int,
    n_bins: int,
    n_mel: int,
    dft: DFTParams,
    fbank: FilterBank,
    interpret: bool = False,
    passes: int = 1,
    block_windows: Optional[int] = None,
    mode: str = "grouped",
    window: Optional[np.ndarray] = None,
    emit: Tuple[bool, bool] = (True, True),
) -> Tuple[
    Optional[jnp.ndarray], Optional[jnp.ndarray], jnp.ndarray
]:
    """Fused frontend on the uniform grid start_i = step*i + offset0.

    Returns (power, log_power, log_mel): [B, n_win, n_bins] x2,
    [B, n_win, n_mel].

    ``passes`` selects the dots' f32 emulation level (manual bf16 limb
    decomposition, since Mosaic does not replicate XLA's HLO-level
    multi-pass rewrite): 1 = native MXU (bf16-rounded operands, ~2.5e-3
    rel power error), 3 = hi/lo limbs skipping the lo*lo term (~1e-5 rel,
    XLA `precision=HIGH` equivalent), 6 = three limbs / six products (full
    f32 emulation, XLA `precision=HIGHEST` equivalent).

    ``mode`` picks the kernel formulation (see :data:`PALLAS_MODES`).
    ``window`` (masked mode only) is an optional [win] analysis window
    applied via the mask; grouped mode expects it pre-folded into the
    basis rows (the tiled masked basis must stay a pure complex
    exponential for the shift theorem to hold, so the window moves into
    the per-slot mask instead).

    ``emit`` = (power, log_power) gates the wide per-bin outputs (mel is
    always produced): XLA cannot DCE through the pallas_call boundary, so
    a mel-only caller passing (False, False) saves 2 x [B, n_win, k_pad]
    of pure HBM write traffic. Non-emitted results return None.
    """
    if mode not in PALLAS_MODES:
        raise ValueError(f"mode must be one of {PALLAS_MODES}, got {mode!r}")
    if window is not None and mode not in _MASKLIKE:
        raise ValueError(
            "an explicit analysis window requires a mask-and-tile mode "
            "('masked'/'merged'); grouped mode folds the window into the "
            "basis rows upstream"
        )
    assert dft.prev_smooth == 0.0, "prev_smooth>0 uses the XLA path"
    b, s = signals.shape
    k_pad = cos_basis.shape[1]
    m_pad = mel_weights.shape[1]

    p = 128 // math.gcd(step_samples, 128)
    # block sets the matmul M: in grouped mode, M = block/p rows per
    # residue-variant matmul (64 -> M=16 at the default step, MXU 12.5%
    # row-utilized; block_windows=512 -> M=128); in masked mode the single
    # matmul sees all M = block rows, and block auto-raises to the residue
    # period (odd strides -> 128, a full MXU row tile)
    block = _round_up(max(p, block_windows or 64), p)
    if not supported_geometry(step_samples, max_block=block_windows or 64,
                              win=win, interpret=interpret, passes=passes,
                              mode=mode):
        raise ValueError(
            f"step={step_samples} (mode={mode}): residue period {p} exceeds "
            f"the block size ({block_windows or 64}) or the basis tensor "
            "exceeds the VMEM budget; use the XLA path"
        )

    # left-pad so window 0 starts at a nonnegative position, then choose the
    # pad so position 0 keeps the residues' static pattern
    left = max(0, -offset0)
    c0 = offset0 + left  # first start within the padded signal, >= 0

    # static per-slot geometry within a block (residues repeat per block:
    # block*step is a multiple of 128 because block is a multiple of p)
    starts_u = [step_samples * u + c0 for u in range(block)]
    stat_aligned = tuple((st // 128) * 128 for st in starts_u)
    rems = tuple(st - al for st, al in zip(starts_u, stat_aligned))

    if mode in _MASKLIKE:
        # exactly the needed slack: max residue of the actual slot pattern
        chunk = _round_up(win + max(rems), 128)
    else:
        chunk = _round_up(win, 128) + 128  # window + up-to-127 residue slack

    n_pad = _round_up(max(n_windows, 1), block)
    last = (n_pad - 1) * step_samples + c0 + chunk
    right = max(0, last - (s + left))
    sig = jnp.pad(signals.astype(jnp.float32), ((0, 0), (left, right)))
    s_pad = _round_up(sig.shape[1], 128)
    if s_pad != sig.shape[1]:
        sig = jnp.pad(sig, ((0, 0), (0, s_pad - sig.shape[1])))
    sig = sig[:, None, :]  # [B, 1, s_pad]

    nl = _n_limbs(passes)
    melw = mel_weights
    emit_power, emit_logp = bool(emit[0]), bool(emit[1])
    common = dict(
        log_offset=float(dft.log_offset),
        log_min=float(dft.log_min),
        mel_log_off=float(fbank.log_off),
        mel_log_min=float(fbank.log_min),
        comp_log=bool(dft.comp_log_pow),
        passes=passes,
        emit_power=emit_power,
        emit_logp=emit_logp,
    )
    if mode in _MASKLIKE:
        # single row-tiled basis: row m reuses basis row m mod win bit-
        # exactly (cos(2*pi*k*m/win) and -sin are win-periodic in m), so
        # each masked row's DFT is the true window DFT rotated by
        # e^{-2pi*i*k*rem/win} -- invisible in power
        idx = jnp.asarray(np.arange(chunk) % win)
        cos_c = jnp.take(cos_basis, idx, axis=0)   # [chunk, k_pad]
        sin_c = jnp.take(sin_basis, idx, axis=0)
        wvec = (
            np.ones(win, np.float32)
            if window is None
            else np.asarray(window, dtype=np.float32)
        )
        mask_np = np.zeros((block, chunk), dtype=np.float32)
        for u, r in enumerate(rems):
            mask_np[u, r : r + win] = wvec
        mask = jnp.asarray(mask_np)
        merged = mode == "merged"
        if merged:
            # fused re|im operand: one dot per limb product (same MACs,
            # half the dot count; see PALLAS_MODES 'merged')
            cs_c = jnp.concatenate([cos_c, sin_c], axis=1)  # [chunk, 2k]
            if passes > 1:
                cs_c = jnp.stack(_split_limbs(cs_c, nl))
                melw = jnp.stack(_split_limbs(jnp.asarray(mel_weights), nl))
            basis_inputs = (cs_c,)
        else:
            if passes > 1:
                cos_c = jnp.stack(_split_limbs(cos_c, nl))  # [nl, chunk, k]
                sin_c = jnp.stack(_split_limbs(sin_c, nl))
                melw = jnp.stack(_split_limbs(jnp.asarray(mel_weights), nl))
            basis_inputs = (cos_c, sin_c)
        kernel = _make_masked_kernel(
            chunk=chunk,
            block=block,
            step=step_samples,
            stat_aligned=stat_aligned,
            merged_k_pad=k_pad if merged else 0,
            **common,
        )
        const_inputs = (mask, *basis_inputs, melw)
        mask_spec = [pl.BlockSpec((block, chunk), lambda bi, wi: (0, 0))]
        kc = 2 * k_pad if merged else k_pad
        if passes == 1:
            basis_specs = mask_spec + [
                pl.BlockSpec((chunk, kc), lambda bi, wi: (0, 0))
                for _ in basis_inputs
            ] + [pl.BlockSpec((k_pad, m_pad), lambda bi, wi: (0, 0))]
        else:
            basis_specs = mask_spec + [
                pl.BlockSpec((nl, chunk, kc), lambda bi, wi: (0, 0, 0))
                for _ in basis_inputs
            ] + [pl.BlockSpec((nl, k_pad, m_pad), lambda bi, wi: (0, 0, 0))]
        contraction = chunk  # the single matmul contracts the full chunk
    else:
        # residue-shifted basis variants: variant r holds the basis at rows
        # rem_r..rem_r+win of a [chunk, k_pad] zero matrix
        rem_values = sorted(set(rems))
        n_res = len(rem_values)
        cos_v = jnp.zeros((n_res, chunk, k_pad), dtype=jnp.float32)
        sin_v = jnp.zeros((n_res, chunk, k_pad), dtype=jnp.float32)
        for i, r in enumerate(rem_values):
            cos_v = cos_v.at[i, r : r + win].set(cos_basis)
            sin_v = sin_v.at[i, r : r + win].set(sin_basis)

        if passes > 1:
            # pre-split the constant operands into bf16 limbs on the host
            # (leading limb axis; bf16 halves each limb's VMEM bytes)
            cos_v = jnp.stack(_split_limbs(cos_v, nl))  # [nl, n_res, chunk, k]
            sin_v = jnp.stack(_split_limbs(sin_v, nl))
            melw = jnp.stack(_split_limbs(jnp.asarray(mel_weights), nl))

        kernel = _make_kernel(
            win=win,
            chunk=chunk,
            block=block,
            step=step_samples,
            rems=rems,
            stat_aligned=stat_aligned,
            n_residues=n_res,
            **common,
        )
        const_inputs = (cos_v, sin_v, melw)
        if passes == 1:
            basis_specs = [
                pl.BlockSpec((n_res, chunk, k_pad), lambda bi, wi: (0, 0, 0)),
                pl.BlockSpec((n_res, chunk, k_pad), lambda bi, wi: (0, 0, 0)),
                pl.BlockSpec((k_pad, m_pad), lambda bi, wi: (0, 0)),
            ]
        else:
            basis_specs = [
                pl.BlockSpec(
                    (nl, n_res, chunk, k_pad), lambda bi, wi: (0, 0, 0, 0)
                ),
                pl.BlockSpec(
                    (nl, n_res, chunk, k_pad), lambda bi, wi: (0, 0, 0, 0)
                ),
                pl.BlockSpec((nl, k_pad, m_pad), lambda bi, wi: (0, 0, 0)),
            ]
        contraction = win  # per-variant matmuls contract only basis rows

    grid = (b, n_pad // block)
    n_wide = int(emit_power) + int(emit_logp)
    out_shape = [
        jax.ShapeDtypeStruct((b, n_pad, k_pad), jnp.float32)
        for _ in range(n_wide)
    ] + [jax.ShapeDtypeStruct((b, n_pad, m_pad), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, block, k_pad), lambda bi, wi: (bi, wi, 0))
        for _ in range(n_wide)
    ] + [pl.BlockSpec((1, block, m_pad), lambda bi, wi: (bi, wi, 0))]
    flops = passes * (
        2 * b * n_pad * contraction * k_pad * 2
        + 2 * b * n_pad * k_pad * m_pad
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, s_pad), lambda bi, wi: (bi, 0, 0)),
        ] + basis_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (
                b * s_pad + b * n_pad * (n_wide * k_pad + m_pad)
            ),
            transcendentals=b * n_pad * (k_pad + m_pad),
        ),
    )(sig, *const_inputs)
    it = iter(res)
    power = next(it) if emit_power else None
    logp = next(it) if emit_logp else None
    mel = next(it)

    if mode in _MASKLIKE:
        # mask-and-tile rows come out in natural window order
        rows = slice(None, n_windows)
    else:
        # de-permute grouped kernel output rows back to window order (shared
        # grouping definition with the kernel: residue_grouping)
        _, row_of_slot = residue_grouping(rems)
        blocks = np.arange(n_pad // block, dtype=np.int64)[:, None] * block
        rows_np = (blocks + row_of_slot[None, :]).reshape(-1)[:n_windows]
        rows = jnp.asarray(rows_np)

    return (
        power[:, rows, :n_bins] if emit_power else None,
        logp[:, rows, :n_bins] if emit_logp else None,
        mel[:, rows, :n_mel],
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
