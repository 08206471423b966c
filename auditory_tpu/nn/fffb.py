"""FFFB (feedforward + feedback) inhibition dynamics.

Behavioral re-implementation of ``emer/leabra/fffb`` v1.1.48 (an external
dependency of the reference, imported at sound/sndenv.go:19 and used through
``emer/vision/kwta``). The reference repo does not vendor this code; the
equations here follow the published Leabra FFFB formulation (O'Reilly et al.,
Computational Cognitive Neuroscience, ch. 3):

    ffi   = FF * max(netin_avg + MaxVsAvg*(netin_max - netin_avg) - FF0, 0)
    fbi  += FBDt * (FB * act_avg - fbi)          (time-integrated feedback)
    Gi    = Gi_gain * (ffi + fbi)

This module is pure-functional: inhibition state is threaded explicitly so it
can live inside ``lax.scan`` iterations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import FFFBParams

__all__ = ["FFFBState", "fffb_init", "fffb_step", "fffb_ffi", "fffb_fb_step"]


class FFFBState(NamedTuple):
    fbi: jnp.ndarray  # integrated feedback inhibition (scalar per group)
    gi: jnp.ndarray   # computed inhibitory conductance (scalar per group)


def fffb_init(shape=(), dtype=jnp.float32) -> FFFBState:
    z = jnp.zeros(shape, dtype=dtype)
    return FFFBState(fbi=z, gi=z)


def fffb_ffi(
    params: FFFBParams, netin_avg: jnp.ndarray, netin_max: jnp.ndarray
) -> jnp.ndarray:
    """Feedforward inhibition term. Depends only on the (fixed) excitatory
    input statistics, so settle loops compute it ONCE outside the iteration
    (the netin is constant across FFFB settle steps; recomputing its
    reductions per iteration was pure waste)."""
    ff_netin = netin_avg + params.max_vs_avg * (netin_max - netin_avg)
    return params.ff * jnp.maximum(ff_netin - params.ff0, 0.0)


def fffb_fb_step(
    params: FFFBParams,
    state: FFFBState,
    ffi: jnp.ndarray,
    act_avg: jnp.ndarray,
) -> FFFBState:
    """The per-iteration part of the inhibition update: time-integrated
    feedback from the current average activation, combined with the
    precomputed feedforward term."""
    if not params.on:
        return FFFBState(fbi=state.fbi, gi=jnp.zeros_like(state.gi))
    fbi = state.fbi + params.fb_dt * (params.fb * act_avg - state.fbi)
    gi = params.gi * (ffi + fbi)
    return FFFBState(fbi=fbi, gi=gi)


def fffb_step(
    params: FFFBParams,
    state: FFFBState,
    netin_avg: jnp.ndarray,
    netin_max: jnp.ndarray,
    act_avg: jnp.ndarray,
) -> FFFBState:
    """One inhibition update for a group (layer or pool); inputs are the
    group's average/max excitatory input and average activation."""
    if not params.on:
        return FFFBState(fbi=state.fbi, gi=jnp.zeros_like(state.gi))
    return fffb_fb_step(
        params, state, fffb_ffi(params, netin_avg, netin_max), act_avg
    )
