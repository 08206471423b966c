"""Neighborhood inhibition (Inhib4).

Behavioral re-implementation of ``emer/vision/kwta.NeighInhib`` (external
dependency; used at reference sound/sndenv.go:303-311): each unit receives
extra inhibition from the *same feature* (same polarity, same filter/angle) at
the nearest neighbor positions orthogonal to the filter's orientation, which
reduces redundant activation along an edge's width.

Operates on the 4-D pooled layout [fIdx, tIdx, polarity, filter] (the only
layout upstream supports; the reference skips it for 2-D output,
gbv.go:823-828). Orientation per filter index assumes the standard 4-angle
bank (0/45/90/135 degrees); for other bank sizes the orthogonal offset is
derived from the spec's orientation.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import NeighInhibParams

__all__ = ["orthogonal_offsets", "inhib4"]


def orthogonal_offsets(orientations_deg: Sequence[float]) -> np.ndarray:
    """[n_filters, 2] integer (dy, dx) unit offsets orthogonal to each
    filter's orientation."""
    offs = []
    for deg in orientations_deg:
        orth = math.radians(deg + 90.0)
        dx = int(round(math.cos(orth)))
        dy = int(round(math.sin(orth)))
        if dx == 0 and dy == 0:
            dy = 1
        offs.append((dy, dx))
    return np.asarray(offs, dtype=np.int32)


def inhib4(
    params: NeighInhibParams,
    act: jnp.ndarray,
    orientations_deg: Sequence[float],
) -> jnp.ndarray:
    """act [..., fIdx, tIdx, 2, n_filters] -> ext_gi of the same shape.

    ext_gi = Gi * max(act at pos +offset, act at pos -offset) for the same
    (polarity, filter); out-of-bounds neighbors contribute 0.
    """
    if not params.on:
        return jnp.zeros_like(act)
    offs = orthogonal_offsets(orientations_deg)
    n_filters = act.shape[-1]
    assert offs.shape[0] == n_filters, "need one orientation per filter"

    cols = []
    for k in range(n_filters):
        dy, dx = int(offs[k, 0]), int(offs[k, 1])
        a = act[..., k]  # [..., fIdx, tIdx, 2]
        fwd = _shift2d(a, dy, dx)
        bwd = _shift2d(a, -dy, -dx)
        cols.append(jnp.maximum(fwd, bwd))
    neigh = jnp.stack(cols, axis=-1)
    return params.gi * neigh


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift along the (fIdx, tIdx) axes (-3, -2), zero-filling the border."""
    out = x
    if dy:
        out = jnp.roll(out, dy, axis=-3)
        idx = slice(0, dy) if dy > 0 else slice(dy, None)
        out = out.at[(Ellipsis, idx, slice(None), slice(None))].set(0)
    if dx:
        out = jnp.roll(out, dx, axis=-2)
        idx = slice(0, dx) if dx > 0 else slice(dx, None)
        out = out.at[(Ellipsis, slice(None), idx, slice(None))].set(0)
    return out
