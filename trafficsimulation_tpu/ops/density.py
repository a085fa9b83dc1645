"""Local traffic density via separable box filters (reference
`_update_density_map` `city_model.py:1764-1778`, scipy uniform_filter).

density[y,x] = fraction of road cells within the (2r+1)-box that are
occupied.  Implemented as two cumulative-sum box filters — exact, O(HW),
and fusible by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)x(2r+1) window with zero padding, separable."""
    x = x.astype(jnp.float32)

    def axis_box(a, axis):
        c = jnp.cumsum(a, axis=axis)
        n = a.shape[axis]
        idx = jnp.arange(n)
        hi = jnp.clip(idx + r, 0, n - 1)
        lo = idx - r - 1
        chi = jnp.take(c, hi, axis=axis)
        clo = jnp.where(
            (lo >= 0)[(slice(None), None) if axis == 0 else (None, slice(None))],
            jnp.take(c, jnp.clip(lo, 0, n - 1), axis=axis), 0.0)
        return chi - clo

    return axis_box(axis_box(x, 0), 1)


def density_map(occupancy: jnp.ndarray, is_road: jnp.ndarray,
                r: int) -> jnp.ndarray:
    so = box_sum(occupancy, r)
    sr = box_sum(is_road, r)
    return jnp.where(sr > 0, so / jnp.maximum(sr, 1.0), 0.0)
