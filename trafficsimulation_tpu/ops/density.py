"""Local traffic density via separable box filters (reference
`_update_density_map` `city_model.py:1764-1778`, scipy uniform_filter).

density[y,x] = fraction of road cells within the (2r+1)-box that are
occupied.  Implemented as two cumulative-sum box filters — exact, O(HW),
and fusible by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)x(2r+1) window with zero padding, separable.
    Implemented as 2*(2r+1) shifted adds — pure elementwise VPU work
    (cumsum/transpose/gather are scalar-bound on TPU)."""
    x = x.astype(jnp.float32)
    H, W = x.shape
    pad = jnp.pad(x, ((r, r), (0, 0)))
    rows = sum(pad[k:k + H, :] for k in range(2 * r + 1))
    pad2 = jnp.pad(rows, ((0, 0), (r, r)))
    return sum(pad2[:, k:k + W] for k in range(2 * r + 1))


def density_map(occupancy: jnp.ndarray, is_road: jnp.ndarray,
                r: int) -> jnp.ndarray:
    so = box_sum(occupancy, r)
    sr = box_sum(is_road, r)
    return jnp.where(sr > 0, so / jnp.maximum(sr, 1.0), 0.0)
