"""Connected-component labeling as iterated neighbor-min propagation.

Replaces the reference's Python flood fills (zoning
`city_model.py:742-806`, intersection clusters `city_model.py:1587-1650`)
with a jittable label-propagation pass: every masked cell starts with its
own flat index as label and repeatedly takes the min over its 4-neighbors
(restricted to the mask) until fixpoint.  The fixpoint assigns every
connected component the flat index of its smallest member ("root").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Python int, not jnp.int32: module-level device constants initialize
# the backend at import time (see ops/routing.py INF)
_BIG = 2**30


def _neighbor_min(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One propagation sweep: min over the 4-neighborhood, masked."""
    big = jnp.where(mask, labels, _BIG)
    # shifts bring the neighbor's label onto each cell; out-of-bounds = BIG
    n = jnp.full_like(big, _BIG).at[:-1, :].set(big[1:, :])   # from north (+y)
    s = jnp.full_like(big, _BIG).at[1:, :].set(big[:-1, :])   # from south
    e = jnp.full_like(big, _BIG).at[:, :-1].set(big[:, 1:])   # from east (+x)
    w = jnp.full_like(big, _BIG).at[:, 1:].set(big[:, :-1])   # from west
    out = jnp.minimum(jnp.minimum(jnp.minimum(n, s), jnp.minimum(e, w)), big)
    return jnp.where(mask, out, _BIG)


def connected_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Label 4-connected components of `mask` [H, W].

    Returns i32 [H, W]: for masked cells, the flat index of the component
    root (its minimum member); for unmasked cells, -1.
    """
    H, W = mask.shape
    init = jnp.where(
        mask, jnp.arange(H * W, dtype=jnp.int32).reshape(H, W), _BIG)

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = _neighbor_min(labels, mask)
        # pointer-jumping: adopt the label of your current root, which
        # roughly doubles propagation distance per iteration.
        root = new.reshape(-1)[jnp.clip(new, 0, H * W - 1).reshape(-1)]
        root = root.reshape(H, W)
        new = jnp.where(mask & (new < _BIG), jnp.minimum(new, root), new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(mask, labels, -1)


def connected_components_keyed(mask: jnp.ndarray,
                               key_map: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`connected_components`, but two adjacent cells only join
    when `key_map` agrees (used to keep per-block perimeter runs separate
    even when two blocks' rings touch)."""
    H, W = mask.shape
    init = jnp.where(
        mask, jnp.arange(H * W, dtype=jnp.int32).reshape(H, W), _BIG)

    def sweep(labels):
        big = jnp.where(mask, labels, _BIG)

        def shifted(arr, d, fill):
            z = jnp.full_like(arr, fill)
            if d == 0:
                return z.at[:-1, :].set(arr[1:, :])
            if d == 2:
                return z.at[1:, :].set(arr[:-1, :])
            if d == 1:
                return z.at[:, :-1].set(arr[:, 1:])
            return z.at[:, 1:].set(arr[:, :-1])

        out = big
        for d in range(4):
            nl = shifted(big, d, _BIG)
            nk = shifted(key_map, d, -1)
            ok = (nk == key_map) & mask
            out = jnp.minimum(out, jnp.where(ok, nl, _BIG))
        return jnp.where(mask, out, _BIG)

    def cond(carry):
        return carry[1]

    def body(carry):
        labels, _ = carry
        new = sweep(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(mask, labels, -1)


def compact_labels(labels: jnp.ndarray, max_items: int):
    """Compact component roots into dense ids.

    Returns (ids [H, W] i32 with dense id or -1, roots [max_items] i32 flat
    index of each component's root or -1, count).  Deterministic row-major
    order of roots.
    """
    H, W = labels.shape
    flat = labels.reshape(-1)
    idx = jnp.arange(H * W, dtype=jnp.int32)
    is_root = flat == idx
    roots = jnp.nonzero(is_root, size=max_items, fill_value=-1)[0].astype(jnp.int32)
    count = jnp.sum(is_root).astype(jnp.int32)
    # map each root flat-index -> dense id
    dense_of_flat = jnp.full((H * W + 1,), -1, dtype=jnp.int32)
    slot = jnp.arange(max_items, dtype=jnp.int32)
    dense_of_flat = dense_of_flat.at[jnp.where(roots >= 0, roots, H * W)].set(
        jnp.where(roots >= 0, slot, -1))
    ids = jnp.where(flat >= 0, dense_of_flat[jnp.clip(flat, 0, H * W)], -1)
    return ids.reshape(H, W), roots, count
