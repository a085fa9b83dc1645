"""Sub-block L-shaped road carving (reference `_carve_subblock_roads`
`city_model.py:563-737`, default-off stage 5).

For each empty (`Nothing`) blob large enough, with probability
SUBBLOCK_CHANGE carve a one-cell L-road through its pivot: one inbound
leg (flowing from the existing road network toward the pivot) and one
outbound leg (pivot -> network), each extended through empty space and
sidewalks until it meets an existing road.  Junction cells optionally
become full intersections (`SUBBLOCK_ROADS_HAVE_INTERSECTIONS`), and the
new road is edged with sidewalk.

Array re-expression: regions come from label propagation; pivots are the
region bbox centers; the legs are bounded fori-loop ray walks vectorized
over all regions at once.  Divergence from the reference: the pivot is
the bbox center instead of a random interior cell, and the two legs run
north (inbound) and east (outbound) instead of random directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from ..ops.labels import connected_components, compact_labels
from .zoning import _seg_min, _seg_max
from .raster import _shift_from


def carve_subblock_roads(cfg: Config, key, cell, allowed, max_blocks: int):
    if not cfg.CARVE_SUBBLOCK_ROADS:
        return cell, allowed
    H, W = cell.shape
    HW = H * W
    sub_code = jnp.uint8(C.NAME_TO_TYPE[cfg.SUBBLOCK_ROAD_TYPE])

    nothing = cell == C.NOTHING
    labels = connected_components(nothing)
    ids_map, roots, _ = compact_labels(labels, max_blocks)
    B = max_blocks

    flat_ids = ids_map.reshape(-1)
    seg = jnp.where(flat_ids >= 0, flat_ids, B)
    xs = jnp.arange(HW, dtype=jnp.int32) % W
    ys = jnp.arange(HW, dtype=jnp.int32) // W
    minx = _seg_min(jnp.where(flat_ids >= 0, xs, 2**30), seg, B + 1,
                    jnp.int32(2**30))[:B]
    maxx = _seg_max(jnp.where(flat_ids >= 0, xs, -1), seg, B + 1,
                    jnp.int32(-1))[:B]
    miny = _seg_min(jnp.where(flat_ids >= 0, ys, 2**30), seg, B + 1,
                    jnp.int32(2**30))[:B]
    maxy = _seg_max(jnp.where(flat_ids >= 0, ys, -1), seg, B + 1,
                    jnp.int32(-1))[:B]
    valid = roots >= 0
    big_enough = valid & \
        (maxx - minx + 1 >= cfg.MIN_SUBBLOCK_SPACING * 2 + 1) & \
        (maxy - miny + 1 >= cfg.MIN_SUBBLOCK_SPACING * 2 + 1)
    chance = jax.random.uniform(key, (B,)) < cfg.SUBBLOCK_CHANGE
    carve = big_enough & chance

    px = jnp.clip((minx + maxx) // 2, 0, W - 1)
    py = jnp.clip((miny + maxy) // 2, 0, H - 1)

    road_like = jnp.isin(cell, jnp.array(C.ROAD_LIKE, dtype=jnp.uint8))
    passable = nothing | (cell == C.SIDEWALK)

    def walk_leg(dy, dx):
        """Per region: distance along (dy,dx) from the pivot to the first
        road-like cell, walking only through Nothing/Sidewalk.  Returns
        length (cells before the road) or -1 when the leg fails."""
        def body(s, st):
            ln, alive = st
            ny = py + (s + 1) * dy
            nx = px + (s + 1) * dx
            inb = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
            cy = jnp.clip(ny, 0, H - 1)
            cx = jnp.clip(nx, 0, W - 1)
            hit = alive & inb & road_like[cy, cx]
            ln = jnp.where(hit, s, ln)
            alive = alive & inb & passable[cy, cx] & ~hit
            return ln, alive

        ln, _ = jax.lax.fori_loop(0, max(H, W), body,
                                  (jnp.full((B,), -1, jnp.int32),
                                   carve))
        return ln

    len_n = walk_leg(1, 0)    # inbound leg runs north of the pivot
    len_e = walk_leg(0, 1)    # outbound leg runs east of the pivot
    ok = carve & (len_n >= 0) & (len_e >= 0)

    # paint legs via distance-from-pivot masks (vector ops per region
    # would be [B, H, W]; instead scatter with a bounded loop)
    cellf = cell.reshape(-1)
    dirsf = allowed.reshape(-1)
    max_leg = max(H, W)

    def paint(s, st):
        cf, df = st
        # inbound cell s+1 north of pivot flows S (toward the pivot)
        ny = py + (s + 1)
        on_n = ok & (s <= len_n)
        tn = jnp.where(on_n & (ny < H), ny * W + px, HW)
        is_junction_n = s == len_n
        cf = cf.at[tn].set(jnp.where(
            is_junction_n & cfg.SUBBLOCK_ROADS_HAVE_INTERSECTIONS,
            jnp.uint8(C.INTERSECTION), jnp.where(
                is_junction_n, cf[jnp.clip(tn, 0, HW - 1)], sub_code)),
            mode="drop")
        df = df.at[tn].set(jnp.where(
            is_junction_n & cfg.SUBBLOCK_ROADS_HAVE_INTERSECTIONS,
            jnp.uint8(15), jnp.where(
                is_junction_n, df[jnp.clip(tn, 0, HW - 1)],
                jnp.uint8(C.DIR_BITS[C.S_IDX]))), mode="drop")
        # outbound cell s east of pivot flows E (away from the pivot);
        # s = 0 is the pivot itself (the L corner: S arrival, E exit)
        nx = px + s
        on_e = ok & (s <= len_e)
        te = jnp.where(on_e & (nx < W), py * W + nx, HW)
        is_junction_e = s == len_e
        cf = cf.at[te].set(jnp.where(
            is_junction_e & cfg.SUBBLOCK_ROADS_HAVE_INTERSECTIONS,
            jnp.uint8(C.INTERSECTION), jnp.where(
                is_junction_e, cf[jnp.clip(te, 0, HW - 1)], sub_code)),
            mode="drop")
        df = df.at[te].set(jnp.where(
            is_junction_e & cfg.SUBBLOCK_ROADS_HAVE_INTERSECTIONS,
            jnp.uint8(15), jnp.where(
                is_junction_e, df[jnp.clip(te, 0, HW - 1)],
                jnp.uint8(C.DIR_BITS[C.E_IDX]))), mode="drop")
        return cf, df

    cellf, dirsf = jax.lax.fori_loop(0, max_leg, paint, (cellf, dirsf))
    cell = cellf.reshape(H, W)
    allowed = dirsf.reshape(H, W)

    # sidewalk edging around the new roads (reference rings the pivot and
    # carves sidewalks along the legs)
    is_sub = cell == sub_code
    near = jnp.zeros((H, W), bool)
    for d in range(4):
        near = near | _shift_from(is_sub, d)
    cell = jnp.where(near & (cell == C.NOTHING), jnp.uint8(C.SIDEWALK),
                     cell)
    return cell, allowed
