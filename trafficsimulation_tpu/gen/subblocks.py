"""Sub-block L-shaped road carving (reference `_carve_subblock_roads`
`city_model.py:563-737`, default-off stage 5).

For each empty (`Nothing`) blob large enough, with probability
SUBBLOCK_CHANGE carve a one-cell L-road through a pivot: one inbound leg
(flowing from the existing road network toward the pivot) and one
outbound leg (pivot -> network), each extended through empty space and
sidewalks until it meets an existing road.  Junction cells optionally
become full intersections (`SUBBLOCK_ROADS_HAVE_INTERSECTIONS`), and the
new road is edged with sidewalk.

Randomization matches the reference (`city_model.py:664-683`): the pivot
is uniform in the blob's bbox inset by MIN_SUBBLOCK_SPACING, the
horizontal leg direction is a fair W/E draw, the vertical N/S, and which
leg is inbound is a fair draw — all from the generation PRNG key, so
sub-block layouts vary across seeds.

Array re-expression: regions come from label propagation; the legs are
bounded fori-loop ray walks vectorized over all regions at once.
Remaining divergence: sidewalk edging wraps every carved road cell
(4-neighborhood) instead of only ringing the pivot (8-neighborhood,
`city_model.py:731-737`).
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
    sp = cfg.MIN_SUBBLOCK_SPACING
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
        (maxx - minx + 1 >= sp * 2 + 1) & \
        (maxy - miny + 1 >= sp * 2 + 1)
    k_ch, k_px, k_py, k_hd, k_vd, k_leg = jax.random.split(key, 6)
    chance = jax.random.uniform(k_ch, (B,)) < cfg.SUBBLOCK_CHANGE
    carve = big_enough & chance

    # pivot uniform in the bbox inset by the spacing (`city_model.py:665-668`)
    def rint(k, lo, hi):
        span = jnp.maximum(hi - lo + 1, 1).astype(jnp.float32)
        return lo + jnp.floor(
            jax.random.uniform(k, (B,)) * span).astype(jnp.int32)

    px = jnp.clip(rint(k_px, minx + sp, maxx - sp), 0, W - 1)
    py = jnp.clip(rint(k_py, miny + sp, maxy - sp), 0, H - 1)
    # leg orientations: horizontal W/E, vertical N/S, inbound leg choice
    # (`city_model.py:669-683`)
    hd = jnp.where(jax.random.bernoulli(k_hd, 0.5, (B,)),
                   C.E_IDX, C.W_IDX).astype(jnp.int32)
    vd = jnp.where(jax.random.bernoulli(k_vd, 0.5, (B,)),
                   C.N_IDX, C.S_IDX).astype(jnp.int32)
    inbound_vert = jax.random.bernoulli(k_leg, 0.5, (B,))

    dxs = jnp.asarray(C.DIR_DX)
    dys = jnp.asarray(C.DIR_DY)
    bits = jnp.asarray(C.DIR_BITS, dtype=jnp.uint8)
    opp = jnp.asarray([2, 3, 0, 1], dtype=jnp.int32)
    # per-leg arrow: inbound legs flow toward the pivot (opposite of the
    # walk direction), outbound legs flow away (the walk direction)
    v_arrow = bits[jnp.where(inbound_vert, opp[vd], vd)]
    h_arrow = bits[jnp.where(inbound_vert, hd, opp[hd])]

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

    len_v = walk_leg(dys[vd], dxs[vd])
    len_h = walk_leg(dys[hd], dxs[hd])
    ok = carve & (len_v >= 0) & (len_h >= 0) & passable[py, px]

    # paint legs (scatter with a bounded loop; [B, H, W] masks would
    # blow memory under vmapped generation)
    cellf = cell.reshape(-1)
    dirsf = allowed.reshape(-1)
    max_leg = max(H, W)
    make_int = bool(cfg.SUBBLOCK_ROADS_HAVE_INTERSECTIONS)

    def paint_leg(st, dy, dx, length, arrow):
        def paint(s, st):
            cf, df = st
            ny = py + (s + 1) * dy
            nx = px + (s + 1) * dx
            on = ok & (s <= length) & (ny >= 0) & (ny < H) & \
                (nx >= 0) & (nx < W)
            t = jnp.where(on, jnp.clip(ny, 0, H - 1) * W +
                          jnp.clip(nx, 0, W - 1), HW)
            tc = jnp.clip(t, 0, HW - 1)
            is_junction = s == length
            # junction: full intersection, or the road keeps its type and
            # gains the leg's arrow (`city_model.py:612-622`)
            cf = cf.at[t].set(jnp.where(
                is_junction & make_int, jnp.uint8(C.INTERSECTION),
                jnp.where(is_junction, cf[tc], sub_code)), mode="drop")
            df = df.at[t].set(jnp.where(
                is_junction & make_int, jnp.uint8(15),
                jnp.where(is_junction, df[tc] | arrow, arrow)),
                mode="drop")
            return cf, df

        return jax.lax.fori_loop(0, max_leg, paint, st)

    st = (cellf, dirsf)
    st = paint_leg(st, dys[vd], dxs[vd], len_v, v_arrow)
    st = paint_leg(st, dys[hd], dxs[hd], len_h, h_arrow)
    cellf, dirsf = st

    # pivot: R4 corner with the single outbound arrow
    # (`city_model.py:712-715`)
    out_arrow = jnp.where(inbound_vert, bits[hd], bits[vd])
    tp = jnp.where(ok, py * W + px, HW)
    cellf = cellf.at[tp].set(sub_code, mode="drop")
    dirsf = dirsf.at[tp].set(out_arrow, mode="drop")

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
