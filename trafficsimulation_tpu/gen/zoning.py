"""Zoning, dead-end elimination, R2 upgrades and block entrances.

Array re-expression of reference stages 6-9:
`_flood_fill_blocks_storing_data` (`city_model.py:742-806`),
`_eliminate_dead_ends` (`city_model.py:811-840`),
`_upgrade_r2_to_intersections` (`city_model.py:842-879`),
`_final_place_block_entrances` (`city_model.py:884-963`),
`_remove_invalid_intersection_directions` (`city_model.py:969-1012`),
`_add_entrance_directions` (`city_model.py:1035-1070`).

Parity notes (conscious divergences, see README):
* dead-end elimination runs as a *parallel* fixpoint; the result is the
  unique 2-core of the road graph, identical to the reference's
  sequential sweeps.
* the entrance is the middle cell of the (x, y)-ordered longest run —
  exactly the reference's sorted-run midpoint for straight AND
  L-shaped runs; ties between equally long runs pick PRNG-randomly
  like the reference's `random.choice` (different random stream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from ..ops.labels import (connected_components, connected_components_keyed,
                          compact_labels)
from .raster import _shift_from
from ..ops.engine import _hash32


def _seg_min(vals, seg, num, init):
    return jnp.full((num,), init, vals.dtype).at[seg].min(vals)


def _seg_max(vals, seg, num, init):
    return jnp.full((num,), init, vals.dtype).at[seg].max(vals)


def _seg_sum(vals, seg, num):
    return jnp.zeros((num,), vals.dtype).at[seg].add(vals)


def apply_zoning(key, cfg: Config, cell: jnp.ndarray, max_blocks: int):
    """Flood-fill `Nothing` regions into typed city blocks.

    Returns (cell, block_id_map [H,W] i32, block_type [B] u8,
    inner_count [B] i32, block_valid [B] bool).
    """
    H, W = cell.shape
    nothing = cell == C.NOTHING
    labels = connected_components(nothing)
    ids_map, roots, _ = compact_labels(labels, max_blocks)

    flat_ids = ids_map.reshape(-1)
    seg = jnp.where(flat_ids >= 0, flat_ids, max_blocks)
    ys = (jnp.arange(H * W, dtype=jnp.int32) // W)
    xs = (jnp.arange(H * W, dtype=jnp.int32) % W)
    nseg = max_blocks + 1
    minx = _seg_min(xs, seg, nseg, jnp.int32(2**30))[:max_blocks]
    maxx = _seg_max(xs, seg, nseg, jnp.int32(-1))[:max_blocks]
    miny = _seg_min(ys, seg, nseg, jnp.int32(2**30))[:max_blocks]
    maxy = _seg_max(ys, seg, nseg, jnp.int32(-1))[:max_blocks]
    count = _seg_sum(jnp.ones_like(seg), seg, nseg)[:max_blocks]
    valid = roots >= 0

    w_bb = maxx - minx + 1
    h_bb = maxy - miny + 1
    small = (w_bb < 3) | (h_bb < 3)

    # weighted type draw (reference CITY_BLOCK_CHANCE, `config.py:53-60`)
    names = [n for n, _ in cfg.CITY_BLOCK_CHANCE]
    weights = jnp.array([w for _, w in cfg.CITY_BLOCK_CHANCE])
    codes = jnp.array([C.NAME_TO_TYPE[n] for n in names], dtype=jnp.uint8)
    cum = jnp.cumsum(weights / jnp.sum(weights))
    u = jax.random.uniform(key, (max_blocks,))
    draw = jnp.sum(u[:, None] >= cum[None, :], axis=1).astype(jnp.int32)
    btype = codes[jnp.clip(draw, 0, len(names) - 1)]
    btype = jnp.where(small, jnp.uint8(C.EMPTY), btype)
    btype = jnp.where(valid, btype, jnp.uint8(C.NOTHING))

    # paint regions
    safe_ids = jnp.clip(ids_map, 0, max_blocks - 1)
    painted = jnp.where(ids_map >= 0, btype[safe_ids], cell)
    return painted, ids_map, btype, count.astype(jnp.int32), valid


def eliminate_dead_ends(cell: jnp.ndarray, allowed: jnp.ndarray):
    """Parallel fixpoint: removable road cells with <2 road-like
    neighbors become Sidewalk (`city_model.py:811-840`)."""
    road_like_codes = jnp.array(C.ROAD_LIKE, dtype=jnp.uint8)
    removable_codes = jnp.array(C.REMOVABLE_DEAD_END, dtype=jnp.uint8)

    def is_in(x, codes):
        return jnp.isin(x, codes)

    def cond(carry):
        return carry[2]

    def body(carry):
        cl, al, _ = carry
        roady = is_in(cl, road_like_codes)
        deg = jnp.zeros(cl.shape, jnp.int32)
        for d in range(4):
            deg = deg + _shift_from(roady, d).astype(jnp.int32)
        dead = is_in(cl, removable_codes) & (deg < 2)
        new_cl = jnp.where(dead, jnp.uint8(C.SIDEWALK), cl)
        new_al = jnp.where(dead, jnp.uint8(0), al)
        return new_cl, new_al, jnp.any(dead)

    cell, allowed, _ = jax.lax.while_loop(
        cond, body, (cell, allowed, jnp.bool_(True)))
    return cell, allowed


def upgrade_r2_to_intersections(cfg: Config, cell, allowed, horiz_band,
                                in_ring_corner):
    """R2 cells flanked by >=2 sidewalks become intersections when a
    perpendicular sub-block-road-type (R3) neighbor fabricates a dummy
    crossing band (`city_model.py:842-879` + `_make_intersection`
    dummy-band path `city_model.py:253-263`)."""
    sub_code = C.NAME_TO_TYPE[cfg.SUBBLOCK_ROAD_TYPE]
    sw = cell == C.SIDEWALK
    sw_count = sum(_shift_from(sw, d).astype(jnp.int32) for d in range(4))
    is_sub = cell == sub_code
    # dummy band perpendicular to the R2 cell's own band orientation
    perp_h = _shift_from(is_sub, C.N_IDX) | _shift_from(is_sub, C.S_IDX)
    perp_v = _shift_from(is_sub, C.E_IDX) | _shift_from(is_sub, C.W_IDX)
    has_cross = jnp.where(horiz_band, perp_h, perp_v)
    upgrade = (cell == C.R2) & (sw_count >= 2) & has_cross
    if cfg.RING_ROAD_TYPE == "R2":
        upgrade = upgrade & ~in_ring_corner
    cell = jnp.where(upgrade, jnp.uint8(C.INTERSECTION), cell)
    allowed = jnp.where(upgrade, jnp.uint8(15), allowed)
    return cell, allowed, upgrade


def prune_intersection_dirs(cell, allowed):
    """Keep an intersection arrow only if the neighbor is road-like and
    either an intersection or accepts the flow
    (`_remove_invalid_intersection_directions` `city_model.py:969-1012`)."""
    road_like = jnp.isin(cell, jnp.array(C.ROAD_LIKE, dtype=jnp.uint8))
    inter = cell == C.INTERSECTION
    out = allowed
    for d in range(4):
        nb_road = _shift_from(road_like, d)
        nb_inter = _shift_from(inter, d)
        nb_dirs = _shift_from(allowed, d)
        ok = nb_road & (nb_inter | ((nb_dirs & jnp.uint8(C.DIR_BITS[d])) != 0))
        out = jnp.where(inter & ~ok, out & ~jnp.uint8(C.DIR_BITS[d]), out)
    return out


def place_entrances(cfg: Config, cell, allowed, block_ids, btype,
                    max_blocks: int, key=None):
    """One BlockEntrance per typed block at the midpoint of its longest
    road-touching perimeter run (`city_model.py:884-963`): cells of the
    chosen run are ordered by (x, y) — which reproduces the reference's
    per-shape sort (by x for horizontal runs, by y for vertical, (x, y)
    for mixed/L-shaped) — and the entrance is the middle cell.  Ties
    between equally long runs pick PRNG-randomly (`random.choice`,
    `city_model.py:944`) when `key` is given, else the smallest root.

    Returns (cell, allowed, entrance_flat [B] i32)."""
    H, W = cell.shape
    HW = H * W

    # ring: non-region cells adjacent to a region; carries one block id
    ring_block = jnp.full((H, W), -1, dtype=jnp.int32)
    for d in range(4):
        nb = _shift_from(jnp.where(block_ids >= 0, block_ids, -1), d)
        ring_block = jnp.maximum(ring_block, nb)
    ring_block = jnp.where(block_ids >= 0, -1, ring_block)

    # valid block types only (AVAILABLE_CITY_BLOCKS — Empty excluded)
    zone_codes = jnp.array(C.ZONE_TYPES, dtype=jnp.uint8)
    blk_is_zone = jnp.isin(btype, zone_codes)
    safe_rb = jnp.clip(ring_block, 0, max_blocks - 1)
    ring_ok = (ring_block >= 0) & blk_is_zone[safe_rb]

    # touches-road predicate (`_touches_road` `city_model.py:1783-1797`)
    touch_codes = jnp.array([C.R1, C.R2, C.R3, C.INTERSECTION,
                             C.HIGHWAY_ENTRANCE, C.CONTROLLED_ROAD],
                            dtype=jnp.uint8)
    touchy = jnp.isin(cell, touch_codes)
    touches = jnp.zeros((H, W), bool)
    for d in range(4):
        touches = touches | _shift_from(touchy, d)

    cand = ring_ok & touches & (cell == C.SIDEWALK)

    # road-level filter (`city_model.py:897-899, 911-925`)
    lvl = min(cfg.BLOCK_ENTRANCE_ROAD_LEVEL, 2)
    if lvl > 0:
        allowed_types = [C.R1] if lvl == 2 else [C.R1, C.R2]
        good = jnp.isin(cell, jnp.array(allowed_types, dtype=jnp.uint8))
        passes = jnp.zeros((H, W), bool)
        for d in range(4):
            passes = passes | _shift_from(good, d)
        seg = jnp.where(cand & passes, safe_rb, max_blocks).reshape(-1)
        has_pref = _seg_sum(jnp.ones_like(seg), seg, max_blocks + 1)
        has_pref = has_pref[:max_blocks] > 0
        cand = cand & (passes | ~has_pref[safe_rb])

    # split candidates into per-block 4-connected runs
    runs = connected_components_keyed(cand, jnp.where(cand, ring_block, -1))
    flat_runs = runs.reshape(-1)
    rseg = jnp.where(flat_runs >= 0, flat_runs, HW)
    ones = jnp.ones((HW,), jnp.int32)
    run_len_tab = _seg_sum(jnp.where(flat_runs >= 0, ones, 0), rseg, HW + 1)
    xs = jnp.arange(HW, dtype=jnp.int32) % W
    ys = jnp.arange(HW, dtype=jnp.int32) // W
    cand_flat = cand.reshape(-1)
    my_run = jnp.clip(flat_runs, 0, HW)
    my_len = jnp.where(cand_flat, run_len_tab[my_run], 0)
    bseg = jnp.where(cand_flat, ring_block.reshape(-1), max_blocks)
    bseg = jnp.clip(bseg, 0, max_blocks)

    # best run per block: longest, tie-broken randomly (hash of root +
    # per-world salt = `random.choice(longest_runs)`) or by smallest root
    big = jnp.int32(2**30)
    best_len = _seg_max(my_len, bseg, max_blocks + 1, jnp.int32(0))
    is_best_len = cand_flat & (my_len == best_len[bseg]) & (my_len > 0)
    if key is not None:
        salt = jax.random.bits(key, (), jnp.uint32)
        # keep the hashed key STRICTLY below the `big` sentinel (2^30):
        # a 31-bit key can exceed it, and then the masked seg-min returns
        # the sentinel and the block silently gets NO entrance
        tiekey = (_hash32(flat_runs.astype(jnp.uint32) ^ salt)
                  >> 2).astype(jnp.int32)
    else:
        tiekey = flat_runs
    best_tk = _seg_min(jnp.where(is_best_len, tiekey, big), bseg,
                       max_blocks + 1, big)
    in_best = is_best_len & (tiekey == best_tk[bseg]) & \
        (best_tk[bseg] < big)

    # middle cell of the (x, y)-ordered run: rank every candidate within
    # its run by one global argsort over (run, x, y), then pick
    # rank == len // 2 (`run[len(run) // 2]`, `city_model.py:956`)
    runkey = jnp.where(cand_flat, my_run, HW).astype(jnp.int32)
    localkey = (xs * H + ys).astype(jnp.int32)
    _, _, order = jax.lax.sort(
        (runkey, localkey, jnp.arange(HW, dtype=jnp.int32)), num_keys=2)
    rank = jnp.zeros((HW,), jnp.int32).at[order].set(
        jnp.arange(HW, dtype=jnp.int32))
    run_rank0 = _seg_min(jnp.where(cand_flat, rank, big), rseg, HW + 1,
                         big)
    pos = rank - run_rank0[my_run]
    at_mid = in_best & (pos == my_len // 2)
    entrance_flat = _seg_min(
        jnp.where(at_mid, jnp.arange(HW, dtype=jnp.int32), big), bseg,
        max_blocks + 1, big)[:max_blocks]
    entrance_flat = jnp.where(entrance_flat >= big, -1, entrance_flat)

    # place entrances
    ent_mask = jnp.zeros((HW,), bool).at[
        jnp.where(entrance_flat >= 0, entrance_flat, 0)].set(
        entrance_flat >= 0).reshape(H, W)
    cell = jnp.where(ent_mask, jnp.uint8(C.BLOCK_ENTRANCE), cell)
    allowed = jnp.where(ent_mask, jnp.uint8(0), allowed)
    return cell, allowed, entrance_flat


def place_service_cells(cell, block_ids, btype, entrance_flat,
                        max_blocks: int):
    """Per-block service road cell (`CityBlock.get_service_road_cell`
    `city_block.py:152-202`): the road cell nearest the entrance that
    touches the block's sidewalk ring and is not directly in front of
    the entrance.  Static top-ranked pick (the reference's dynamic
    parked-vehicle skip is not modeled — parked trucks there become hard
    obstacles that other traffic overtakes, like the reference).

    Returns service_flat [B] i32 (-1 when the block has none)."""
    H, W = cell.shape
    HW = H * W

    ring_block = jnp.full((H, W), -1, jnp.int32)
    for d in range(4):
        nb = _shift_from(jnp.where(block_ids >= 0, block_ids, -1), d)
        ring_block = jnp.maximum(ring_block, nb)
    ring_block = jnp.where(block_ids >= 0, -1, ring_block)
    ring_block = jnp.where(cell == C.SIDEWALK, ring_block, -1)

    road_mask = jnp.isin(cell, jnp.array([C.R1, C.R2, C.R3],
                                         dtype=jnp.uint8))
    # road cells adjacent to a ring sidewalk of block b
    cand_block = jnp.full((H, W), -1, jnp.int32)
    for d in range(4):
        cand_block = jnp.maximum(cand_block, _shift_from(ring_block, d))
    cand_block = jnp.where(road_mask, cand_block, -1)

    # exclude cells directly in front of the entrance
    ent_mask = jnp.zeros((HW,), bool).at[
        jnp.where(entrance_flat >= 0, entrance_flat, HW - 1)].set(
        entrance_flat >= 0).reshape(H, W)
    near_ent = jnp.zeros((H, W), bool)
    for d in range(4):
        near_ent = near_ent | _shift_from(ent_mask, d)
    cand_block = jnp.where(near_ent, -1, cand_block)

    # rank by Manhattan distance to the block's entrance
    flat = jnp.arange(HW, dtype=jnp.int32)
    xs = flat % W
    ys = flat // W
    cb = cand_block.reshape(-1)
    safe_b = jnp.clip(cb, 0, max_blocks - 1)
    e = entrance_flat[safe_b]
    valid = (cb >= 0) & (e >= 0)
    dist = jnp.abs(xs - e % W) + jnp.abs(ys - e // W)
    big = jnp.int32(2**30)
    seg = jnp.where(valid, safe_b, max_blocks)
    min_dist = _seg_min(jnp.where(valid, dist, big), seg, max_blocks + 1,
                        big)
    at_min = valid & (dist == min_dist[seg])
    service_flat = _seg_min(jnp.where(at_min, flat, big), seg,
                            max_blocks + 1, big)[:max_blocks]
    return jnp.where(service_flat >= big, -1, service_flat)


def add_entrance_directions(cell, allowed):
    """Roads adjacent to a BlockEntrance gain an arrow into it; the
    entrance gets the opposite arrows (`city_model.py:1035-1070`)."""
    is_ent = cell == C.BLOCK_ENTRANCE
    road_like = jnp.isin(cell, jnp.array(C.ROAD_LIKE, dtype=jnp.uint8))
    out = allowed
    for d in range(4):
        od = (d + 2) % 4
        # a road whose neighbor in direction d is an entrance -> arrow d
        ent_at_d = _shift_from(is_ent, d)
        out = jnp.where(road_like & ent_at_d & ~is_ent,
                        out | jnp.uint8(C.DIR_BITS[d]), out)
        # the entrance itself points back toward the road (direction od
        # from the entrance's perspective = toward neighbor at od)
        road_at_od = _shift_from(road_like & ~is_ent, od)
        out = jnp.where(is_ent & road_at_od,
                        out | jnp.uint8(C.DIR_BITS[od]), out)
    return out
