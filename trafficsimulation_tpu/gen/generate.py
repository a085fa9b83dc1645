"""Full procedural-generation pipeline as one jittable array program.

Mirrors the reference `CityModel.__init__` 14-stage pipeline
(`city_model.py:125-148`) — see the per-stage modules for the detailed
file:line mapping.  The whole function jits and vmaps over PRNG keys, so
thousands of city variants generate in parallel on-device
(BASELINE config #4).

All 14 stages are implemented, including the optional sub-block L-road
carving (`gen/subblocks.py`, reference `_carve_subblock_roads`
`city_model.py:563-737`; wired below, seed-variation tested in
tests/test_gen.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from ..core.state import (Grid, LightStatic, GroupStatic, BlockStatic,
                          DestStatic)
from .bands import sample_axis_bands, ensure_minimum_highways
from .raster import rasterize
from .zoning import (apply_zoning, eliminate_dead_ends,
                     upgrade_r2_to_intersections, place_entrances,
                     prune_intersection_dirs, add_entrance_directions)
from .lights import build_lights_and_groups
from ..ops.routing import compute_cost_fields


def _routing_road_class(cfg: Config, cell, orig_type, ring_corner):
    """road_type_map parity (`_build_simple_maps` `city_model.py:2151-2199`):
    R1/intersections/all entrances/exits (and ring-corner R2) -> 1,
    R2 -> 2, R3 -> 3, others 0.  Controlled roads use their original type."""
    base = jnp.where(jnp.isin(cell, jnp.array(
        [C.INTERSECTION, C.HIGHWAY_ENTRANCE, C.HIGHWAY_EXIT,
         C.BLOCK_ENTRANCE], dtype=jnp.uint8)), 1, 0)
    t = jnp.where(cell == C.CONTROLLED_ROAD, orig_type, cell)
    base = jnp.where(t == C.R1, 1, base)
    base = jnp.where(t == C.R2, jnp.where(ring_corner, 1, 2), base)
    base = jnp.where(t == C.R3, 3, base)
    return base.astype(jnp.uint8)


def generate_city(cfg: Config, key: jnp.ndarray):
    """Returns (grid, lights_static, groups_static, blocks_static, dests,
    cost_field)."""
    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    HW = H * W
    kh, kv, khm, kvm, kz, kent = jax.random.split(key, 6)

    # ---- road bands -------------------------------------------------------
    hbands = sample_axis_bands(kh, cfg, cfg.interior_y_min,
                               cfg.interior_y_max, True, caps.max_bands)
    vbands = sample_axis_bands(kv, cfg, cfg.interior_x_min,
                               cfg.interior_x_max, False, caps.max_bands)
    inset = cfg.interior_x_min + cfg.HIGHWAY_OFFSET
    hbands = ensure_minimum_highways(khm, cfg, hbands, H, inset)
    vbands = ensure_minimum_highways(kvm, cfg, vbands, W, inset)

    # ---- rasterize + optional sub-block L-roads + zoning --------------------
    ras = rasterize(cfg, hbands, vbands)
    cell = ras["cell_type"]
    allowed = ras["allowed_dirs"]
    if cfg.CARVE_SUBBLOCK_ROADS:
        from .subblocks import carve_subblock_roads
        kz, ksb = jax.random.split(kz)
        cell, allowed = carve_subblock_roads(cfg, ksb, cell, allowed,
                                             caps.max_blocks)
    cell, block_ids, btype, inner_count, bvalid = apply_zoning(
        kz, cfg, cell, caps.max_blocks)
    cell, allowed = eliminate_dead_ends(cell, allowed)
    cell, allowed, _up = upgrade_r2_to_intersections(
        cfg, cell, allowed, ras["horiz_band"], ras["ring_corner"])
    cell, allowed, entrance_flat = place_entrances(
        cfg, cell, allowed, block_ids, btype, caps.max_blocks, key=kent)
    allowed = prune_intersection_dirs(cell, allowed)
    allowed = add_entrance_directions(cell, allowed)

    # ---- lights & groups --------------------------------------------------
    lg = build_lights_and_groups(cfg, caps, cell, allowed,
                                 hbands=hbands, vbands=vbands)
    cell = lg["cell_type"]

    # ---- destination set: block entrances, highway exits, then block
    # service road cells (`get_service_road_cell` parity — service
    # vehicles park ON the road next to the block) -------------------------
    from .zoning import place_service_cells
    B, E = caps.max_blocks, caps.max_exits
    exit_flat = jnp.nonzero((cell == C.HIGHWAY_EXIT).reshape(-1),
                            size=E, fill_value=-1)[0].astype(jnp.int32)
    ent_valid = entrance_flat >= 0
    service_flat = place_service_cells(cell, block_ids, btype,
                                       entrance_flat, B)
    svc_valid = (service_flat >= 0) & ent_valid
    dest_pos = jnp.concatenate([jnp.where(ent_valid, entrance_flat, 0),
                                jnp.where(exit_flat >= 0, exit_flat, 0),
                                jnp.where(svc_valid, service_flat, 0)])
    dest_valid = jnp.concatenate([ent_valid, exit_flat >= 0, svc_valid])
    dest_kind = jnp.concatenate([
        jnp.zeros((B,), jnp.uint8), jnp.ones((E,), jnp.uint8),
        jnp.full((B,), 2, jnp.uint8)])
    dest_block = jnp.concatenate([
        jnp.arange(B, dtype=jnp.int32),
        jnp.full((E,), -1, jnp.int32),
        jnp.arange(B, dtype=jnp.int32)])
    dest_block = jnp.where(dest_valid, dest_block, -1)

    # compact valid destinations to the front so cost fields cover them:
    # only the first MAX_FIELD_DESTS slots get a [4,H,W] field (the HBM
    # memory knob for 1024x1024 worlds).  Entrances and exits sort ahead
    # of service cells (concat order is preserved by the stable sort).
    D_ALL = 2 * B + E
    order = jnp.argsort(~dest_valid, stable=True)
    inv = jnp.argsort(order).astype(jnp.int32)
    dest_pos = dest_pos[order]
    dest_valid = dest_valid[order]
    dest_kind = dest_kind[order]
    dest_block = dest_block[order]
    ent_dest_id = jnp.where(ent_valid, inv[:B], -1)
    svc_dest_id = jnp.where(svc_valid, inv[B + E:], -1)
    hw_pos = jnp.nonzero((cell == C.HIGHWAY_ENTRANCE).reshape(-1),
                         size=caps.max_entrances_hw,
                         fill_value=-1)[0].astype(jnp.int32)
    dests = DestStatic(valid=dest_valid, pos=dest_pos, kind=dest_kind,
                       block=dest_block, hw_pos=hw_pos,
                       hw_valid=hw_pos >= 0)

    dest_plane = jnp.full((HW,), -1, jnp.int32).at[
        jnp.where(dest_valid, dest_pos, HW - 1)].set(
        jnp.where(dest_valid, jnp.arange(D_ALL, dtype=jnp.int32), -1))

    # ---- final planes ------------------------------------------------------
    road_class = _routing_road_class(cfg, cell, lg["orig_type"],
                                     ras["ring_corner"])
    is_road = jnp.isin(cell, jnp.array(C.ROAD_LIKE, dtype=jnp.uint8))
    intersection = cell == C.INTERSECTION

    grid = Grid(
        cell_type=cell,
        orig_type=lg["orig_type"],
        allowed_dirs=allowed,
        road_class=road_class,
        is_road=is_road,
        intersection=intersection,
        group_id=lg["group_plane"],
        block_id=block_ids,
        light_id=lg["light_id_plane"],
        dest_id=dest_plane.reshape(H, W),
        queue_group=lg["queue_group"],
        queue_bucket=lg["queue_bucket"],
    )

    lights_static = LightStatic(
        valid=lg["light_valid"],
        pos=lg["light_pos"],
        group=lg["light_group"],
        axis=lg["light_axis"],
        assign_road=lg["assign_road"],
        assign_light=lg["assign_light"],
        assign_valid=lg["assign_valid"],
        srun_lo=lg["srun_lo"],
        srun_hi=lg["srun_hi"],
        srun_light=lg["srun_light"],
        sextra_cell=lg["sextra_cell"],
        sextra_light=lg["sextra_light"],
    )
    # compact queue-cell list: gathering Q labeled cells per tick replaces
    # the full-grid scatter-add in the light reductions
    qgf = lg["queue_group"].reshape(-1)
    qbf = lg["queue_bucket"].reshape(-1).astype(jnp.int32)
    Q = caps.max_queue_cells
    qidx = jnp.nonzero(qgf >= 0, size=Q, fill_value=HW)[0].astype(jnp.int32)
    qcell = jnp.clip(qidx, 0, HW - 1)
    qvalid = qidx < HW
    # run decomposition (see gen/lights.py 6d): compact the run-end
    # planes; padded entries get seg -1 and a safe [0, 0) range
    ref = lg["run_end"].reshape(-1)
    ridx = jnp.nonzero(ref, size=Q, fill_value=HW)[0].astype(jnp.int32)
    rcell = jnp.clip(ridx, 0, HW - 1)
    rvalid = ridx < HW
    groups_static = GroupStatic(
        valid=lg["group_valid"],
        neighbor=lg["group_neighbor"],
        intermediates=lg["group_intermediates"],
        bbox=lg["group_bbox"],
        intersection_size=lg["intersection_size"],
        penalty_score=lg["penalty_score"],
        queue_cells=qcell,
        queue_qgroup=jnp.where(qvalid, qgf[qcell], -1),
        queue_qbucket=jnp.where(qvalid, qbf[qcell], 0),
        run_lo=jnp.where(rvalid, lg["run_lo_plane"].reshape(-1)[rcell], 0),
        run_hi=jnp.where(rvalid, lg["run_hi_plane"].reshape(-1)[rcell], 0),
        run_seg=jnp.where(rvalid, lg["run_seg_plane"].reshape(-1)[rcell],
                          -1),
    )

    zone_codes = jnp.array(C.ZONE_TYPES, dtype=jnp.uint8)
    needs_food = jnp.isin(btype, jnp.array(
        [C.NAME_TO_TYPE[n] for n in cfg.CITY_BLOCK_THAT_NEED_FOOD],
        dtype=jnp.uint8))
    produces_waste = jnp.isin(btype, jnp.array(
        [C.NAME_TO_TYPE[n] for n in cfg.CITY_BLOCK_THAT_PRODUCE_WASTE],
        dtype=jnp.uint8))
    blk_valid = bvalid & jnp.isin(btype, zone_codes)
    blocks_static = BlockStatic(
        valid=blk_valid,
        btype=btype,
        inner_count=inner_count,
        entrance=entrance_flat,
        dest=ent_dest_id,
        service_dest=svc_dest_id,
        food_cap=cfg.FOOD_CAPACITY_PER_CELL * inner_count.astype(jnp.float32),
        waste_cap=cfg.WASTE_CAPACITY_PER_CELL *
        inner_count.astype(jnp.float32),
        needs_food=needs_food & blk_valid,
        produces_waste=produces_waste & blk_valid,
    )

    DF = min(caps.max_dests, cfg.MAX_FIELD_DESTS or caps.max_dests)
    cost_field = compute_cost_fields(cfg, allowed, road_class,
                                     dest_pos[:DF], dest_valid[:DF],
                                     is_road=is_road)
    return grid, lights_static, groups_static, blocks_static, dests, cost_field
