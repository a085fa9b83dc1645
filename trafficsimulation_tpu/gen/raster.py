"""Rasterize road bands into the lattice planes.

Array re-expression of the reference generation stages 1-4
(`city_model.py:315-558`): thick wall, sidewalk inner ring, interior
clear, band overlap classification with optimized intersections
(`_make_intersection` `city_model.py:211-306`), European right-hand lane
direction assignment (`_compute_lane_dirs` `city_model.py:1275-1368`),
forced ring-corner overrides (`_override_corner_lane_dirs`
`city_model.py:498-558`), sidewalk edging, and boundary highway
entrances/exits (`city_model.py:1370-1420`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from .bands import Bands, per_coord_tables


def _bit(d):
    return jnp.uint8(1) << d.astype(jnp.uint8)


def _shift_from(mask: jnp.ndarray, d: int) -> jnp.ndarray:
    """Value of `mask` at the neighbor in direction d (N=+y, E=+x);
    out-of-bounds = False/0."""
    z = jnp.zeros_like(mask)
    if d == C.N_IDX:
        return z.at[:-1, :].set(mask[1:, :])
    if d == C.S_IDX:
        return z.at[1:, :].set(mask[:-1, :])
    if d == C.E_IDX:
        return z.at[:, :-1].set(mask[:, 1:])
    return z.at[:, 1:].set(mask[:, :-1])


def rasterize(cfg: Config, hbands: Bands, vbands: Bands):
    """Returns dict with cell_type u8 [H,W], allowed_dirs u8 [H,W],
    road_class u8, intersection bool, plus band lookup tables."""
    H, W = cfg.HEIGHT, cfg.WIDTH
    ht = per_coord_tables(hbands, H)   # indexed by y
    vt = per_coord_tables(vbands, W)   # indexed by x

    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]

    # ---- stage 1: wall, sidewalk ring, interior (`city_model.py:315-369`)
    cell = jnp.full((H, W), C.WALL, dtype=jnp.uint8)
    ws, sr = cfg.WALL_THICKNESS, cfg.SIDEWALK_RING_WIDTH
    in_ring_band_y = ((ys >= ws) & (ys < ws + sr)) | \
                     ((ys > H - ws - 1 - sr) & (ys <= H - ws - 1))
    in_ring_band_x = ((xs >= ws) & (xs < ws + sr)) | \
                     ((xs > W - ws - 1 - sr) & (xs <= W - ws - 1))
    in_frame_x = (xs >= ws) & (xs <= W - ws - 1)
    in_frame_y = (ys >= ws) & (ys <= H - ws - 1)
    ring = (in_ring_band_y & in_frame_x) | (in_ring_band_x & in_frame_y)
    cell = jnp.where(ring, C.SIDEWALK, cell)
    ixmin, ixmax = cfg.interior_x_min, cfg.interior_x_max
    iymin, iymax = cfg.interior_y_min, cfg.interior_y_max
    interior = (xs >= ixmin) & (xs <= ixmax) & (ys >= iymin) & (ys <= iymax)
    cell = jnp.where(interior, C.NOTHING, cell)

    # ---- stage 2: band overlap classification (`city_model.py:399-451`)
    hc = jnp.broadcast_to(ht["cover"][:, None], (H, W))
    vc = jnp.broadcast_to(vt["cover"][None, :], (H, W))
    h_rc = jnp.broadcast_to(ht["rclass"][:, None], (H, W))
    v_rc = jnp.broadcast_to(vt["rclass"][None, :], (H, W))
    h_off = jnp.broadcast_to(ht["offset"][:, None], (H, W))
    v_off = jnp.broadcast_to(vt["offset"][None, :], (H, W))
    h_sz = jnp.broadcast_to(ht["bsize"][:, None], (H, W))
    v_sz = jnp.broadcast_to(vt["bsize"][None, :], (H, W))
    h_dir = jnp.broadcast_to(ht["dir"][:, None], (H, W))
    v_dir = jnp.broadcast_to(vt["dir"][None, :], (H, W))

    both = hc & vc
    both_r1 = (h_rc == C.RC_R1) & (v_rc == C.RC_R1)
    process_both = both & (both_r1 | interior)

    # forced ring corner regions (regular road, `city_model.py:414-432`)
    ft = cfg.road_thickness(cfg.RING_ROAD_TYPE)
    bottom = (ys >= iymin) & (ys < iymin + ft)
    top = (ys > iymax - ft) & (ys <= iymax)
    left = (xs >= ixmin) & (xs < ixmin + ft)
    right = (xs > ixmax - ft) & (xs <= ixmax)
    corner_region = (bottom | top) & (left | right)
    corner = process_both & corner_region
    inter_cand = process_both & ~corner

    # optimized intersections: single x multi keeps only outer lanes
    # (`_make_intersection` `city_model.py:276-306`)
    single_multi = ((h_sz == 1) & (v_sz > 1)) | ((v_sz == 1) & (h_sz > 1))
    multi_is_h = h_sz > 1
    multi_off = jnp.where(multi_is_h, h_off, v_off)
    multi_sz = jnp.where(multi_is_h, h_sz, v_sz)
    inner = (multi_off != 0) & (multi_off != multi_sz - 1)
    revert = (inter_cand & single_multi & inner
              if cfg.OPTIMISED_INTERSECTIONS else jnp.zeros_like(inter_cand))
    intersection = inter_cand & ~revert

    # ---- road-cell planes -------------------------------------------------
    h_only = hc & ~vc
    v_only = vc & ~hc
    road_h = h_only & ((h_rc == C.RC_R1) | interior)
    road_v = v_only & ((v_rc == C.RC_R1) | interior)

    # combine band info per road cell: horizontal takes priority exactly
    # where the reference uses it (h_only, corner); revert uses multi band.
    use_h = road_h | corner | (revert & multi_is_h)
    use_v = road_v | (revert & ~multi_is_h)
    is_road_cell = use_h | use_v
    r_rc = jnp.where(use_h, h_rc, v_rc)
    r_off = jnp.where(use_h, h_off, v_off)
    r_sz = jnp.where(use_h, h_sz, v_sz)
    r_dir = jnp.where(use_h, h_dir, v_dir)
    horiz = use_h

    # ---- lane directions (`_compute_lane_dirs` `city_model.py:1275-1368`)
    inter_at = {d: _shift_from(intersection, d) for d in range(4)}
    bitN, bitE, bitS, bitW = (jnp.uint8(1), jnp.uint8(2),
                              jnp.uint8(4), jnp.uint8(8))
    zero = jnp.zeros((H, W), dtype=jnp.uint8)

    # R3: one-way along band dir
    dirs_r3 = _bit(jnp.maximum(r_dir, 0))
    # R2: horizontal off0=E off1=W; vertical off0=S off1=N
    dirs_r2 = jnp.where(horiz,
                        jnp.where(r_off == 0, bitE, bitW),
                        jnp.where(r_off == 0, bitS, bitN))
    # R1: two lanes per direction + side-shift arrows
    half = r_sz // 2
    eb = r_off < half  # eastbound (horiz) / southbound (vert) group
    dirs_r1_h = jnp.where(
        eb,
        bitE
        | jnp.where((r_off > 0) & ~inter_at[C.S_IDX], bitS, zero)
        | jnp.where((r_off < half - 1) & ~inter_at[C.N_IDX], bitN, zero),
        bitW
        | jnp.where((r_off < r_sz - 1) & ~inter_at[C.N_IDX], bitN, zero)
        | jnp.where((r_off > half) & ~inter_at[C.S_IDX], bitS, zero))
    dirs_r1_v = jnp.where(
        eb,
        bitS
        | jnp.where((r_off > 0) & ~inter_at[C.W_IDX], bitW, zero)
        | jnp.where((r_off < half - 1) & ~inter_at[C.E_IDX], bitE, zero),
        bitN
        | jnp.where((r_off < r_sz - 1) & ~inter_at[C.E_IDX], bitE, zero)
        | jnp.where((r_off > half) & ~inter_at[C.W_IDX], bitW, zero))
    dirs_r1 = jnp.where(horiz, dirs_r1_h, dirs_r1_v)

    dirs = jnp.where(r_rc == C.RC_R3, dirs_r3,
                     jnp.where(r_rc == C.RC_R2, dirs_r2, dirs_r1))

    # ---- ring corner overrides (`_override_corner_lane_dirs`) ------------
    if cfg.RING_ROAD_TYPE == "R2":
        in_bottom = jnp.broadcast_to(ht["is_first"][:, None], (H, W))
        in_top = jnp.broadcast_to(ht["is_last"][:, None], (H, W))
        in_left = jnp.broadcast_to(vt["is_first"][None, :], (H, W))
        in_right = jnp.broadcast_to(vt["is_last"][None, :], (H, W))
        lrow_b = ys - ht["first_start"]
        lrow_t = ys - ht["last_start"]
        lcol_l = xs - vt["first_start"]
        lcol_r = xs - vt["last_start"]

        def corner_dirs(mapping, lrow, lcol):
            # mapping[(row, col)] -> dir bit
            m = zero
            for (rr, cc), dname in mapping.items():
                b = jnp.uint8(C.DIR_BITS[C.DIR_NAMES.index(dname)])
                m = jnp.where((lrow == rr) & (lcol == cc), b, m)
            return m

        ov = zero
        sel_bl = in_bottom & in_left
        sel_br = in_bottom & in_right
        sel_tr = in_top & in_right
        sel_tl = in_top & in_left
        ov = jnp.where(sel_bl, corner_dirs(
            {(0, 0): "E", (0, 1): "E", (1, 0): "S", (1, 1): "N"},
            lrow_b, lcol_l), ov)
        ov = jnp.where(sel_br, corner_dirs(
            {(0, 0): "E", (0, 1): "N", (1, 0): "W", (1, 1): "N"},
            lrow_b, lcol_r), ov)
        ov = jnp.where(sel_tr, corner_dirs(
            {(0, 0): "S", (0, 1): "N", (1, 0): "W", (1, 1): "W"},
            lrow_t, lcol_r), ov)
        ov = jnp.where(sel_tl, corner_dirs(
            {(0, 0): "S", (0, 1): "E", (1, 0): "S", (1, 1): "W"},
            lrow_t, lcol_l), ov)
        in_any_corner = sel_bl | sel_br | sel_tr | sel_tl
        dirs = jnp.where(in_any_corner & (ov != 0), ov, dirs)

    # ---- write roads & intersections into the type plane ------------------
    road_only = is_road_cell & ~intersection
    type_of_rc = jnp.array([C.NOTHING, C.R1, C.R2, C.R3],
                           dtype=jnp.uint8)
    cell = jnp.where(road_only, type_of_rc[jnp.clip(r_rc, 0, 3)], cell)
    cell = jnp.where(intersection, C.INTERSECTION, cell)
    allowed = jnp.where(road_only, dirs, zero)
    allowed = jnp.where(intersection, jnp.uint8(15), allowed)

    # ---- sidewalk edging (`city_model.py:471-492`) -------------------------
    roadpos = road_only | intersection
    r1ish = road_only & (r_rc == C.RC_R1)
    near_road = jnp.zeros((H, W), dtype=bool)
    near_r1 = jnp.zeros((H, W), dtype=bool)
    for d in range(4):
        near_road = near_road | _shift_from(roadpos, d)
        near_r1 = near_r1 | _shift_from(r1ish, d)
    carve_nothing = near_road & (cell == C.NOTHING)
    carve_wall = near_r1 & (cell == C.WALL)
    cell = jnp.where(carve_nothing | carve_wall, C.SIDEWALK, cell)

    # ---- boundary highway entrances/exits (`city_model.py:1370-1420`) ------
    boundary = (xs == 0) | (xs == W - 1) | (ys == 0) | (ys == H - 1)
    is_r1_cell = cell == C.R1
    inward = ((xs == 0) & ((allowed & bitE) != 0)) | \
             ((xs == W - 1) & ((allowed & bitW) != 0)) | \
             ((ys == 0) & ((allowed & bitN) != 0)) | \
             ((ys == H - 1) & ((allowed & bitS) != 0))
    hw = boundary & is_r1_cell
    cell = jnp.where(hw & inward, C.HIGHWAY_ENTRANCE, cell)
    cell = jnp.where(hw & ~inward, C.HIGHWAY_EXIT, cell)

    # road_class plane: 1=R1 (and ring R2? reference road_type_map maps
    # ring/entrances/intersections to 1 — that is rebuilt later in
    # `build_simple_maps`); here keep the raw band class for generation.
    road_class = jnp.where(road_only | hw, r_rc.astype(jnp.uint8),
                           jnp.uint8(0))
    road_class = jnp.where(intersection, jnp.uint8(C.RC_R4), road_class)

    return dict(cell_type=cell, allowed_dirs=allowed, road_class=road_class,
                intersection=intersection, interior=interior,
                ring_corner=corner, horiz_band=horiz,
                ht=ht, vt=vt)
