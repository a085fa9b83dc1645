"""Traffic-light placement, intersection light groups, and queue labels.

Array re-expression of reference stages 10-11:
`_add_traffic_lights` / `_assign_traffic_light` / `_scan_for_traffic_flow*`
(`city_model.py:1422-1584`) and `_create_intersection_light_groups`
(`city_model.py:1587-1650`) + `IntersectionLightGroup.
initialize_cached_lane_coords` / `populate_links`
(`intersection_light_group.py:118-279`).

Instead of per-light ragged coordinate lists, every lane cell carries
(queue_group, queue_bucket) labels; per-tick queues/pressures become one
segment-sum over the grid (replacing the njit reducers
`numba_utilities.py:65-152`).

Parity notes:
* the backward ray scan uses "cell flows toward the controlled road"
  (direction bit along the ray) instead of the reference's global-BFS
  `leads_to` (`cell.py:201-227`), which is almost always true on the
  connected road graph; the dir-bit test is the lane-local meaning.
* neighbor-group discovery walks a straight ray from the group bbox
  center with a bbox-extent `blocks_all_lanes` test
  (`intersection_light_group.py:185-202`); passed-over smaller groups
  are recorded as intermediates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config, Capacities
from ..ops.labels import connected_components, compact_labels
from .raster import _shift_from
from .zoning import _seg_min, _seg_max, _seg_sum

# queue bucket codes
NS_IN, NS_OUT, EW_IN, EW_OUT = 0, 1, 2, 3


def _flat(y, x, W):
    return y * W + x


def run_decompose(lab: jnp.ndarray):
    """Axis-aligned run decomposition of a label plane: every labeled
    cell lands in exactly one maximal vertical-chain or horizontal run
    of equal labels (length-1 runs allowed).  Returns (run_end bool
    [H, W] — one marker cell per run, lo, hi) where [lo, hi) index the
    padded prefix/diff buffers: H-runs into an [H, W+1] section (row y,
    cols x0..x1 -> y*(W+1)+x0 .. +x1+1), V-runs into an [H+1, W] section
    at offset H*(W+1).  Exact segmented chain lengths via log-doubling
    (SURVEY §7.3(3): prefix-scan re-formulations of ragged per-object
    lists)."""
    H, W = lab.shape

    def _shift_fill(x, dy, dx, fill):
        out = x
        if dy:
            pad = jnp.full((abs(dy), W), fill, x.dtype)
            out = (jnp.concatenate([pad, out[:-dy]], 0) if dy > 0
                   else jnp.concatenate([out[-dy:], pad], 0))
        if dx:
            pad = jnp.full((H, abs(dx)), fill, x.dtype)
            out = (jnp.concatenate([pad, out[:, :-dx]], 1) if dx > 0
                   else jnp.concatenate([out[:, -dx:], pad], 1))
        return out

    labeled = lab >= 0
    same_up = labeled & (lab == _shift_fill(lab, 1, 0, -1))
    same_dn = labeled & (lab == _shift_fill(lab, -1, 0, -1))
    vish = labeled & (same_up | same_dn)
    hish = labeled & ~vish
    same_w = hish & (lab == _shift_fill(lab, 0, 1, -1)) & \
        _shift_fill(hish, 0, 1, False)

    def chain_len(s, dy, dx):
        """d[c] = length of the consecutive s-chain ending at c (number
        of predecessors linked to c through s)."""
        d = s.astype(jnp.int32)
        step = 1
        n = H if dy else W
        while step < n:
            up = _shift_fill(d, step * dy, step * dx, 0)
            d = d + jnp.where(d == step, up, 0)
            step *= 2
        return d

    dv = chain_len(same_up, 1, 0)       # predecessors above
    dh = chain_len(same_w, 0, 1)        # predecessors to the left
    v_end = vish & ~same_dn             # bottom cell of each column chain
    h_end = hish & ~(_shift_fill(same_w, 0, -1, False))
    v_len = dv + 1
    h_len = dh + 1

    yy, xx = jnp.mgrid[0:H, 0:W]
    OFF_V = H * (W + 1)
    h_lo = yy * (W + 1) + (xx - h_len + 1)
    h_hi = yy * (W + 1) + xx + 1
    v_lo = OFF_V + (yy - v_len + 1) * W + xx
    v_hi = OFF_V + (yy + 1) * W + xx
    run_end = v_end | h_end
    lo = jnp.where(v_end, v_lo, h_lo)
    hi = jnp.where(v_end, v_hi, h_hi)
    return run_end, lo, hi


def _band_bounds(bands, n: int):
    """Per-coordinate band interval: (lo, hi) arrays [n] with -1 where no
    band covers the coordinate (the reference's `_find_band_covering` /
    `_band_or_single` fallback, `intersection_light_group.py:179-181`)."""
    coords = jnp.arange(n, dtype=jnp.int32)
    cover = bands.valid[:, None] & (bands.start[:, None] <= coords) \
        & (coords <= bands.end[:, None])
    lo = jnp.max(jnp.where(cover, bands.start[:, None], -1), axis=0)
    hi = jnp.max(jnp.where(cover, bands.end[:, None], -1), axis=0)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def _blocks_all_lanes_planes(inter, hbands, vbands):
    """`blocks_all_lanes(ix, iy, d)` (`intersection_light_group.py:185-202`)
    as two per-cell planes — the predicate depends only on the HIT cell
    and the walk axis, never on the walker:

      blocks_v[y, x]: a vertical (N/S) ray stopping at (x, y) treats
        that group as a full neighbor iff the hit cell's VERTICAL road
        band is intersection across its whole width at row y (multi-lane
        band), or — single lane — the cell itself is intersection and
        the crossing horizontal band is multi-lane or intersects at its
        first row.
      blocks_h[y, x]: the E/W mirror.
    """
    H, W = inter.shape
    ii = inter.astype(jnp.int32)
    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]

    vlo, vhi = _band_bounds(vbands, W)          # vertical bands over x
    hlo, hhi = _band_bounds(hbands, H)          # horizontal bands over y
    vx0 = jnp.where(vlo >= 0, vlo, jnp.arange(W))[None, :]
    vx1 = jnp.where(vhi >= 0, vhi, jnp.arange(W))[None, :]
    hy0 = jnp.where(hlo >= 0, hlo, jnp.arange(H))[:, None]
    hy1 = jnp.where(hhi >= 0, hhi, jnp.arange(H))[:, None]
    multi_v = vx1 > vx0
    multi_h = hy1 > hy0

    # exclusive prefixes of intersections along rows and columns
    Pr = jnp.pad(jnp.cumsum(ii, axis=1), ((0, 0), (1, 0)))   # [H, W+1]
    Pc = jnp.pad(jnp.cumsum(ii, axis=0), ((1, 0), (0, 0)))   # [H+1, W]

    vx0b = jnp.broadcast_to(vx0, (H, W))
    vx1b = jnp.broadcast_to(vx1, (H, W))
    hy0b = jnp.broadcast_to(hy0, (H, W))
    hy1b = jnp.broadcast_to(hy1, (H, W))
    cov_v = (jnp.take_along_axis(Pr, vx1b + 1, axis=1)
             - jnp.take_along_axis(Pr, vx0b, axis=1)) == (vx1b - vx0b + 1)
    cov_h = (jnp.take_along_axis(Pc, hy1b + 1, axis=0)
             - jnp.take_along_axis(Pc, hy0b, axis=0)) == (hy1b - hy0b + 1)
    inter_vx0 = jnp.take_along_axis(inter, vx0b, axis=1)     # (vx0, y)
    inter_hy0 = jnp.take_along_axis(inter, hy0b, axis=0)     # (x, hy0)

    blocks_v = jnp.where(multi_v, cov_v,
                         inter_vx0 & (multi_h | inter_hy0))
    blocks_h = jnp.where(multi_h, cov_h,
                         inter_hy0 & (multi_v | inter_vx0))
    return blocks_v, blocks_h


def build_lights_and_groups(cfg: Config, caps: Capacities,
                            cell: jnp.ndarray, allowed: jnp.ndarray,
                            hbands=None, vbands=None):
    H, W = cell.shape
    HW = H * W
    ys = jnp.arange(H, dtype=jnp.int32)[:, None] * jnp.ones((1, W), jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)[None, :] * jnp.ones((H, 1), jnp.int32)

    # ---- 1. controlled roads (`city_model.py:1422-1499`) -----------------
    convertible = jnp.isin(
        cell, jnp.array(C.ROAD_LIKE_NO_INTERSECTION, dtype=jnp.uint8))
    inter = cell == C.INTERSECTION
    points_in = jnp.zeros((H, W), bool)
    for d in range(4):
        points_in = points_in | (((allowed & jnp.uint8(C.DIR_BITS[d])) != 0)
                                 & _shift_from(inter, d))
    controlled = convertible & points_in
    orig_type = cell
    cell = jnp.where(controlled, jnp.uint8(C.CONTROLLED_ROAD), cell)

    # ---- 2. light placement per (cell, dir) -------------------------------
    # per direction d: candidate at p1 = c + vec(right(d)); escalation to
    # p2 = c + 2*vec(right(d)) when p1 is a same-flow road lane.
    assign_valid = []
    assign_target = []
    light_mask = jnp.zeros((H, W), bool)
    for d in range(4):
        rd = (d + 1) % 4               # DIRECTION_TO_THE_RIGHT
        ord_ = (rd + 2) % 4            # opposite of rd
        has_d = controlled & ((allowed & jnp.uint8(C.DIR_BITS[d])) != 0)
        p1_type = _shift_from(cell, rd)
        p1_allowed = _shift_from(allowed, rd)
        p1_orig = _shift_from(orig_type, rd)
        p1_sw = p1_type == C.SIDEWALK
        p1_lane = ((p1_type == C.CONTROLLED_ROAD) | (p1_orig == orig_type)) \
            & ((p1_allowed & allowed) != 0)
        p2_type = _shift_from(_shift_from(cell, rd), rd)
        p2_sw = p2_type == C.SIDEWALK
        t1 = has_d & p1_sw
        t2 = has_d & ~p1_sw & p1_lane & p2_sw
        # scatter light cells: target receives from its neighbor at ord_
        light_mask = light_mask | _shift_from(t1, ord_)
        light_mask = light_mask | _shift_from(_shift_from(t2, ord_), ord_)
        # record the assignment (road -> target flat index)
        ty1 = ys + C.DIR_DY[rd]
        tx1 = xs + C.DIR_DX[rd]
        ty2 = ys + 2 * C.DIR_DY[rd]
        tx2 = xs + 2 * C.DIR_DX[rd]
        tgt = jnp.where(t1, _flat(ty1, tx1, W),
                        jnp.where(t2, _flat(ty2, tx2, W), -1))
        assign_valid.append(t1 | t2)
        assign_target.append(tgt)

    av = jnp.stack(assign_valid).reshape(-1)          # [4*HW]
    at = jnp.stack(assign_target).reshape(-1)
    aroad = jnp.tile(jnp.arange(HW, dtype=jnp.int32), 4)

    A = caps.max_lights * 4
    aidx = jnp.nonzero(av, size=A, fill_value=-1)[0]
    a_ok = aidx >= 0
    a_road = jnp.where(a_ok, aroad[jnp.clip(aidx, 0, 4 * HW - 1)], -1)
    a_tgt = jnp.where(a_ok, at[jnp.clip(aidx, 0, 4 * HW - 1)], -1)

    # ---- 3. light table ----------------------------------------------------
    L = caps.max_lights
    lpos = jnp.nonzero(light_mask.reshape(-1), size=L, fill_value=-1)[0]
    lpos = lpos.astype(jnp.int32)
    l_ok = lpos >= 0
    light_id_plane = jnp.full((HW,), -1, jnp.int32).at[
        jnp.where(l_ok, lpos, HW - 1)].set(
        jnp.where(l_ok, jnp.arange(L, dtype=jnp.int32), -1))
    cell = jnp.where(light_mask, jnp.uint8(C.TRAFFIC_LIGHT), cell)
    a_light = jnp.where(a_ok, light_id_plane[jnp.clip(a_tgt, 0, HW - 1)], -1)

    # ---- 4. intersection groups (`city_model.py:1587-1650`) ---------------
    comp = connected_components(inter)
    group_plane, roots, _ = compact_labels(comp, caps.max_groups)
    G = caps.max_groups
    gseg = jnp.where(group_plane.reshape(-1) >= 0,
                     group_plane.reshape(-1), G)
    fx = xs.reshape(-1)
    fy = ys.reshape(-1)
    gminx = _seg_min(jnp.where(gseg < G, fx, 2**30), gseg, G + 1,
                     jnp.int32(2**30))[:G]
    gmaxx = _seg_max(jnp.where(gseg < G, fx, -1), gseg, G + 1,
                     jnp.int32(-1))[:G]
    gminy = _seg_min(jnp.where(gseg < G, fy, 2**30), gseg, G + 1,
                     jnp.int32(2**30))[:G]
    gmaxy = _seg_max(jnp.where(gseg < G, fy, -1), gseg, G + 1,
                     jnp.int32(-1))[:G]
    gcount = _seg_sum(jnp.where(gseg < G, 1, 0).astype(jnp.int32),
                      gseg, G + 1)[:G]
    g_valid = roots >= 0

    # light -> group: a light belongs to g iff it sits on one of g's four
    # diagonal bbox corners.
    lx = jnp.where(l_ok, lpos % W, 0)
    ly = jnp.where(l_ok, lpos // W, 0)
    l_group = jnp.full((L,), -1, jnp.int32)
    gp2 = group_plane
    for sy in (-1, 1):
        for sx in (-1, 1):
            ny = jnp.clip(ly + sy, 0, H - 1)
            nx = jnp.clip(lx + sx, 0, W - 1)
            g = gp2[ny, nx]
            gs = jnp.clip(g, 0, G - 1)
            is_corner = (
                ((lx == gminx[gs] - 1) | (lx == gmaxx[gs] + 1)) &
                ((ly == gminy[gs] - 1) | (ly == gmaxy[gs] + 1)))
            hit = l_ok & (g >= 0) & is_corner
            l_group = jnp.where(hit, g, l_group)

    # groups with no lights are not created in the reference
    g_has_light = jnp.zeros((G,), bool).at[
        jnp.where(l_group >= 0, l_group, G - 1)].max(l_group >= 0)
    g_valid = g_valid & g_has_light

    # ---- 5. light axis (`populate_links` axis_dirs,
    # `intersection_light_group.py:243-279`) --------------------------------
    a_g = jnp.where(a_light >= 0, l_group[jnp.clip(a_light, 0, L - 1)], -1)
    rc_y = jnp.clip(a_road, 0, HW - 1) // W
    rc_x = jnp.clip(a_road, 0, HW - 1) % W
    road_dirs = allowed.reshape(-1)[jnp.clip(a_road, 0, HW - 1)]
    ns_q = jnp.zeros((A,), bool)
    ew_q = jnp.zeros((A,), bool)
    for d in range(4):
        ny = jnp.clip(rc_y + C.DIR_DY[d], 0, H - 1)
        nx = jnp.clip(rc_x + C.DIR_DX[d], 0, W - 1)
        nb_g = gp2[ny, nx]
        qual = a_ok & ((road_dirs & jnp.uint8(C.DIR_BITS[d])) != 0) & \
            (nb_g >= 0) & (nb_g == a_g)
        if d in (C.N_IDX, C.S_IDX):
            ns_q = ns_q | qual
        else:
            ew_q = ew_q | qual
    al_safe = jnp.where(a_light >= 0, a_light, L - 1)
    l_ns = jnp.zeros((L,), bool).at[al_safe].max(ns_q & (a_light >= 0))
    l_ew = jnp.zeros((L,), bool).at[al_safe].max(ew_q & (a_light >= 0))
    l_axis = jnp.where(l_ns, 0, jnp.where(l_ew, 1, -1))
    l_axis = jnp.where(l_ok & (l_group >= 0), l_axis, -1)

    # ---- 6. backward ray scan -> queue labels (`_scan_for_traffic_flow_
    # reverse` `city_model.py:1528-1548`) ------------------------------------
    R = cfg.TRAFFIC_LIGHT_RANGE + 1
    queue_group = jnp.full((HW,), -1, jnp.int32)
    queue_bucket = jnp.full((HW,), -1, jnp.int8)
    light_of_cell = jnp.full((HW,), -1, jnp.int32)
    orig_flat = orig_type.reshape(-1)
    allowed_flat = allowed.reshape(-1)
    a_orig = orig_flat[jnp.clip(a_road, 0, HW - 1)]
    a_ly = jnp.where(a_light >= 0, lpos[al_safe] // W, -1)
    a_lx = jnp.where(a_light >= 0, lpos[al_safe] % W, -1)

    # leads_to-faithful qualification (`cell.py:201-227`; PARITY former
    # known-gap #1): the reference continues the backward ray while the
    # cell's traffic can REACH the controlled road by a BFS over its
    # outgoing arrows — which keeps scanning through merge/side-shift
    # lane cells whose arrows point sideways rather than along the ray.
    # Bounded array form: reach_d[c] = following arrows from c reaches a
    # d-direction controlled cell within TRAFFIC_LIGHT_RANGE + 4 moves
    # (a backward wavefront from all d-approach controlled cells at
    # once; the unbounded BFS is bounded here by the scan range itself —
    # ray cells sit within range of their road).
    reach_d_planes = []
    K_REACH = cfg.TRAFFIC_LIGHT_RANGE + 4
    for d in range(4):
        srcs = a_ok & ((road_dirs & jnp.uint8(C.DIR_BITS[d])) != 0)
        src_plane = jnp.zeros((HW,), bool).at[
            jnp.where(srcs, a_road, HW - 1)].max(srcs).reshape(H, W)

        def reach_body(_k, r):
            grow = jnp.zeros((H, W), bool)
            for m in range(4):
                # c reaches when its arrow m points at a reaching cell
                legal = (allowed & jnp.uint8(C.DIR_BITS[m])) != 0
                grow = grow | (legal & _shift_from(r, m))
            return r | grow

        reach_d_planes.append(jax.lax.fori_loop(
            0, K_REACH, reach_body, src_plane))

    for d in range(4):
        has_d = a_ok & ((road_dirs & jnp.uint8(C.DIR_BITS[d])) != 0)
        reach_d = reach_d_planes[d]

        # fori_loop over the ray depth: the body (vector ops over [A] +
        # 3 scatters) compiles once instead of R times — generation
        # compile time is dominated by unrolled scatter HLOs
        def bscan_body(_k, st, d=d, reach_d=reach_d):
            queue_group, queue_bucket, light_of_cell, alive, py, px = st
            py = py - C.DIR_DY[d]
            px = px - C.DIR_DX[d]
            inb = (py >= 0) & (py < H) & (px >= 0) & (px < W)
            cy = jnp.clip(py, 0, H - 1)
            cx = jnp.clip(px, 0, W - 1)
            pf = cy * W + cx
            same_type = orig_type[cy, cx] == a_orig
            flows = reach_d[cy, cx]
            alive = alive & inb & same_type & flows
            # bucket by the ray cell's own dirs and position vs the light
            cdirs = allowed[cy, cx]
            is_ns = (cdirs & jnp.uint8(1 | 4)) != 0
            is_ew = (cdirs & jnp.uint8(2 | 8)) != 0
            bucket = jnp.where(
                is_ns, jnp.where(cy < a_ly, NS_IN, NS_OUT),
                jnp.where(is_ew, jnp.where(cx < a_lx, EW_IN, EW_OUT), -1))
            tgt = jnp.where(alive & (bucket >= 0), pf, HW - 1)
            put = alive & (bucket >= 0)
            queue_group = queue_group.at[tgt].set(
                jnp.where(put, a_g, queue_group[tgt]))
            queue_bucket = queue_bucket.at[tgt].set(
                jnp.where(put, bucket.astype(jnp.int8), queue_bucket[tgt]))
            light_of_cell = light_of_cell.at[tgt].set(
                jnp.where(put, a_light, light_of_cell[tgt]))
            return (queue_group, queue_bucket, light_of_cell, alive,
                    py, px)

        queue_group, queue_bucket, light_of_cell, _, _, _ = \
            jax.lax.fori_loop(0, R, bscan_body,
                              (queue_group, queue_bucket, light_of_cell,
                               has_d, rc_y, rc_x))

    # ---- 6b. optional forward scan (`_scan_for_traffic_flow_forward`
    # `city_model.py:1550-1584`): walk forward along the road's
    # directions labeling outgoing road cells; intersections handled per
    # FORWARD_TRAFFIC_LIGHT_INTERSECTIONS ("Skip" passes over them,
    # "Include in Range" labels and consumes range, "Include as Extra"
    # labels for free).  The reference's `directly_leads_to` recursion
    # (`cell.py:229-239`) makes opposite-lane cells transparent: the walk
    # passes through same-type cells that flow back toward the light
    # without labeling them and without consuming scan depth — expressed
    # here by keeping `alive` through all same-type cells and charging
    # depth only for labeled cells.
    if cfg.FORWARD_TRAFFIC_LIGHT_RANGE:
        mode = cfg.FORWARD_TRAFFIC_LIGHT_INTERSECTIONS
        for d in range(4):
            has_d = a_ok & ((road_dirs & jnp.uint8(C.DIR_BITS[d])) != 0)

            def fscan_body(_k, st, d=d, mode=mode):
                (queue_group, queue_bucket, light_of_cell, alive, depth,
                 py, px) = st
                py = py + C.DIR_DY[d]
                px = px + C.DIR_DX[d]
                inb = (py >= 0) & (py < H) & (px >= 0) & (px < W)
                cy = jnp.clip(py, 0, H - 1)
                cx = jnp.clip(px, 0, W - 1)
                pf = cy * W + cx
                ctype = cell[cy, cx]
                cdirs = allowed[cy, cx]
                is_int = ctype == C.INTERSECTION
                same = orig_type[cy, cx] == a_orig
                flows_on = (cdirs & jnp.uint8(C.DIR_BITS[d])) != 0
                in_range = depth <= cfg.TRAFFIC_LIGHT_RANGE
                label_int = is_int & (mode != "Skip")
                label_road = same & flows_on
                put = alive & inb & in_range & (label_int | label_road)
                is_ns = (cdirs & jnp.uint8(1 | 4)) != 0
                is_ew = (cdirs & jnp.uint8(2 | 8)) != 0
                bucket = jnp.where(
                    is_ns, jnp.where(cy < a_ly, NS_IN, NS_OUT),
                    jnp.where(is_ew,
                              jnp.where(cx < a_lx, EW_IN, EW_OUT), -1))
                tgt = jnp.where(put & (bucket >= 0), pf, HW - 1)
                ok_put = put & (bucket >= 0)
                queue_group = queue_group.at[tgt].set(
                    jnp.where(ok_put, a_g, queue_group[tgt]))
                queue_bucket = queue_bucket.at[tgt].set(
                    jnp.where(ok_put, bucket.astype(jnp.int8),
                              queue_bucket[tgt]))
                light_of_cell = light_of_cell.at[tgt].set(
                    jnp.where(ok_put, a_light, light_of_cell[tgt]))
                consumed = jnp.where(
                    is_int, jnp.int32(mode == "Include in Range"),
                    jnp.where(label_road, 1, 0))
                depth = depth + jnp.where(alive & inb, consumed, 0)
                alive = alive & inb & (is_int | same) & in_range
                return (queue_group, queue_bucket, light_of_cell, alive,
                        depth, py, px)

            queue_group, queue_bucket, light_of_cell, _, _, _, _ = \
                jax.lax.fori_loop(
                    0, 2 * R, fscan_body,
                    (queue_group, queue_bucket, light_of_cell, has_d,
                     jnp.zeros_like(a_road), rc_y, rc_x))
        del mode

    # ---- 6c. intersection cells get bucket-4 labels so the per-tick
    # clearance check (`is_intersection_occupied`) rides the same
    # segment-sum as the queues (one scatter instead of two).
    gp_flat = group_plane.reshape(-1)
    is_int_cell = gp_flat >= 0
    queue_group = jnp.where(is_int_cell, gp_flat, queue_group)
    queue_bucket = jnp.where(is_int_cell, jnp.int8(4), queue_bucket)

    # ---- 6d. axis-aligned run decomposition of the queue labels.  Per
    # tick, a run's occupancy count is a difference of two prefix sums
    # (fsm.group_reductions), so the scalar-bound gather shrinks from
    # one element per labeled CELL to two per RUN (~5x at range 10).
    # Exact segmented-chain lengths via log-doubling; every labeled cell
    # lands in exactly one run (vertical chains first, the rest become
    # horizontal runs, length-1 runs allowed).
    lab = jnp.where(queue_group >= 0,
                    queue_group * 5 + queue_bucket.astype(jnp.int32),
                    -1).reshape(H, W)
    run_end, run_lo_plane, run_hi_plane = run_decompose(lab)

    # ---- 6e. stop-cell runs per light: the same decomposition over a
    # light-ownership plane (own cell + assigned roads) so the per-tick
    # stop map becomes a diff-array write per run + prefix pass instead
    # of a scalar scatter per cell (fsm.build_stop_map).  Cells claimed
    # by several lights keep exact OR-semantics: the non-owning pairs go
    # to a small extras list.
    lab_l = jnp.full((HW,), -1, jnp.int32)
    put_a = a_ok & (a_light >= 0)
    lab_l = lab_l.at[jnp.where(put_a, a_road, HW - 1)].set(
        jnp.where(put_a, a_light, lab_l[jnp.clip(a_road, 0, HW - 1)]))
    lab_l = lab_l.at[jnp.where(l_ok, lpos, HW - 1)].set(
        jnp.where(l_ok, jnp.arange(L, dtype=jnp.int32),
                  lab_l[jnp.clip(lpos, 0, HW - 1)]))
    extra = put_a & (lab_l[jnp.clip(a_road, 0, HW - 1)] != a_light)
    sextra_cell = jnp.where(extra, a_road, -1)
    sextra_light = jnp.where(extra, a_light, -1)
    s_end, s_lo_plane, s_hi_plane = run_decompose(lab_l.reshape(H, W))
    A_cap = a_road.shape[0]
    sidx = jnp.nonzero(s_end.reshape(-1), size=A_cap, fill_value=-1)[0]
    s_ok = sidx >= 0
    sidx_c = jnp.clip(sidx, 0, HW - 1)
    srun_lo = jnp.where(s_ok, s_lo_plane.reshape(-1)[sidx_c], 0)
    srun_hi = jnp.where(s_ok, s_hi_plane.reshape(-1)[sidx_c], 0)
    srun_light = jnp.where(s_ok, lab_l[sidx_c], -1)

    # ---- 7. group scalar features (`intersection_light_group.py:155-171`)
    pen_tab = jnp.array([0.0, cfg.VEHICLE_ROAD_TYPES_PENALTY_R1,
                         cfg.VEHICLE_ROAD_TYPES_PENALTY_R2,
                         cfg.VEHICLE_ROAD_TYPES_PENALTY_R3, 0.0], jnp.float32)
    # penalty per labeled lane cell by its original road type
    type_to_rc = jnp.zeros((C.NUM_CELL_TYPES,), jnp.int32)
    type_to_rc = type_to_rc.at[C.R1].set(1).at[C.R2].set(2).at[C.R3].set(3)
    lane_rc = type_to_rc[orig_flat]
    lane_pen = pen_tab[lane_rc]
    is_lane = (queue_group >= 0) & (queue_bucket < 4)
    qg = jnp.where(is_lane, queue_group, G)
    pen_sum = _seg_sum(jnp.where(is_lane, lane_pen, 0.0), qg, G + 1)[:G]
    pen_cnt = _seg_sum(jnp.where(is_lane, 1.0, 0.0), qg, G + 1)[:G]
    penalty_score = jnp.where(pen_cnt > 0, pen_sum / jnp.maximum(pen_cnt, 1),
                              0.0)
    intersection_size = gcount.astype(jnp.float32) / 16.0

    # ---- 8. neighbor groups (straight-ray walk from bbox center) ----------
    ccx = jnp.clip((gminx + gmaxx) // 2, 0, W - 1)
    ccy = jnp.clip((gminy + gmaxy) // 2, 0, H - 1)
    neighbor = jnp.full((G, 4), -1, jnp.int32)
    M_INTER = 8
    intermediates = jnp.full((G, M_INTER), -1, jnp.int32)
    max_walk = max(H, W)
    gids = jnp.arange(G, dtype=jnp.int32)
    # a hit group "blocks all lanes" per the reference band predicate
    # (`blocks_all_lanes` `intersection_light_group.py:185-202`),
    # evaluated once as two per-cell planes (it depends only on the hit
    # cell and the walk axis); callers without band tables (synthetic
    # worlds) fall back to the round-2 bbox-extent approximation.
    # Smaller crossings become intermediates.
    if hbands is not None and vbands is not None:
        blocks_v, blocks_h = _blocks_all_lanes_planes(inter, hbands, vbands)
    else:
        blocks_v = blocks_h = None
    ext_x = gmaxx - gminx + 1
    ext_y = gmaxy - gminy + 1
    for d in range(4):
        my_ext = ext_x if d in (C.N_IDX, C.S_IDX) else ext_y
        nb_ext = ext_x if d in (C.N_IDX, C.S_IDX) else ext_y
        bplane = blocks_v if d in (C.N_IDX, C.S_IDX) else blocks_h

        def walk(s, st, bplane=bplane, d=d, my_ext=my_ext, nb_ext=nb_ext):
            found, inters, icnt, last = st
            py = ccy + (s + 1) * int(C.DIR_DY[d])
            px = ccx + (s + 1) * int(C.DIR_DX[d])
            inb = (py >= 0) & (py < H) & (px >= 0) & (px < W)
            pyc = jnp.clip(py, 0, H - 1)
            pxc = jnp.clip(px, 0, W - 1)
            g = gp2[pyc, pxc]
            fresh = inb & (g >= 0) & (g != gids) & (g != last) & (found < 0)
            if bplane is not None:
                blocks = bplane[pyc, pxc]
            else:
                gs = jnp.clip(g, 0, G - 1)
                blocks = nb_ext[gs] >= my_ext
            hit = fresh & blocks
            found = jnp.where(hit, g, found)
            # record a passed-over (non-blocking) group as intermediate
            put = fresh & ~blocks & (icnt < M_INTER)
            slot = jnp.clip(icnt, 0, M_INTER - 1)
            inters = inters.at[gids, slot].set(
                jnp.where(put, g, inters[gids, slot]))
            icnt = icnt + put.astype(jnp.int32)
            last = jnp.where(inb & (g >= 0), g, last)
            return found, inters, icnt, last

        found, inter_d, _, _ = jax.lax.fori_loop(
            0, max_walk, walk,
            (jnp.full((G,), -1, jnp.int32),
             jnp.full((G, M_INTER), -1, jnp.int32),
             jnp.zeros((G,), jnp.int32),
             jnp.full((G,), -1, jnp.int32)))
        neighbor = neighbor.at[:, d].set(jnp.where(g_valid, found, -1))
        # merge this direction's intermediates into free slots
        for k in range(M_INTER):
            cand = inter_d[:, k]
            has = g_valid & (cand >= 0)
            free = jnp.argmax(intermediates < 0, axis=1)
            intermediates = intermediates.at[gids, free].set(
                jnp.where(has & (intermediates[gids, free] < 0), cand,
                          intermediates[gids, free]))

    return dict(
        cell_type=cell,
        orig_type=orig_type,
        light_pos=jnp.where(l_ok, lpos, -1),
        light_valid=l_ok,
        light_group=jnp.where(l_ok, l_group, -1),
        light_axis=l_axis,
        light_id_plane=light_id_plane.reshape(H, W),
        assign_road=a_road,
        assign_light=a_light,
        assign_valid=a_ok & (a_light >= 0),
        srun_lo=srun_lo,
        srun_hi=srun_hi,
        srun_light=srun_light,
        sextra_cell=sextra_cell,
        sextra_light=sextra_light,
        group_plane=group_plane,
        group_valid=g_valid,
        group_neighbor=neighbor,
        group_intermediates=intermediates,
        group_bbox=jnp.stack([gminx, gmaxx, gminy, gmaxy], axis=1),
        intersection_size=intersection_size,
        penalty_score=penalty_score,
        queue_group=queue_group.reshape(H, W),
        queue_bucket=queue_bucket.reshape(H, W),
        light_of_cell=light_of_cell.reshape(H, W),
        run_end=run_end,
        run_lo_plane=run_lo_plane,
        run_hi_plane=run_hi_plane,
        run_seg_plane=jnp.where(run_end, lab, -1),
    )
