"""Generation invariants + determinism + vmap (SURVEY §4: golden/invariant
tests the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.gen.generate import generate_city


def _np(x):
    return np.asarray(x)


def test_frame_and_interior(small_cfg, small_city):
    grid = small_city[0]
    ct = _np(grid.cell_type)
    cfg = small_cfg
    # corners are wall (highways never pass through corners)
    assert ct[0, 0] == C.WALL and ct[-1, -1] == C.WALL
    # wall band is wall/sidewalk/highway only
    band = ct[:cfg.WALL_THICKNESS - 1, :]
    assert set(np.unique(band)) <= {C.WALL, C.SIDEWALK, C.R1,
                                    C.HIGHWAY_ENTRANCE, C.HIGHWAY_EXIT}
    # no leftover unzoned space
    assert (ct == C.NOTHING).sum() == 0


def test_road_cells_have_valid_directions(small_city):
    grid = small_city[0]
    ct = _np(grid.cell_type)
    dirs = _np(grid.allowed_dirs)
    road = np.isin(ct, [C.R1, C.R2, C.R3, C.CONTROLLED_ROAD])
    # every plain road cell has at least one arrow
    assert (dirs[road] != 0).all()
    # arrows from road cells land on road-like cells — except band-end
    # stubs, where a lane may run into its sidewalk edging.  The
    # reference produces the same stubs when `_force_one_highway`
    # removes a ring band whose span overlaps the new R1's exclusion
    # range (`city_model.py:1221-1231`); the router never takes such an
    # arrow (the cost field is INF on non-road cells).  Arrows must
    # never point at walls or zone interiors.
    H, W = ct.shape
    road_like = np.isin(ct, list(C.ROAD_LIKE))
    for d, (dy, dx) in enumerate(zip(C.DIR_DY, C.DIR_DX)):
        has = (dirs & (1 << d)) != 0
        ys, xs = np.nonzero(has & road)
        ny, nx = ys + dy, xs + dx
        inb = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        # boundary entrance/exit arrows may leave the map; plain roads not
        assert inb.all()
        tgt = ct[ny[inb], nx[inb]]
        assert (road_like[ny[inb], nx[inb]] | (tgt == C.SIDEWALK)).all()


def test_dead_end_two_core(small_city):
    grid = small_city[0]
    ct = _np(grid.cell_type)
    road_like = np.isin(ct, list(C.ROAD_LIKE))
    removable = np.isin(ct, list(C.REMOVABLE_DEAD_END))
    deg = np.zeros_like(ct, dtype=int)
    deg[1:, :] += road_like[:-1, :]
    deg[:-1, :] += road_like[1:, :]
    deg[:, 1:] += road_like[:, :-1]
    deg[:, :-1] += road_like[:, 1:]
    assert (deg[removable] >= 2).all()


def test_controlled_roads_point_into_intersections(small_city):
    grid = small_city[0]
    ct = _np(grid.cell_type)
    dirs = _np(grid.allowed_dirs)
    H, W = ct.shape
    inter = ct == C.INTERSECTION
    ys, xs = np.nonzero(ct == C.CONTROLLED_ROAD)
    for y, x in zip(ys, xs):
        hits = False
        for d, (dy, dx) in enumerate(zip(C.DIR_DY, C.DIR_DX)):
            if dirs[y, x] & (1 << d):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W and inter[ny, nx]:
                    hits = True
        assert hits, f"ControlledRoad at ({x},{y}) has no intersection arrow"


def test_lights_sit_on_group_corners(small_city):
    grid, ls, gs = small_city[0], small_city[1], small_city[2]
    pos = _np(ls.pos)
    valid = _np(ls.valid)
    group = _np(ls.group)
    bbox = _np(gs.bbox)
    W = grid.cell_type.shape[1]
    n_checked = 0
    for i in np.nonzero(valid & (group >= 0))[0]:
        x, y = pos[i] % W, pos[i] // W
        minx, maxx, miny, maxy = bbox[group[i]]
        assert x in (minx - 1, maxx + 1) and y in (miny - 1, maxy + 1)
        n_checked += 1
    assert n_checked > 0


def test_highway_io_on_boundary(small_city):
    grid = small_city[0]
    ct = _np(grid.cell_type)
    H, W = ct.shape
    for t in (C.HIGHWAY_ENTRANCE, C.HIGHWAY_EXIT):
        ys, xs = np.nonzero(ct == t)
        assert len(ys) > 0
        assert ((ys == 0) | (ys == H - 1) | (xs == 0) | (xs == W - 1)).all()


def test_block_entrances_have_arrows(small_city):
    grid, bs = small_city[0], small_city[3]
    ct = _np(grid.cell_type)
    dirs = _np(grid.allowed_dirs)
    ent = _np(bs.entrance)
    valid = _np(bs.valid)
    W = ct.shape[1]
    n = 0
    for e in ent[valid]:
        if e < 0:
            continue
        y, x = e // W, e % W
        assert ct[y, x] == C.BLOCK_ENTRANCE
        assert dirs[y, x] != 0   # arrows back toward the road
        n += 1
    assert n > 0


def test_determinism(gen_fn):
    a = gen_fn(jax.random.PRNGKey(7))
    b = gen_fn(jax.random.PRNGKey(7))
    assert (np.asarray(a[0].cell_type) == np.asarray(b[0].cell_type)).all()
    assert (np.asarray(a[0].allowed_dirs) == np.asarray(b[0].allowed_dirs)).all()


def test_seeds_differ(gen_fn):
    a = gen_fn(jax.random.PRNGKey(1))
    b = gen_fn(jax.random.PRNGKey(2))
    assert (np.asarray(a[0].cell_type) != np.asarray(b[0].cell_type)).any()


def test_subblock_roads(small_cfg):
    cfg = small_cfg.replace(CARVE_SUBBLOCK_ROADS=True, SUBBLOCK_CHANGE=1.0,
                            MIN_BLOCK_SPACING=10, MAX_BLOCK_SPACING=24)
    grid = generate_city(cfg, jax.random.PRNGKey(3))[0]
    ct = _np(grid.cell_type)
    dirs = _np(grid.allowed_dirs)
    road = np.isin(ct, [C.R1, C.R2, C.R3, C.CONTROLLED_ROAD])
    assert (dirs[road] != 0).all()
    # every surviving sub-block (R3) cell's arrows land on road-like
    # cells.  (Band-end arrows of R1/R2 lanes may dangle into sidewalk
    # when the min-R1 quota removed a ring band — the reference leaves
    # those too; they are unreachable dead ends for routing.)
    road_like = np.isin(ct, list(C.ROAD_LIKE))
    H, W = ct.shape
    r3 = ct == C.R3
    assert r3.any()
    for d, (dy, dx) in enumerate(zip(C.DIR_DY, C.DIR_DX)):
        has = ((dirs & (1 << d)) != 0) & r3
        ys, xs = np.nonzero(has)
        ny, nx = ys + dy, xs + dx
        assert ((ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)).all()
        assert road_like[ny, nx].all()


def test_subblock_layout_varies_with_seed(small_cfg):
    """Pivot position and leg directions are PRNG draws
    (`city_model.py:664-683`), so different seeds must yield different
    sub-block road layouts."""
    cfg = small_cfg.replace(CARVE_SUBBLOCK_ROADS=True, SUBBLOCK_CHANGE=1.0,
                            MIN_BLOCK_SPACING=10, MAX_BLOCK_SPACING=24)
    masks = []
    for seed in (3, 4):
        ct = _np(generate_city(cfg, jax.random.PRNGKey(seed))[0].cell_type)
        masks.append(ct == C.R3)
    assert masks[0].any() and masks[1].any()
    assert (masks[0] != masks[1]).any(), \
        "sub-block layout identical across seeds"


def test_vmap_generation(small_cfg, gen_fn):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    grids = jax.jit(jax.vmap(
        lambda k: generate_city(small_cfg, k)[0].cell_type))(keys)
    assert grids.shape[0] == 3
    single = gen_fn(keys[1])[0].cell_type
    assert (np.asarray(grids[1]) == np.asarray(single)).all()


def test_highway_labels(small_city):
    """Decorative highway I/O labels match the reference's format
    (`cell.py:79-152`): Orientation_Group_Cardinal_Type_Pair, numbered
    in reading order, pair index unique per (edge, type)."""
    import re
    from trafficsimulation_tpu import utils
    grid = small_city[0]
    cell = np.asarray(grid.cell_type)
    H, W = cell.shape
    pat = re.compile(r"^(Horizontal|Vertical)_\d+_"
                     r"(North|South|East|West)_(Entrance|Exit)_\d+$")
    seen = set()
    cells = np.argwhere(np.isin(cell, [C.HIGHWAY_ENTRANCE, C.HIGHWAY_EXIT]))
    assert len(cells) > 0
    for (y, x) in cells:
        lab = utils.highway_label(grid, int(y) * W + int(x))
        assert pat.match(lab), lab
        assert lab not in seen, f"duplicate label {lab}"
        seen.add(lab)


def test_backward_scan_leads_to_merge_geometry():
    """`leads_to`-faithful backward scan (`cell.py:201-227`,
    `city_model.py:1528-1548`): a side-shift lane cell whose only arrow
    points into the ADJACENT lane (R1 lane-change geometry) does not
    break the ray — its traffic still reaches the controlled road via
    the neighbor lane, so cells beyond it stay assigned to the light.
    The former lane-local dir-bit test stopped the ray there (PARITY
    known-gap #1)."""
    import jax
    from trafficsimulation_tpu import codes as C
    from trafficsimulation_tpu.config import Config
    from trafficsimulation_tpu.gen.lights import build_lights_and_groups

    Hh = Ww = 24
    cfg = Config(WIDTH=Ww, HEIGHT=Hh, TRAFFIC_LIGHT_RANGE=8)
    caps = cfg.capacities()
    cell = np.full((Hh, Ww), C.SIDEWALK, np.uint8)
    dirs = np.zeros((Hh, Ww), np.uint8)
    EB, SB = C.DIR_BITS[C.E_IDX], C.DIR_BITS[C.S_IDX]
    yl, yu = 10, 11          # two eastbound lanes (S = -y)
    xc = 16                  # intersection west edge
    for y in (yl, yu):
        cell[y, 2:xc] = C.R1
        dirs[y, 2:xc] = EB
    # side-shift cell on the upper lane: ONLY an arrow into the lower
    # lane (merge), 3 cells before the intersection
    dirs[yu, xc - 3] = SB
    # 2x2 intersection; through arrows keep flow going east
    for y in (yl, yu):
        for x in (xc, xc + 1):
            cell[y, x] = C.INTERSECTION
            dirs[y, x] = EB
    out = jax.jit(lambda c, d: build_lights_and_groups(
        cfg, caps, c, d))(jnp.asarray(cell), jnp.asarray(dirs))

    qg = np.asarray(out["queue_group"])
    loc = np.asarray(out["light_of_cell"])
    # the cell beyond the side-shift cell is still scanned + assigned
    assert qg[yu, xc - 4] >= 0
    assert loc[yu, xc - 4] >= 0
    # and so is the side-shift cell itself (same_type + leads_to hold)
    assert qg[yu, xc - 3] >= 0


def test_blocks_all_lanes_band_predicate():
    """`_blocks_all_lanes_planes` == a literal transcription of the
    reference predicate (`intersection_light_group.py:185-202`) on a
    crafted band layout with a multi-lane vertical band, a single-lane
    vertical road, and both kinds of horizontal bands — including an
    OPTIMIZED-intersection partial crossing (inter covers only part of
    the band width), which must NOT block."""
    import numpy as np
    import jax.numpy as jnp
    from trafficsimulation_tpu.gen.bands import Bands
    from trafficsimulation_tpu.gen.lights import _blocks_all_lanes_planes

    H = W = 16

    def mk(intervals, n):
        starts = [a for a, b in intervals] + [0] * (4 - len(intervals))
        ends = [b for a, b in intervals] + [0] * (4 - len(intervals))
        valid = [True] * len(intervals) + [False] * (4 - len(intervals))
        return Bands(start=jnp.array(starts, jnp.int32),
                     end=jnp.array(ends, jnp.int32),
                     rclass=jnp.zeros(4, jnp.int32),
                     dir=jnp.zeros(4, jnp.int32),
                     valid=jnp.array(valid))

    vbands = mk([(3, 5), (10, 10)], W)     # multi-lane x3-5, single x10
    hbands = mk([(7, 8), (12, 12)], H)     # multi-lane y7-8, single y12
    rng = np.random.default_rng(1)
    inter = rng.random((H, W)) < 0.35      # arbitrary intersection mask

    bv, bh = _blocks_all_lanes_planes(jnp.asarray(inter), hbands, vbands)
    bv, bh = np.asarray(bv), np.asarray(bh)

    def band_or_single(i, ivals):
        for a, b in ivals:
            if a <= i <= b:
                return a, b
        return i, i

    for y in range(H):
        for x in range(W):
            vx0, vx1 = band_or_single(x, [(3, 5), (10, 10)])
            hy0, hy1 = band_or_single(y, [(7, 8), (12, 12)])
            # vertical (N/S) walk — reference lines 190-196
            if vx1 != vx0:
                exp_v = all(inter[y, xx] for xx in range(vx0, vx1 + 1))
            else:
                exp_v = inter[y, vx0] and (hy1 != hy0 or inter[hy0, x])
            # horizontal walk — reference lines 198-202
            if hy1 != hy0:
                exp_h = all(inter[yy, x] for yy in range(hy0, hy1 + 1))
            else:
                exp_h = inter[hy0, x] and (vx1 != vx0 or inter[y, vx0])
            assert bv[y, x] == exp_v, ("v", y, x)
            assert bh[y, x] == exp_h, ("h", y, x)


def test_entrance_is_sorted_run_midpoint(small_cfg, small_city):
    """Stage-8 exactness (`city_model.py:884-963`): every placed
    entrance is the middle cell of the (x, y)-sorted longest
    road-touching perimeter run of its block — checked by an independent
    numpy oracle over the generated world.  Blocks whose longest run is
    tied are skipped (the tie is broken randomly, like the reference's
    `random.choice`) — the chosen run must still be one of the tied."""
    import numpy as np
    from trafficsimulation_tpu import codes as C

    grid, ls, gs, bs, dests, field = small_city
    cell = np.asarray(grid.cell_type)
    orig = np.asarray(grid.orig_type)
    bid = np.asarray(grid.block_id)
    H, W = cell.shape
    ent = np.asarray(bs.entrance)
    bvalid = np.asarray(bs.valid)

    # entrance cells were SIDEWALK before placement; recover the
    # candidate predicate from the pre-light planes (orig_type keeps the
    # pre-controlled-road raster; entrances/lights overwrote cells, so
    # treat them as their pre-placement type)
    road_codes = {C.R1, C.R2, C.R3, C.INTERSECTION, C.HIGHWAY_ENTRANCE,
                  C.CONTROLLED_ROAD}

    def is_roadlike(y, x):
        t = orig[y, x]
        return t in road_codes or cell[y, x] in road_codes

    checked = 0
    for b in range(len(ent)):
        if not bvalid[b] or ent[b] < 0:
            continue
        ey, ex = divmod(int(ent[b]), W)
        # ring of block b: non-block cells 4-adjacent to it that were
        # sidewalk-class and touch a road
        ring = set()
        for y in range(H):
            for x in range(W):
                if bid[y, x] != b:
                    continue
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if not (0 <= ny < H and 0 <= nx < W):
                        continue
                    if bid[ny, nx] == b:
                        continue
                    t = cell[ny, nx]
                    if t == C.SIDEWALK or (ny, nx) == (ey, ex):
                        touches = any(
                            0 <= ny + ddy < H and 0 <= nx + ddx < W
                            and is_roadlike(ny + ddy, nx + ddx)
                            for ddy, ddx in ((1, 0), (-1, 0), (0, 1),
                                             (0, -1)))
                        if touches:
                            ring.add((nx, ny))
        if not ring:
            continue
        # decompose into 4-connected runs
        todo = set(ring)
        runs = []
        while todo:
            start = todo.pop()
            stack, run = [start], [start]
            while stack:
                x, y = stack.pop()
                for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1),
                               (x, y - 1)):
                    if (nx, ny) in todo:
                        todo.remove((nx, ny))
                        stack.append((nx, ny))
                        run.append((nx, ny))
            runs.append(run)
        mx = max(len(r) for r in runs)
        longest = [r for r in runs if len(r) == mx]
        mids = {sorted(r)[len(r) // 2] for r in longest}
        assert (ex, ey) in mids, (b, (ex, ey), mids)
        checked += 1
    assert checked >= 3, f"oracle only checked {checked} blocks"


def test_every_candidate_block_gets_an_entrance(gen_fn):
    """Stage-8 completeness (`city_model.py:884-963`): a zoned block
    whose perimeter has at least one road-touching sidewalk cell MUST
    get an entrance — the reference only skips land-locked blocks.
    Regression: the random tie-break hashed run roots to 31 bits, which
    could exceed the 2^30 seg-min sentinel and silently drop the block's
    entrance (~20% of blocks at 256x256).  Checked over several seeds
    (the failure was hash/seed dependent)."""
    for seed in range(4):
        grid, ls, gs, bs, dests, field = gen_fn(jax.random.PRNGKey(seed))
        cell = _np(grid.cell_type)
        bid = _np(grid.block_id)
        ent = _np(bs.entrance)
        bvalid = _np(bs.valid)
        H, W = cell.shape
        road_codes = [C.R1, C.R2, C.R3, C.INTERSECTION,
                      C.HIGHWAY_ENTRANCE, C.CONTROLLED_ROAD]
        touchy = np.isin(cell, road_codes)
        touches = np.zeros_like(touchy)
        touches[1:, :] |= touchy[:-1, :]
        touches[:-1, :] |= touchy[1:, :]
        touches[:, 1:] |= touchy[:, :-1]
        touches[:, :-1] |= touchy[:, 1:]
        # entrance cells were sidewalk candidates before placement
        sidewalkish = (cell == C.SIDEWALK) | (cell == C.BLOCK_ENTRANCE)
        cand = sidewalkish & touches & (bid < 0)
        near_block = np.full((H, W), -1, np.int64)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sh = np.full((H, W), -1, np.int64)
            if dy == 1:
                sh[:-1] = bid[1:]
            elif dy == -1:
                sh[1:] = bid[:-1]
            elif dx == 1:
                sh[:, :-1] = bid[:, 1:]
            else:
                sh[:, 1:] = bid[:, :-1]
            near_block = np.maximum(near_block, sh)
        missing = []
        for b in np.nonzero(bvalid)[0]:
            if ent[b] >= 0:
                continue
            if (cand & (near_block == b)).any():
                missing.append(int(b))
        assert not missing, f"seed {seed}: candidate blocks w/o entrance {missing}"
