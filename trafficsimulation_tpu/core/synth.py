"""Synthetic hand-built worlds: a full `World` without the generation
pipeline.

Two uses:
  * unit tests that need exact control of the geometry (the plane-engine
    scenarios in tests/test_engine.py), and
  * the multi-chip dry run (`__graft_entry__.dryrun_multichip`), where
    compiling the 14-stage generation pipeline on the virtual CPU mesh
    would dominate the driver's time budget for zero sharding signal —
    the sharded object is the *training step*, not the generator.

`crossroad_world` builds the smallest COMPLETE city: two 2-lane roads
crossing at a 4-cell intersection with one light group (4 lights, queue
runs, clearance bucket), two serviced city blocks with routable
entrances, four highway ends, and a pre-generated demand table — every
subsystem of `step_world` (lights, movement, arrivals, spawning, blocks,
rain, RL training) runs real work on it.  (Reference counterpart: the
smallest useful `CityModel`; structure per `city_model.py:125-148`.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from .state import (World, Grid, LightStatic, GroupStatic, BlockStatic,
                    DestStatic, Demand, Overrides)


def empty_statics(cfg: Config):
    """Zero-filled static tables at the cfg capacities (no lights, no
    groups, no blocks)."""
    caps = cfg.capacities()
    L, A = caps.max_lights, caps.max_lights * 8
    G, Q = caps.max_groups, caps.max_queue_cells
    B, E = caps.max_blocks, caps.max_entrances_hw
    D = caps.max_dests
    ls = LightStatic(
        valid=jnp.zeros((L,), bool), pos=jnp.zeros((L,), jnp.int32),
        group=jnp.full((L,), -1, jnp.int32),
        axis=jnp.full((L,), -1, jnp.int32),
        assign_road=jnp.full((A,), -1, jnp.int32),
        assign_light=jnp.full((A,), -1, jnp.int32),
        assign_valid=jnp.zeros((A,), bool),
        srun_lo=jnp.zeros((A,), jnp.int32),
        srun_hi=jnp.zeros((A,), jnp.int32),
        srun_light=jnp.full((A,), -1, jnp.int32),
        sextra_cell=jnp.full((A,), -1, jnp.int32),
        sextra_light=jnp.full((A,), -1, jnp.int32))
    gs = GroupStatic(
        valid=jnp.zeros((G,), bool),
        neighbor=jnp.full((G, 4), -1, jnp.int32),
        intermediates=jnp.full((G, 8), -1, jnp.int32),
        bbox=jnp.zeros((G, 4), jnp.int32),
        intersection_size=jnp.zeros((G,)), penalty_score=jnp.zeros((G,)),
        queue_cells=jnp.zeros((Q,), jnp.int32),
        queue_qgroup=jnp.full((Q,), -1, jnp.int32),
        queue_qbucket=jnp.zeros((Q,), jnp.int32),
        run_lo=jnp.zeros((Q,), jnp.int32),
        run_hi=jnp.zeros((Q,), jnp.int32),
        run_seg=jnp.full((Q,), -1, jnp.int32))
    bs = BlockStatic(
        valid=jnp.zeros((B,), bool), btype=jnp.zeros((B,), jnp.uint8),
        inner_count=jnp.zeros((B,), jnp.int32),
        entrance=jnp.full((B,), -1, jnp.int32),
        dest=jnp.full((B,), -1, jnp.int32),
        service_dest=jnp.full((B,), -1, jnp.int32),
        food_cap=jnp.zeros((B,)), waste_cap=jnp.zeros((B,)),
        needs_food=jnp.zeros((B,), bool),
        produces_waste=jnp.zeros((B,), bool))
    dests = DestStatic(
        valid=jnp.zeros((D,), bool), pos=jnp.zeros((D,), jnp.int32),
        kind=jnp.zeros((D,), jnp.uint8),
        block=jnp.full((D,), -1, jnp.int32),
        hw_pos=jnp.full((E,), -1, jnp.int32),
        hw_valid=jnp.zeros((E,), bool))
    return ls, gs, bs, dests


def assemble_world(cfg: Config, grid: Grid, ls, gs, bs, dests, demand,
                   key, rl=None) -> World:
    """Wrap static tables + grid into a runnable `World` (dynamic state
    zeroed, cost fields computed from the grid)."""
    from ..ops import engine, routing
    from ..agents.rain import init_rain_state
    from ..agents.blocks import init_blocks_state
    from ..agents.pedestrians import init_pedestrians
    from ..lights import fsm
    from ..sim import init_vehicles, init_metrics, _nearest_exit_table

    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    D = dests.valid.shape[0]
    DF = min(D, cfg.MAX_FIELD_DESTS or D)
    field = routing.compute_cost_fields(
        cfg, grid.allowed_dirs, grid.road_class, dests.pos[:DF],
        dests.valid[:DF], is_road=grid.is_road)
    return World(
        grid=grid, lights_static=ls, groups_static=gs, blocks_static=bs,
        dests=dests,
        cost_field=engine.field_to_keys(cfg, field,
                                        grid.road_class),
        nearest_exit=_nearest_exit_table(cfg, dests, DF),
        veh_map=jnp.full((H, W), -1, jnp.int32),
        stop_map=jnp.zeros((H, W), bool),
        rain_map=jnp.zeros((H, W), bool),
        stuck_map=jnp.zeros((H, W), jnp.int32),
        density=jnp.zeros((H, W), jnp.float32),
        vehicles=init_vehicles(caps.max_vehicles),
        lights=fsm.init_lights_state(cfg, gs.valid.shape[0],
                                     ls.valid.shape[0], gs.valid),
        blocks=init_blocks_state(bs),
        rain=init_rain_state(cfg),
        demand=demand, metrics=init_metrics(),
        overrides=Overrides(
            light_force=jnp.full((ls.valid.shape[0],), -1, jnp.int8),
            spawn_rain=jnp.bool_(False)),
        peds=init_pedestrians(H, W, cfg.PEDESTRIANS_ENABLED),
        ped_map=jnp.zeros((H, W), jnp.int32),
        tick=jnp.int32(0), elapsed=jnp.float32(0.0),
        key=key, rl=rl)


def crossroad_world(cfg: Config, key=None, n_trips: int = 48) -> World:
    """See module docstring.  Requires HEIGHT, WIDTH >= 24."""
    H, W = cfg.HEIGHT, cfg.WIDTH
    assert H >= 24 and W >= 24, "crossroad_world needs >= 24x24"
    if key is None:
        key = jax.random.PRNGKey(0)
    ym, xm = H // 2 - 1, W // 2 - 1
    R = min(cfg.TRAFFIC_LIGHT_RANGE, ym - 3, xm - 3)

    cell = np.full((H, W), C.SIDEWALK, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    rc = np.zeros((H, W), np.uint8)
    NB, EB, SB, WB = C.DIR_BITS  # N=+y

    # two-lane horizontal road: row ym eastbound, ym+1 westbound
    cell[ym, 1:W - 1] = C.R2; dirs[ym, 1:W - 1] = EB; rc[ym, 1:W - 1] = 2
    cell[ym + 1, 1:W - 1] = C.R2; dirs[ym + 1, 1:W - 1] = WB
    rc[ym + 1, 1:W - 1] = 2
    # two-lane vertical road: col xm northbound (+y), xm+1 southbound
    cell[1:H - 1, xm] = C.R2; dirs[1:H - 1, xm] = NB; rc[1:H - 1, xm] = 2
    cell[1:H - 1, xm + 1] = C.R2; dirs[1:H - 1, xm + 1] = SB
    rc[1:H - 1, xm + 1] = 2

    # 4-cell intersection: union of through dirs (turns happen there)
    for (y, x, d) in ((ym, xm, EB | NB), (ym, xm + 1, EB | SB),
                      (ym + 1, xm, WB | NB), (ym + 1, xm + 1, WB | SB)):
        cell[y, x] = C.INTERSECTION
        dirs[y, x] = d
        rc[y, x] = 1  # road_type_map parity: intersections are class 1

    # approach cells become ControlledRoad (`city_model.py:1422-1499`)
    approaches = [
        # (controlled cell, run cells, axis)
        ((ym, xm - 1), [(ym, x) for x in range(xm - R, xm)], 1),
        ((ym + 1, xm + 2), [(ym + 1, x)
                            for x in range(xm + 2, xm + 2 + R)], 1),
        ((ym - 1, xm), [(y, xm) for y in range(ym - R, ym)], 0),
        ((ym + 2, xm + 1), [(y, xm + 1)
                            for y in range(ym + 2, ym + 2 + R)], 0),
    ]
    orig = cell.copy()
    for (cy, cx), _, _ in approaches:
        cell[cy, cx] = C.CONTROLLED_ROAD

    # lights at the 4 diagonal corner sidewalks
    light_pos = [(ym - 1, xm - 1), (ym + 2, xm + 2),
                 (ym - 1, xm + 2), (ym + 2, xm - 1)]
    light_axis = [1, 1, 0, 0]
    for (ly, lx) in light_pos:
        cell[ly, lx] = C.TRAFFIC_LIGHT

    # blocks + entrances (routable dests; road gains an arrow INTO the
    # entrance, the entrance points back out — `city_model.py:1035-1070`)
    xe0, xe1 = max(3, xm - R - 2), min(W - 4, xm + R + 3)
    ent0 = (ym - 1, xe0)   # south of the eastbound lane (y-1 = S nbr)
    ent1 = (ym + 2, xe1)   # north of the westbound lane
    cell[ent0] = C.BLOCK_ENTRANCE; dirs[ent0] = NB
    dirs[ym, xe0] |= SB
    cell[ent1] = C.BLOCK_ENTRANCE; dirs[ent1] = SB
    dirs[ym + 1, xe1] |= NB

    # highway ends
    hw_in = [(ym, 1), (ym + 1, W - 2), (1, xm), (H - 2, xm + 1)]
    hw_out = [(ym, W - 2), (ym + 1, 1), (H - 2, xm), (1, xm + 1)]
    for (y, x) in hw_in:
        cell[y, x] = C.HIGHWAY_ENTRANCE
    for (y, x) in hw_out:
        cell[y, x] = C.HIGHWAY_EXIT

    flat = lambda yx: yx[0] * W + yx[1]

    # --- static tables at cfg capacities ---------------------------------
    ls, gs, bs, dests = empty_statics(cfg)
    caps = cfg.capacities()

    light_id_plane = np.full((H, W), -1, np.int32)
    for i, (ly, lx) in enumerate(light_pos):
        light_id_plane[ly, lx] = i
    ls = ls.replace(
        valid=ls.valid.at[:4].set(True),
        pos=ls.pos.at[:4].set(jnp.asarray([flat(p) for p in light_pos])),
        group=ls.group.at[:4].set(0),
        axis=ls.axis.at[:4].set(jnp.asarray(light_axis)))
    # assignment pairs: light i controls its approach run
    ar, al = [], []
    for i, ((cy, cx), run, _ax) in enumerate(approaches):
        ar.append(flat((cy, cx))); al.append(i)
        for c in run:
            ar.append(flat(c)); al.append(i)
    A = len(ar)
    ls = ls.replace(
        assign_road=ls.assign_road.at[:A].set(jnp.asarray(ar)),
        assign_light=ls.assign_light.at[:A].set(jnp.asarray(al)),
        assign_valid=ls.assign_valid.at[:A].set(True))
    # stop runs (fsm.build_stop_map): one lane run + one own-cell run per
    # light, in diff-buffer index space (gen/lights.run_decompose layout)
    OFFV = H * (W + 1)
    sruns = [
        (ym * (W + 1) + (xm - R), ym * (W + 1) + xm, 0),
        ((ym + 1) * (W + 1) + (xm + 2), (ym + 1) * (W + 1) + xm + 2 + R, 1),
        (OFFV + (ym - R) * W + xm, OFFV + ym * W + xm, 2),
        (OFFV + (ym + 2) * W + (xm + 1),
         OFFV + (ym + 2 + R) * W + (xm + 1), 3),
    ] + [(ly * (W + 1) + lx, ly * (W + 1) + lx + 1, i)
         for i, (ly, lx) in enumerate(light_pos)]
    nS = len(sruns)
    ls = ls.replace(
        srun_lo=ls.srun_lo.at[:nS].set(jnp.asarray([r[0] for r in sruns])),
        srun_hi=ls.srun_hi.at[:nS].set(jnp.asarray([r[1] for r in sruns])),
        srun_light=ls.srun_light.at[:nS].set(
            jnp.asarray([r[2] for r in sruns])))

    # queue runs (prefix-buffer indexing per gen/lights.py: H-run at row
    # y over [x0, x1] -> Ph[y*(W+1)+x0 .. +x1+1]; V-run at col x over
    # [y0, y1] -> OFF_V + y0*W+x .. (y1+1)*W+x)
    OFF_V = H * (W + 1)
    NS_IN, NS_OUT, EW_IN, EW_OUT, CLEAR = 0, 1, 2, 3, 4

    def hrun(y, x0, x1, bucket):
        return (y * (W + 1) + x0, y * (W + 1) + x1 + 1, bucket)

    def vrun(x, y0, y1, bucket):
        return (OFF_V + y0 * W + x, OFF_V + (y1 + 1) * W + x, bucket)

    runs = [
        hrun(ym, xm - R, xm - 1, EW_IN),
        hrun(ym + 1, xm + 2, xm + 1 + R, EW_IN),
        vrun(xm, ym - R, ym - 1, NS_IN),
        vrun(xm + 1, ym + 2, ym + 1 + R, NS_IN),
        hrun(ym, xm + 2, xm + 1 + R, EW_OUT),
        hrun(ym + 1, xm - R, xm - 1, EW_OUT),
        vrun(xm, ym + 2, ym + 1 + R, NS_OUT),
        vrun(xm + 1, ym - R, ym - 1, NS_OUT),
        vrun(xm, ym, ym + 1, CLEAR),
        vrun(xm + 1, ym, ym + 1, CLEAR),
    ]
    lo = jnp.asarray([r[0] for r in runs])
    hi = jnp.asarray([r[1] for r in runs])
    seg = jnp.asarray([0 * 5 + r[2] for r in runs])
    nR = len(runs)
    gs = gs.replace(
        valid=gs.valid.at[0].set(True),
        bbox=gs.bbox.at[0].set(jnp.asarray([xm, xm + 1, ym, ym + 1])),
        intersection_size=gs.intersection_size.at[0].set(4 / 16),
        run_lo=gs.run_lo.at[:nR].set(lo),
        run_hi=gs.run_hi.at[:nR].set(hi),
        run_seg=gs.run_seg.at[:nR].set(seg))

    # queue label planes (per-cell path parity with the run tables)
    qg = np.full((H, W), -1, np.int32)
    qb = np.full((H, W), -1, np.int8)
    for _, run, ax in approaches:
        for (y, x) in run:
            qg[y, x] = 0; qb[y, x] = NS_IN if ax == 0 else EW_IN
    for (y, x) in ((ym, xm), (ym, xm + 1), (ym + 1, xm), (ym + 1, xm + 1)):
        qg[y, x] = 0; qb[y, x] = CLEAR

    # --- blocks / dests ---------------------------------------------------
    d_ent0, d_ent1 = 0, 1
    exit_ids = list(range(2, 2 + len(hw_out)))
    bs = bs.replace(
        valid=bs.valid.at[:2].set(True),
        btype=bs.btype.at[:2].set(jnp.asarray(
            [C.RESIDENTIAL, C.MARKET], dtype=jnp.uint8)),
        inner_count=bs.inner_count.at[:2].set(4),
        entrance=bs.entrance.at[:2].set(
            jnp.asarray([flat(ent0), flat(ent1)])),
        dest=bs.dest.at[:2].set(jnp.asarray([d_ent0, d_ent1])),
        food_cap=bs.food_cap.at[:2].set(4 * cfg.FOOD_CAPACITY_PER_CELL),
        waste_cap=bs.waste_cap.at[:2].set(4 * cfg.WASTE_CAPACITY_PER_CELL),
        needs_food=bs.needs_food.at[:2].set(True),
        produces_waste=bs.produces_waste.at[:2].set(True))
    dpos = [flat(ent0), flat(ent1)] + [flat(p) for p in hw_out]
    dkind = [0, 0] + [1] * len(hw_out)
    dblock = [0, 1] + [-1] * len(hw_out)
    nD = len(dpos)
    dests = dests.replace(
        valid=dests.valid.at[:nD].set(True),
        pos=dests.pos.at[:nD].set(jnp.asarray(dpos)),
        kind=dests.kind.at[:nD].set(jnp.asarray(dkind, dtype=jnp.uint8)),
        block=dests.block.at[:nD].set(jnp.asarray(dblock)),
        hw_pos=dests.hw_pos.at[:len(hw_in)].set(
            jnp.asarray([flat(p) for p in hw_in])),
        hw_valid=dests.hw_valid.at[:len(hw_in)].set(True))

    dest_plane = np.full((H, W), -1, np.int32)
    for i, p in enumerate(dpos):
        dest_plane[p // W, p % W] = i

    grid = Grid(
        cell_type=jnp.asarray(cell), orig_type=jnp.asarray(orig),
        allowed_dirs=jnp.asarray(dirs), road_class=jnp.asarray(rc),
        is_road=jnp.asarray(np.isin(cell, C.ROAD_LIKE)),
        intersection=jnp.asarray(cell == C.INTERSECTION),
        group_id=jnp.asarray(np.where(cell == C.INTERSECTION, 0, -1)
                             .astype(np.int32)),
        block_id=jnp.full((H, W), -1, jnp.int32),
        light_id=jnp.asarray(light_id_plane),
        dest_id=jnp.asarray(dest_plane),
        queue_group=jnp.asarray(qg), queue_bucket=jnp.asarray(qb))

    # --- demand: interleaved internal (block->block) and through trips ----
    T = caps.max_trips
    n_trips = min(n_trips, T)
    rng = np.random.default_rng(7)
    origin = np.zeros((T,), np.int32)
    ddest = np.zeros((T,), np.int32)
    kind = np.zeros((T,), np.uint8)
    valid = np.zeros((T,), bool)
    depart = np.full((T,), 2 ** 20 - 1, np.int32)
    # reachability per origin given the lane/turn graph above
    reach = {flat(hw_in[0]): [d_ent0, exit_ids[0], exit_ids[1]],
             flat(hw_in[1]): [d_ent1, exit_ids[0], exit_ids[1]],
             flat(hw_in[2]): [exit_ids[2], exit_ids[1], exit_ids[0]],
             flat(hw_in[3]): [exit_ids[3], exit_ids[0], exit_ids[1]],
             flat(ent0): [exit_ids[0], exit_ids[1], d_ent1],
             flat(ent1): [exit_ids[1], exit_ids[0]]}
    origins = list(reach.keys())
    for i in range(n_trips):
        o = origins[rng.integers(len(origins))]
        origin[i] = o
        ddest[i] = reach[o][rng.integers(len(reach[o]))]
        kind[i] = 0 if o in (flat(ent0), flat(ent1)) else 1
        valid[i] = True
        depart[i] = 1 + i // 2
    demand = Demand(
        depart_tick=jnp.asarray(depart), origin=jnp.asarray(origin),
        dest=jnp.asarray(ddest), kind=jnp.asarray(kind),
        valid=jnp.asarray(valid), cursor=jnp.int32(0), day=jnp.int32(0))

    rl = None
    from ..lights import fsm as fsm_mod
    if cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM in fsm_mod.RL_ALGOS:
        from ..rl.controllers import init_rl_state
        rl = init_rl_state(cfg, caps.max_groups, key)
    return assemble_world(cfg, grid, ls, gs, bs, dests, demand, key, rl=rl)
