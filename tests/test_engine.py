"""Plane-CA engine semantics on synthetic worlds: contraflow overtake
with merge-back (`vehicle_base.py:219-277, 309-366`) and chain-level
movement behavior that the grid-world fixtures can't isolate."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.core.state import (World, LightStatic,
                                              GroupStatic, BlockStatic,
                                              DestStatic, Grid, Overrides,
                                              Demand)
from trafficsimulation_tpu.agents.rain import init_rain_state
from trafficsimulation_tpu.agents.blocks import init_blocks_state
from trafficsimulation_tpu.agents.pedestrians import init_pedestrians
from trafficsimulation_tpu.lights import fsm
from trafficsimulation_tpu.ops import engine, routing
from trafficsimulation_tpu.sim import init_vehicles, init_metrics, \
    step_world


def make_world(cfg: Config, cell, dirs, road_class, dest_cells):
    """Minimal synthetic World around hand-built planes.  `dest_cells`:
    list of flat destination cell indices (kind 0)."""
    H, W = cell.shape
    HW = H * W
    caps = cfg.capacities()
    cell = jnp.asarray(cell)
    dirs = jnp.asarray(dirs)
    road_class = jnp.asarray(road_class)
    is_road = jnp.isin(cell, jnp.array(C.ROAD_LIKE, dtype=jnp.uint8))

    D = caps.max_dests
    dest_pos = jnp.full((D,), -1, jnp.int32).at[
        jnp.arange(len(dest_cells))].set(jnp.asarray(dest_cells))
    dest_valid = dest_pos >= 0
    dest_plane = jnp.full((HW,), -1, jnp.int32).at[
        jnp.where(dest_valid, dest_pos, HW - 1)].set(
        jnp.where(dest_valid, jnp.arange(D), -1)).reshape(H, W)

    grid = Grid(
        cell_type=cell, orig_type=cell, allowed_dirs=dirs,
        road_class=road_class, is_road=is_road,
        intersection=cell == C.INTERSECTION,
        group_id=jnp.full((H, W), -1, jnp.int32),
        block_id=jnp.full((H, W), -1, jnp.int32),
        light_id=jnp.full((H, W), -1, jnp.int32),
        dest_id=dest_plane,
        queue_group=jnp.full((H, W), -1, jnp.int32),
        queue_bucket=jnp.full((H, W), -1, jnp.int8))

    from trafficsimulation_tpu.core.synth import empty_statics
    L = caps.max_lights
    G = caps.max_groups
    ls, gs, bs, dests = empty_statics(cfg)
    dests = dests.replace(valid=dest_valid,
                          pos=jnp.clip(dest_pos, 0, HW - 1))

    DF = min(D, cfg.MAX_FIELD_DESTS or D)
    field = routing.compute_cost_fields(cfg, dirs, road_class,
                                        dest_pos[:DF], dest_valid[:DF],
                                        is_road=is_road)
    T = 8
    demand = Demand(depart_tick=jnp.full((T,), 2**20, jnp.int32),
                    origin=jnp.zeros((T,), jnp.int32),
                    dest=jnp.zeros((T,), jnp.int32),
                    kind=jnp.zeros((T,), jnp.uint8),
                    valid=jnp.zeros((T,), bool),
                    cursor=jnp.int32(0), day=jnp.int32(0))
    return World(
        grid=grid, lights_static=ls, groups_static=gs, blocks_static=bs,
        dests=dests,
        cost_field=engine.field_to_keys(cfg, field, road_class),
        nearest_exit=jnp.zeros((D,), jnp.int32),
        veh_map=jnp.full((H, W), -1, jnp.int32),
        stop_map=jnp.zeros((H, W), bool),
        rain_map=jnp.zeros((H, W), bool),
        stuck_map=jnp.zeros((H, W), jnp.int32),
        density=jnp.zeros((H, W), jnp.float32),
        vehicles=init_vehicles(caps.max_vehicles),
        lights=fsm.init_lights_state(cfg, G, L, gs.valid),
        blocks=init_blocks_state(bs),
        rain=init_rain_state(cfg),
        demand=demand, metrics=init_metrics(),
        overrides=Overrides(light_force=jnp.full((L,), -1, jnp.int8),
                            spawn_rain=jnp.bool_(False)),
        peds=init_pedestrians(H, W, False),
        ped_map=jnp.zeros((H, W), jnp.int32),
        tick=jnp.int32(0), elapsed=jnp.float32(0.0),
        key=jax.random.PRNGKey(0))


def put_vehicle(world, slot, flat, dest, heading=1, parked=False):
    v = world.vehicles
    i = jnp.asarray([slot])
    v = v.replace(active=v.active.at[i].set(True),
                  pos=v.pos.at[i].set(flat),
                  heading=v.heading.at[i].set(heading),
                  dest=v.dest.at[i].set(dest),
                  base_speed=v.base_speed.at[i].set(0),
                  parked=v.parked.at[i].set(parked))
    vm = world.veh_map.reshape(-1).at[flat].set(slot)
    return world.replace(vehicles=v,
                         veh_map=vm.reshape(world.veh_map.shape))


H, W = 8, 32
CFG = Config(WIDTH=W, HEIGHT=H, RAIN_ENABLED=False,
             VEHICLE_MALFUNCTION_ACTIVE=False,
             VEHICLE_SIDESWIPE_COLLISION_ACTIVE=False,
             ENABLE_TRAFFIC=True, PEDESTRIANS_ENABLED=False,
             VEHICLE_MIN_SPEED=1, VEHICLE_MAX_SPEED=1,
             MAX_VEHICLES=8, MAX_FIELD_DESTS=4)


def two_lane_road():
    """Row 4 eastbound + row 5 westbound (RHT opposite lane); dest at
    (30, 4)."""
    cell = np.full((H, W), C.WALL, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    cell[4, 1:31] = C.R2
    cell[5, 1:31] = C.R2
    dirs[4, 1:30] = C.DIR_BITS[C.E_IDX]
    dirs[5, 2:31] = C.DIR_BITS[C.W_IDX]
    cell[4, 30] = C.BLOCK_ENTRANCE
    rc = np.where(np.isin(cell, [C.R2]), 2,
                  np.where(cell == C.BLOCK_ENTRANCE, 1, 0)).astype(np.uint8)
    return cell, dirs, rc, 4 * W + 30


def test_contraflow_overtake_merges_back():
    """A stranded (parked) blocker on the east lane: the trailing vehicle
    takes the opposite lane around it and re-enters its own lane within
    VEHICLE_CONTRAFLOW_OVERTAKE_DURATION ticks (the reference's phase-0
    merge-back + phase-3 overtake splice, `vehicle_base.py:219-277,
    309-366`; here the merge-back is the field descent re-entering the
    legal lane at the first free cell — contraflow cells carry
    VEHICLE_CONTRAFLOW_PENALTY)."""
    cell, dirs, rc, dest_cell = two_lane_road()
    world = make_world(CFG, cell, dirs, rc, [dest_cell])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)  # blocker
    world = put_vehicle(world, 1, 4 * W + 7, dest=0)

    step = jax.jit(functools.partial(step_world, CFG))
    traj = []
    for _ in range(CFG.VEHICLE_CONTRAFLOW_OVERTAKE_DURATION):
        world = step(world)
        traj.append(int(world.vehicles.pos[1]))

    rows = [p // W for p in traj]
    cols = [p % W for p in traj]
    assert 5 in rows, f"never used the opposite lane: rows={rows}"
    passed = [c for r, c in zip(rows, cols) if r == 4 and c > 10]
    assert passed, f"never re-entered its lane past the blocker: {traj}"
    # blocker unmoved, overtaker kept making progress toward the dest
    assert int(world.vehicles.pos[0]) == 4 * W + 10
    assert max(cols) > 10


def test_no_overtake_when_disabled():
    """With the overtake ladder off, the trailing vehicle stays in lane
    behind the stranded blocker (reference strict phase-1 hard-obstacle
    behavior)."""
    cfg = CFG.replace(VEHICLE_CONTRAFLOW_OVERTAKE_ACTIVE=False,
                      VEHICLE_STUCK_CONTRAFLOW_ENABLED=False)
    cell, dirs, rc, dest_cell = two_lane_road()
    world = make_world(cfg, cell, dirs, rc, [dest_cell])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)
    world = put_vehicle(world, 1, 4 * W + 7, dest=0)

    step = jax.jit(functools.partial(step_world, cfg))
    for _ in range(20):
        world = step(world)
    pos = int(world.vehicles.pos[1])
    assert pos // W == 4 and pos % W <= 9, \
        f"moved past the blocker without overtaking: {pos}"


def test_overtake_ignores_unrelated_blocker():
    """Direction-indexed wavefronts (PARITY known-gap #2 refinement): a
    stranded vehicle on the OPPOSING lane, slightly behind the
    overtaker, must not attract the excursion — the reference's phase-3
    splice targets the first free cell on the vehicle's OWN path past
    ITS blocker (`vehicle_base.py:309-366`), never another street's.
    With the former single shared wavefront plane the nearest merge cell
    here was the westbound blocker's (3 steps WEST); the packed
    per-direction plane keys the descent to the vehicle's blocked
    eastbound move."""
    cell, dirs, rc, dest_cell = two_lane_road()
    world = make_world(CFG, cell, dirs, rc, [dest_cell])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)  # own
    world = put_vehicle(world, 2, 5 * W + 6, dest=0, parked=True,
                        heading=3)                 # opposing-lane blocker
    world = put_vehicle(world, 1, 4 * W + 7, dest=0)

    step = jax.jit(functools.partial(step_world, CFG))
    traj = []
    for _ in range(CFG.VEHICLE_CONTRAFLOW_OVERTAKE_DURATION):
        world = step(world)
        traj.append(int(world.vehicles.pos[1]))
    cols = [p % W for p in traj]
    assert min(cols) >= 7, \
        f"excursion went backward toward the unrelated merge cell: {traj}"
    passed = [c for p, c in zip(traj, cols) if p // W == 4 and c > 10]
    assert passed, f"never passed its own blocker: {traj}"


def test_overtake_merges_before_route_split():
    """Bound for the remaining shared-within-direction approximation: a
    second vehicle whose route TURNS just past the blocker still merges
    at the first free cell past it and completes its turn — both the
    reference splice and the direction-keyed wavefront pick the same
    merge cell here, so the trip overhead vs the unblocked optimum stays
    within the excursion bound (VERDICT r2 missing #6)."""
    cell, dirs, rc, dest_cell = two_lane_road()
    # branch just past the blocker: col 12 toward row 1 (S = y-1 in this
    # engine's shift convention), rows 1-4
    cell[1:4, 12] = C.R3
    dirs[2:5, 12] |= C.DIR_BITS[C.S_IDX]
    cell[1, 12] = C.BLOCK_ENTRANCE
    rc[1:4, 12] = np.where(cell[1:4, 12] == C.BLOCK_ENTRANCE, 1, 3)
    world = make_world(CFG, cell, dirs, rc, [dest_cell, 1 * W + 12])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)
    world = put_vehicle(world, 1, 4 * W + 7, dest=1)   # turns at col 12

    step = jax.jit(functools.partial(step_world, CFG))
    done_at = None
    for t in range(3 * CFG.VEHICLE_CONTRAFLOW_OVERTAKE_DURATION):
        world = step(world)
        if not bool(world.vehicles.active[1]):
            done_at = t + 1
            break
    assert done_at is not None, "turning vehicle never arrived"
    # unblocked optimum is 8 moves at speed<=1 plus spawn/speed warmup;
    # allow the excursion bound on top
    optimum = 8
    slack = CFG.VEHICLE_MAX_CONTRAFLOW_OVERTAKE_STEPS + 6
    assert done_at <= optimum + slack, \
        f"turned trip took {done_at} ticks (> {optimum + slack})"
