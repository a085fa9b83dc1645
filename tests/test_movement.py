"""Single-vehicle movement semantics on a synthetic straight road —
bit-level checks of `_determine_max_steps` / `_execute_movement`
(`vehicle_base.py:719-753`) and conflict resolution, exercised on the
PRODUCTION plane engine (`ops/pallas_engine.decide_move_core` — the one
decide/move implementation; the former SoA path `ops/movement.py` was
removed per VERDICT r2 weak #5)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.ops import engine, pallas_engine
from trafficsimulation_tpu.ops.routing import _shift_plane
from trafficsimulation_tpu.sim import _enter_engine, step_world

from test_engine import make_world, put_vehicle

H, W = 8, 32
CFG = Config(WIDTH=W, HEIGHT=H, RAIN_ENABLED=False,
             VEHICLE_MALFUNCTION_ACTIVE=False,
             VEHICLE_SIDESWIPE_COLLISION_ACTIVE=False,
             VEHICLE_MIN_SPEED=3, VEHICLE_MAX_SPEED=3)  # deterministic speed


def straight_road_world():
    """One eastbound road on row 4, x in [1, 30]; dest at (30, 4)."""
    cell = np.full((H, W), C.WALL, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    cell[4, 1:31] = C.R2
    dirs[4, 1:30] = C.DIR_BITS[C.E_IDX]
    cell[4, 30] = C.BLOCK_ENTRANCE
    rc = np.where(cell == C.R2, 2, np.where(
        cell == C.BLOCK_ENTRANCE, 1, 0)).astype(np.uint8)
    return make_world(CFG, cell, dirs, rc, [4 * W + 30])


def engine_tick(world, stop_map=None):
    """One decide+move pass of the plane engine (XLA executor) with an
    explicit stop map; returns the SoA vehicle pool + veh_map."""
    es = _enter_engine(CFG, world)
    sdir4, wnd, _density = engine.routing_planes(CFG, world, es)
    stop = stop_map if stop_map is not None else jnp.zeros((H, W), bool)
    zb = jnp.zeros((H, W), bool)
    randoms = engine.tick_randoms(CFG, jax.random.PRNGKey(3), H, W)
    out = pallas_engine.decide_move_core(
        CFG, _shift_plane, lambda d: engine.select_dest_rows(sdir4, d),
        wnd, es.pa, es.pb, es.pc, es.pd, es.pe, es.pl,
        stop, zb, zb, world.grid.intersection, world.grid.dest_id,
        *randoms)
    planes = out[:6]
    V = CFG.capacities().max_vehicles
    v = engine.planes_to_vehicles(CFG, planes, V)
    vm, _ = engine.planes_to_maps(planes, V)
    return v, vm


def test_moves_at_speed():
    world = straight_road_world()
    world = put_vehicle(world, 0, 4 * W + 5, dest=0)
    v2, vm2 = engine_tick(world)
    # deterministic speed 3: moved exactly 3 cells east
    assert int(v2.pos[0]) == 4 * W + 8
    assert int(v2.steps_traveled[0]) == 3
    assert int(vm2[4, 8]) == 0 and int(vm2[4, 5]) == -1


def test_stops_before_stop_cell():
    world = straight_road_world()
    world = put_vehicle(world, 0, 4 * W + 5, dest=0)
    stop = jnp.zeros((H, W), bool).at[4, 7].set(True)  # red 2 ahead
    v2, _ = engine_tick(world, stop)
    # advances up to the cell before the red, never onto it
    assert int(v2.pos[0]) == 4 * W + 6


def test_held_on_stop_cell():
    world = straight_road_world()
    world = put_vehicle(world, 0, 4 * W + 7, dest=0)
    stop = jnp.zeros((H, W), bool).at[4, 7].set(True)  # standing on red
    v2, _ = engine_tick(world, stop)
    assert int(v2.pos[0]) == 4 * W + 7      # held
    assert int(v2.base_speed[0]) == 0       # red light: full stop state


def test_queues_behind_vehicle():
    world = straight_road_world()
    world = put_vehicle(world, 0, 4 * W + 5, dest=0)
    # blocker two ahead, parked (stranded -> hard obstacle; single-lane
    # road between walls, no contraflow room)
    world = put_vehicle(world, 1, 4 * W + 7, dest=0, parked=True)
    v2, _ = engine_tick(world)
    assert int(v2.pos[0]) == 4 * W + 6
    assert int(v2.pos[1]) == 4 * W + 7


def test_conflict_one_winner():
    """Two vehicles merging into the same cell: exactly one advances."""
    cell = np.full((H, W), C.WALL, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    # two eastbound lanes (rows 3 and 5) merging into row 4 at x=9
    for row in (3, 5):
        cell[row, 1:10] = C.R3
        dirs[row, 1:10] = C.DIR_BITS[C.E_IDX]
    dirs[3, 9] = C.DIR_BITS[C.N_IDX]   # N = +y: row 3 -> row 4
    dirs[5, 9] = C.DIR_BITS[C.S_IDX]
    cell[4, 9:31] = C.R3
    dirs[4, 9:30] = C.DIR_BITS[C.E_IDX]
    cell[4, 30] = C.BLOCK_ENTRANCE
    rc = np.where(cell == C.R3, 3,
                  np.where(cell == C.BLOCK_ENTRANCE, 1, 0)).astype(np.uint8)
    world = make_world(CFG, cell, dirs, rc, [4 * W + 30])
    world = put_vehicle(world, 0, 3 * W + 9, dest=0)
    world = put_vehicle(world, 1, 5 * W + 9, dest=0)
    v2, _ = engine_tick(world)
    at_merge = [int(v2.pos[i]) // W == 4 for i in (0, 1)]
    assert sum(at_merge) == 1, "exactly one vehicle wins the merge cell"


def test_arrival_despawns():
    """Through the FULL tick: reaching the destination cell records the
    completion and frees the slot (`on_target_reached`
    `vehicle_base.py:755-775`)."""
    world = straight_road_world()
    world = put_vehicle(world, 0, 4 * W + 27, dest=0)
    step = jax.jit(functools.partial(step_world, CFG))
    for _ in range(4):
        world = step(world)
    assert int(world.metrics.completed_internal) == 1
    assert not bool(world.vehicles.active[0])
    assert int(world.veh_map[4, 30]) == -1