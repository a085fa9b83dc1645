"""Single-vehicle movement semantics on a synthetic straight road —
bit-level checks of `_determine_max_steps` / `_execute_movement`
(`vehicle_base.py:719-753`) and conflict resolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.core.state import Vehicles
from trafficsimulation_tpu.ops import movement, routing
from trafficsimulation_tpu.sim import init_vehicles

H, W = 8, 32
CFG = Config(WIDTH=W, HEIGHT=H, RAIN_ENABLED=False,
             VEHICLE_MALFUNCTION_ACTIVE=False,
             VEHICLE_SIDESWIPE_COLLISION_ACTIVE=False,
             VEHICLE_MIN_SPEED=3, VEHICLE_MAX_SPEED=3)  # deterministic speed


def make_road():
    """One eastbound road on row 4, x in [1, 30]; dest at (30, 4)."""
    cell = np.full((H, W), C.WALL, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    cell[4, 1:31] = C.R2
    dirs[4, 1:30] = C.DIR_BITS[C.E_IDX]
    cell[4, 30] = C.BLOCK_ENTRANCE
    road_class = np.where(cell == C.R2, 2, np.where(
        cell == C.BLOCK_ENTRANCE, 1, 0)).astype(np.uint8)
    is_road = np.isin(cell, list(C.ROAD_LIKE))
    dest_pos = jnp.asarray([4 * W + 30], jnp.int32)
    field = routing.compute_cost_fields(
        CFG, jnp.asarray(dirs), jnp.asarray(road_class), dest_pos,
        jnp.asarray([True]))
    return (jnp.asarray(cell), jnp.asarray(dirs), jnp.asarray(road_class),
            jnp.asarray(is_road), dest_pos, field)


def put_vehicle(v: Vehicles, slot, x, y, dest=0, heading=1):
    idx = jnp.asarray([slot])
    return v.replace(
        active=v.active.at[idx].set(True),
        pos=v.pos.at[idx].set(y * W + x),
        heading=v.heading.at[idx].set(heading),
        dest=v.dest.at[idx].set(dest),
        base_speed=v.base_speed.at[idx].set(0))


def run_tick(cell, dirs, rc, is_road, dest_pos, field, vehicles, veh_map,
             stop_map, key=jax.random.PRNGKey(0)):
    enter = 1.0 + routing.road_type_penalty(CFG, rc.reshape(H, W))
    density = jnp.zeros((H, W))
    rain = jnp.zeros((H, W), bool)
    inter = jnp.zeros((H * W,), bool)
    v2, cells, d2, valid, on_stop, ms, ev = movement.decide(
        CFG, H, W, dirs.reshape(H, W), enter, is_road.reshape(H, W),
        inter, field, dest_pos, vehicles, veh_map, stop_map, rain,
        density, key)
    v3, vm = movement.move(CFG, H, W, v2, veh_map, stop_map, cells, d2,
                           valid, on_stop, ms, key)
    return v3, vm, ms


def fresh(n=8):
    v = init_vehicles(n)
    vm = jnp.full((H, W), -1, jnp.int32)
    stop = jnp.zeros((H, W), bool)
    return v, vm, stop


def test_moves_at_speed():
    cell, dirs, rc, is_road, dp, field = make_road()
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 5, 4)
    vm = vm.at[4, 5].set(0)
    v2, vm2, ms = run_tick(cell, dirs, rc, is_road, dp, field, v, vm, stop)
    # deterministic speed 3: moved exactly 3 cells east
    assert int(v2.pos[0]) == 4 * W + 8
    assert int(ms[0]) == 3
    assert int(v2.steps_traveled[0]) == 3
    assert int(vm2[4, 8]) == 0 and int(vm2[4, 5]) == -1


def test_stops_before_stop_cell():
    cell, dirs, rc, is_road, dp, field = make_road()
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 5, 4)
    vm = vm.at[4, 5].set(0)
    stop = stop.at[4, 7].set(True)   # red 2 cells ahead
    v2, vm2, ms = run_tick(cell, dirs, rc, is_road, dp, field, v, vm, stop)
    # max_steps = min(speed=3, idx_stop=1) -> stops just before the light
    assert int(v2.pos[0]) == 4 * W + 6
    assert int(ms[0]) == 1


def test_held_on_stop_cell():
    cell, dirs, rc, is_road, dp, field = make_road()
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 7, 4)
    vm = vm.at[4, 7].set(0)
    stop = stop.at[4, 7].set(True)   # standing on a red cell
    v2, vm2, ms = run_tick(cell, dirs, rc, is_road, dp, field, v, vm, stop)
    assert int(v2.pos[0]) == 4 * W + 7      # held
    assert int(ms[0]) == 0
    assert int(v2.base_speed[0]) == 0       # full stop resets cruise speed


def test_queues_behind_vehicle():
    cell, dirs, rc, is_road, dp, field = make_road()
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 5, 4)
    v = put_vehicle(v, 1, 7, 4)     # blocker two ahead
    # blocker is parked (stranded -> hard obstacle; single-lane road, no
    # contraflow room on this synthetic map)
    v = v.replace(parked=v.parked.at[1].set(True))
    vm = vm.at[4, 5].set(0).at[4, 7].set(1)
    v2, vm2, ms = run_tick(cell, dirs, rc, is_road, dp, field, v, vm, stop)
    # vehicle 0 advances to just behind the blocker at most
    assert int(v2.pos[0]) in (4 * W + 6,)
    assert int(v2.pos[1]) == 4 * W + 7


def test_conflict_one_winner():
    """Two vehicles merging into the same cell: exactly one advances."""
    cell = np.full((H, W), C.WALL, np.uint8)
    dirs = np.zeros((H, W), np.uint8)
    # two eastbound lanes (rows 3 and 5) merging into row 4 at x=10
    for row in (3, 5):
        cell[row, 1:10] = C.R3
        dirs[row, 1:10] = C.DIR_BITS[C.E_IDX]
    dirs[3, 9] = C.DIR_BITS[C.S_IDX]
    dirs[5, 9] = C.DIR_BITS[C.N_IDX]
    cell[4, 9:31] = C.R3
    dirs[4, 9:30] = C.DIR_BITS[C.E_IDX]
    cell[4, 30] = C.BLOCK_ENTRANCE
    rc = np.where(cell == C.R3, 3,
                  np.where(cell == C.BLOCK_ENTRANCE, 1, 0)).astype(np.uint8)
    is_road = np.isin(cell, list(C.ROAD_LIKE))
    dest_pos = jnp.asarray([4 * W + 30], jnp.int32)
    field = routing.compute_cost_fields(CFG, jnp.asarray(dirs),
                                        jnp.asarray(rc), dest_pos,
                                        jnp.asarray([True]))
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 9, 3)
    v = put_vehicle(v, 1, 9, 5)
    vm = vm.at[3, 9].set(0).at[5, 9].set(1)
    v2, vm2, ms = run_tick(jnp.asarray(cell), jnp.asarray(dirs),
                           jnp.asarray(rc), jnp.asarray(is_road),
                           dest_pos, field, v, vm, stop)
    at_merge = [int(v2.pos[i]) == 4 * W + 9 or
                (int(v2.pos[i]) // W == 4 and int(v2.pos[i]) % W > 9)
                for i in (0, 1)]
    assert sum(at_merge) == 1, "exactly one vehicle wins the merge cell"


def test_arrival_despawns():
    from trafficsimulation_tpu.core.state import DestStatic
    cell, dirs, rc, is_road, dp, field = make_road()
    # drive a mini sim loop manually: decide+move+arrival emulation is in
    # sim.step_world; here check the vehicle reaches and stays at dest
    v, vm, stop = fresh()
    v = put_vehicle(v, 0, 27, 4)
    vm = vm.at[4, 27].set(0)
    for _ in range(4):
        v, vm, _ = run_tick(cell, dirs, rc, is_road, dp, field, v, vm, stop)
    assert int(v.pos[0]) == 4 * W + 30   # parked on the destination cell