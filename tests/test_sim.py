"""Whole-simulation invariants: occupancy consistency, counter
conservation, scan-vs-step determinism."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.sim import step_world, run_chunk


def _advance(cfg, world, n):
    f = jax.jit(functools.partial(step_world, cfg))
    for _ in range(n):
        world = f(world)
    return world


def check_invariants(world):
    v = world.vehicles
    active = np.asarray(v.active)
    pos = np.asarray(v.pos)
    vm = np.asarray(world.veh_map).reshape(-1)
    ct = np.asarray(world.grid.cell_type).reshape(-1)

    # vehicle <-> map bijection
    on_map = np.nonzero(vm >= 0)[0]
    assert len(on_map) == active.sum()
    for cell in on_map:
        i = vm[cell]
        assert active[i] and pos[i] == cell
    # every active vehicle on a road-like cell
    road_like = np.isin(ct, list(C.ROAD_LIKE))
    assert road_like[pos[active]].all()
    # no duplicate positions
    assert len(np.unique(pos[active])) == active.sum()


def test_simulation_invariants(small_cfg, small_world):
    world = _advance(small_cfg, small_world, 120)
    check_invariants(world)
    m = world.metrics
    created = int(m.created_internal + m.created_through + m.created_service)
    completed = int(m.completed_internal) + int(m.completed_through)
    errored = int(m.errored_internal + m.errored_through)
    live = int(world.vehicles.active.sum())
    assert created - completed - errored == live, \
        (created, completed, errored, live)
    assert created > 0
    assert int(world.tick) == 120


def test_scan_equals_stepwise(small_cfg, small_world):
    # At PATHFINDING_COOLDOWN=1 both paths rebuild the routing planes
    # every tick, so the fused scan must be bit-identical to stepwise.
    # (At the default cooldown run_chunk legitimately refreshes the
    # planes once per segment — the reference's replan cooldown.)
    small_cfg = small_cfg.replace(PATHFINDING_COOLDOWN=1)
    a = _advance(small_cfg, small_world, 8)
    b = jax.jit(functools.partial(run_chunk, small_cfg, n=8))(small_world)
    for name in ("pos", "active", "heading", "stuck_ticks"):
        assert (np.asarray(getattr(a.vehicles, name)) ==
                np.asarray(getattr(b.vehicles, name))).all(), name
    assert (np.asarray(a.veh_map) == np.asarray(b.veh_map)).all()
    assert (np.asarray(a.stop_map) == np.asarray(b.stop_map)).all()
    assert int(a.metrics.created_internal) == int(b.metrics.created_internal)


def test_vehicles_respect_red_lights(small_cfg, small_world):
    """No vehicle standing on a stop cell at decide time may move
    (reference red-light early exit, `vehicle_base.py:639-643`).  Lights
    commit before decide, so the authoritative stop_map is the one the
    step produced (world.stop_map after the tick)."""
    f = jax.jit(functools.partial(step_world, small_cfg))
    world = _advance(small_cfg, small_world, 60)
    for _ in range(30):
        prev = world
        world = f(world)
        stopped = np.asarray(world.stop_map).reshape(-1)  # decide-time map
        pv = np.asarray(prev.vehicles.pos)
        av = np.asarray(prev.vehicles.active)
        held = av & (pv >= 0) & stopped[np.clip(pv, 0, len(stopped) - 1)]
        # vehicles held at a red light do not move this tick
        moved = np.asarray(world.vehicles.pos) != pv
        still_active = np.asarray(world.vehicles.active) & av
        assert not (held & moved & still_active).any()


def test_trips_complete_over_time(small_cfg, small_world):
    world = _advance(small_cfg, small_world, 400)
    m = world.metrics
    assert int(m.completed_internal) > 0
    assert int(m.created_through) > 0
    check_invariants(world)


def test_assert_world_fits_flags_saturated_caps(small_cfg, small_world):
    """measure_and_shrink caps are valid only for the measured world
    (VERDICT r2 weak #9): the guard passes on the measured world and
    raises once a capacity table saturates (the truncation signature)."""
    import jax
    import pytest
    from trafficsimulation_tpu.sim import (measure_and_shrink,
                                           assert_world_fits)
    cfg2, world2 = measure_and_shrink(small_cfg, small_world)
    # the measured world fits its shrunk TABLES; SMALL deliberately
    # under-provisions MAX_FIELD_DESTS (32 rows < valid dests), which
    # must surface as a visible WARNING, not a raise (ADVICE r3: reached
    # field cap = degraded routing mode, not truncation)
    with pytest.warns(RuntimeWarning, match="MAX_FIELD_DESTS"):
        assert_world_fits(cfg2, world2)

    bad = world2.replace(lights_static=world2.lights_static.replace(
        valid=jax.numpy.ones_like(world2.lights_static.valid)))
    with pytest.raises(RuntimeError, match="saturated"), \
            pytest.warns(RuntimeWarning, match="MAX_FIELD_DESTS"):
        assert_world_fits(cfg2, bad)


def test_dummy_overlay_flags_inconsistency(small_cfg, small_world):
    """USE_DUMMY_AGENTS (reference DummyAgent, `dummy.py:9-28`): the
    render overlay paints magenta exactly where veh_map and the vehicle
    pool disagree — nothing on a consistent world."""
    import jax.numpy as jnp
    import numpy as np
    from trafficsimulation_tpu.ops.render import render_frame

    w = small_world

    def frame(vm, overlay):
        return np.asarray(render_frame(
            w.grid, w.stop_map, w.rain_map, vm, w.vehicles,
            dummy_overlay=overlay))

    # consistent world: the overlay changes nothing
    assert (frame(w.veh_map, True) == frame(w.veh_map, False)).all()

    # corrupt: veh_map points at slot 0, which is inactive — exactly
    # that cell gets repainted
    bad_map = w.veh_map.reshape(-1).at[100].set(0).reshape(w.veh_map.shape)
    diff = (frame(bad_map, True) != frame(bad_map, False)).any(axis=-1)
    assert diff.sum() == 1 and diff.reshape(-1)[100]


def test_free_slots_matches_nonzero():
    """engine.free_slots == jnp.nonzero(~used, size=n, fill_value=-1)
    for every fill regime (plenty free / exactly n / fewer than n)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from trafficsimulation_tpu.ops import engine

    rng = np.random.default_rng(0)
    for V, n, p in ((64, 16, 0.3), (64, 16, 0.95), (64, 128, 0.5),
                    (1024, 64, 0.99), (16, 16, 1.0)):
        used = jnp.asarray(rng.random(V) < p)
        want = jnp.nonzero(~used, size=n, fill_value=-1)[0].astype(
            jnp.int32)
        got = engine.free_slots(used, n)
        assert np.array_equal(np.asarray(want), np.asarray(got)), (V, n, p)
