"""The Pallas decide+movement kernel is bit-identical to the XLA path:
both executors run `decide_move_core` with the same random inputs, so
planes must match exactly (interpreter mode stands in for TPU here)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu.ops import engine, pallas_engine
from trafficsimulation_tpu.sim import _enter_engine

from test_engine import make_world, put_vehicle, two_lane_road, CFG, H, W


def _setup():
    cell, dirs, rc, dest_cell = two_lane_road()
    world = make_world(CFG, cell, dirs, rc, [dest_cell])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)
    world = put_vehicle(world, 1, 4 * W + 7, dest=0)
    world = put_vehicle(world, 2, 4 * W + 3, dest=0)
    world = put_vehicle(world, 3, 5 * W + 20, dest=0, heading=3)
    es = _enter_engine(CFG, world)
    sdir = engine.routing_planes(CFG, world, es)
    return world, es, sdir


def test_pallas_kernel_matches_xla_core():
    world, es, sdir = _setup()
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    randoms = (jax.random.uniform(k1, (H, W)),
               jax.random.uniform(k2, (H, W)),
               jax.random.randint(k3, (H, W), CFG.VEHICLE_MIN_SPEED,
                                  CFG.VEHICLE_MAX_SPEED + 1),
               jax.random.bits(k4, (H, W)))
    planes = (es.pa, es.pb, es.pc, es.pd, es.pe, es.pl)
    stop = jnp.zeros((H, W), bool)
    ped = jnp.zeros((H, W), bool)
    grid = world.grid

    from trafficsimulation_tpu.ops.routing import _shift_plane
    sd, wnd = sdir
    ref = pallas_engine.decide_move_core(
        CFG, _shift_plane, lambda d: engine.select_dest_rows(sd, d), wnd,
        *planes, stop, es.rain_map, ped, grid.intersection, grid.dest_id,
        *randoms)

    got = pallas_engine.decide_move_pallas(
        CFG, sd, wnd, planes, stop, es.rain_map, ped,
        grid.intersection, grid.dest_id, randoms, interpret=True)

    names = ("pa", "pb", "pc", "pd", "pe", "pl", "flags")
    for n, a, b in zip(names, ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"plane {n} diverges between XLA core and Pallas kernel"
    # sanity: something actually happened
    assert (np.asarray(ref[6]) & pallas_engine.FLAG_MOVED).any()


def test_shift_roll_matches_shift_plane():
    """The kernel's roll+fill shift equals the padded-shift used by the
    XLA path for all four directions and several dtypes."""
    from trafficsimulation_tpu.ops.routing import _shift_plane
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(0, 255, size=(8, 16), dtype=np.uint8))
    x32 = jnp.asarray(rng.integers(0, 2**31, size=(8, 16)).astype(np.int32))

    def roll_host(x, d, fill):
        # reimplementation of pallas_engine._shift_roll with jnp.roll for
        # host-side comparison (pltpu.roll needs a kernel context)
        from trafficsimulation_tpu import codes as C
        Hh, Ww = x.shape
        if d == C.N_IDX:
            r = jnp.roll(x, -1, 0)
            edge = jnp.arange(Hh)[:, None] == Hh - 1
        elif d == C.S_IDX:
            r = jnp.roll(x, 1, 0)
            edge = jnp.arange(Hh)[:, None] == 0
        elif d == C.E_IDX:
            r = jnp.roll(x, -1, 1)
            edge = jnp.arange(Ww)[None, :] == Ww - 1
        else:
            r = jnp.roll(x, 1, 1)
            edge = jnp.arange(Ww)[None, :] == 0
        return jnp.where(edge, jnp.asarray(fill, x.dtype), r)

    for d in range(4):
        for x, fill in ((x8, 0xF), (x32, 123)):
            a = _shift_plane(x, d, jnp.asarray(fill, x.dtype))
            b = roll_host(x, d, fill)
            assert np.array_equal(np.asarray(a), np.asarray(b)), d
