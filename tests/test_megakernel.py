"""Megakernel equivalence: the multi-tick fused segment kernel must be
bit-identical to the per-tick engine path (same decide_move_core, same
FSM semantics) over whole chunks, including lights, blocks, spawns,
service vehicles, rain and metrics.  Runs the kernel in interpret mode
on CPU (ops/megakernel.py docstring)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.sim import init_world, run_chunk, \
    measure_and_shrink

import bench

# interpret-mode Mosaic runs are minutes-per-config on one CPU core;
# the kernel is also gated OFF in production (NOTES round-5: it does
# not compile on real TPU hardware yet) — slow tier only
pytestmark = pytest.mark.slow


CFG = dict(WIDTH=64, HEIGHT=64, WALL_THICKNESS=6, SIDEWALK_RING_WIDTH=2,
           MAX_FIELD_DESTS=32, MAX_VEHICLES=256,
           INTERNAL_POPULATION_TRAFFIC_PER_DAY=60000,
           PASSING_POPULATION_TRAFFIC_PER_DAY=20000,
           RAIN_SPAWN_CHANCE=0.2)


def _build_world(cfg):
    world = jax.jit(functools.partial(init_world, cfg))(
        jax.random.PRNGKey(3))
    cfg, world = measure_and_shrink(cfg, world)
    world = bench.inject_vehicles(cfg, world, 120, seed=5)
    return cfg, world


def _run(cfg, world, n, mega: bool):
    if mega:
        os.environ.pop("TSIM_NO_MEGAKERNEL", None)
        os.environ["TSIM_MEGA_INTERPRET"] = "1"
    else:
        os.environ["TSIM_NO_MEGAKERNEL"] = "1"
        os.environ.pop("TSIM_MEGA_INTERPRET", None)
    try:
        from trafficsimulation_tpu.ops import megakernel
        assert megakernel.mega_ok(cfg) == mega
        return jax.jit(functools.partial(run_chunk, cfg, n=n))(world)
    finally:
        os.environ.pop("TSIM_NO_MEGAKERNEL", None)
        os.environ.pop("TSIM_MEGA_INTERPRET", None)


def _compare_worlds(w_ref, w_mega):
    import dataclasses
    FLOAT_CLOSE = {"sum_duration_internal", "sum_duration_through"}

    def cmp(path, a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        leaf = path.split(".")[-1]
        if a.dtype.kind == "f" and leaf in FLOAT_CLOSE:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3,
                                       err_msg=path)
        else:
            np.testing.assert_array_equal(a, b, err_msg=path)

    for f in dataclasses.fields(w_ref):
        name = f.name
        if name in ("rl", "peds"):
            continue
        va, vb = getattr(w_ref, name), getattr(w_mega, name)
        la = jax.tree_util.tree_leaves_with_path(va)
        lb = jax.tree_util.tree_leaves(vb)
        for (pa, a), b in zip(la, lb):
            cmp(name + jax.tree_util.keystr(pa), a, b)


@pytest.mark.parametrize("algo", ["QUEUE_ACTUATED", "FIXED_TIME"])
def test_megakernel_matches_reference_path(algo):
    cfg = Config(**CFG, TRAFFIC_LIGHT_AGENT_ALGORITHM=algo)
    cfg, world = _build_world(cfg)
    n = 12   # two full segments + one partial (R=5)
    w_ref = jax.block_until_ready(_run(cfg, world, n, mega=False))
    w_mega = jax.block_until_ready(_run(cfg, world, n, mega=True))
    assert int(w_ref.vehicles.active.sum()) > 0
    _compare_worlds(w_ref, w_mega)


def test_megakernel_pressure_algo():
    cfg = Config(**CFG, TRAFFIC_LIGHT_AGENT_ALGORITHM="PRESSURE_CONTROL")
    cfg, world = _build_world(cfg)
    w_ref = jax.block_until_ready(_run(cfg, world, 5, mega=False))
    w_mega = jax.block_until_ready(_run(cfg, world, 5, mega=True))
    _compare_worlds(w_ref, w_mega)
