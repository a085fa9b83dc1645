#!/usr/bin/env python
"""Stage-cost profiler for the plane-CA tick (engineering tool).

Times `run_chunk` variants with individual stages stubbed out (the only
reliable way to attribute time on this backend: per-executable-call
overhead is ~28 ms, so every measurement is one scan of TICKS ticks).

Usage: python tools/profile_stages.py [TICKS]
"""

import functools
import os
import sys
import time

import jax

os.makedirs("/tmp/tsim_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tsim_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.ops import engine
from trafficsimulation_tpu.lights import fsm
from trafficsimulation_tpu.sim import init_world, run_chunk, \
    measure_and_shrink

H = W = 256
N_VEHICLES = 10_000
TICKS = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def build_world():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench
    cfg = Config(WIDTH=W, HEIGHT=H, MAX_VEHICLES=N_VEHICLES,
                 MAX_FIELD_DESTS=64)
    world = jax.jit(functools.partial(init_world, cfg))(
        jax.random.PRNGKey(0))
    cfg, world = measure_and_shrink(cfg, world)
    world = bench.inject_vehicles(cfg, world, N_VEHICLES)
    return cfg, jax.block_until_ready(world)


def timeit(cfg, world, label):
    chunk = jax.jit(functools.partial(run_chunk, cfg, n=TICKS))
    w = jax.block_until_ready(chunk(world))
    t0 = time.perf_counter()
    w = jax.block_until_ready(chunk(w))
    dt = time.perf_counter() - t0
    ms = dt / TICKS * 1000
    print(f"{label:34s} {ms:8.3f} ms/tick  ({TICKS/dt:8.1f} steps/s)")
    return ms


def main():
    cfg, world = build_world()
    base = timeit(cfg, world, "full tick")
    timeit(cfg.replace(USE_PALLAS_ENGINE=False), world,
           "  - pallas kernel off (XLA core)")

    # ---- decide+movement removed entirely ---------------------------------
    orig_core = engine.pallas_engine.decide_move_core
    orig_pk = engine.pallas_engine.decide_move_pallas

    def fake_core(cfg_, shift, select, pa, pb, pc, pd, pe, pl, *rest):
        return (pa, pb, pc, pd, pe, pl,
                jnp.zeros(pa.shape, jnp.uint8))

    engine.pallas_engine.decide_move_core = fake_core
    engine.pallas_engine.decide_move_pallas = \
        lambda cfg_, sdir, planes, *rest, **kw: planes + (
            jnp.zeros(planes[0].shape, jnp.uint8),)
    no_dm = timeit(cfg, world, "  - decide+movement removed")
    engine.pallas_engine.decide_move_core = orig_core
    engine.pallas_engine.decide_move_pallas = orig_pk

    # ---- stub build_sdir: constant plane --------------------------------
    orig_build = engine.build_sdir
    D = world.cost_field.shape[0]
    const_sdir = jnp.full((D, H, W), jnp.uint16(engine.ND_NONE))
    engine.build_sdir = lambda *a, **k: const_sdir
    no_sdir = timeit(cfg, world, "  - build_sdir stubbed")
    engine.build_sdir = orig_build

    # ---- stub select_dest_rows ------------------------------------------
    orig_sel = engine.select_dest_rows
    engine.select_dest_rows = lambda sdir, dest: jnp.full(
        dest.shape, jnp.uint16(engine.ND_NONE))
    no_sel = timeit(cfg, world, "  - select_dest_rows stubbed")
    engine.select_dest_rows = orig_sel

    # ---- skip movement subrounds ----------------------------------------
    orig_fori = jax.lax.fori_loop

    def fake_fori(lo, hi, body, init):
        if hi is cfg.VEHICLE_MAX_SPEED or hi == cfg.VEHICLE_MAX_SPEED:
            return init
        return orig_fori(lo, hi, body, init)

    jax.lax.fori_loop = fake_fori
    no_move = timeit(cfg, world, "  - movement subrounds skipped")
    jax.lax.fori_loop = orig_fori

    # ---- stub lights ------------------------------------------------------
    orig_red = fsm.group_reductions
    orig_run = fsm.run_controllers
    orig_exec = fsm.execute_phase_change
    orig_stop = fsm.build_stop_map
    G = cfg.capacities().max_groups
    fsm.group_reductions = lambda grid, occ, mg, gs=None: jnp.zeros(
        (5, mg), jnp.int32)
    fsm.run_controllers = \
        lambda cfg_, grid, gs, lights, occ, **k: lights
    fsm.execute_phase_change = lambda cfg_, ls, gs, lights, occ5: lights
    fsm.build_stop_map = lambda grid, ls, lights: jnp.zeros((H, W), bool)
    no_lights = timeit(cfg, world, "  - lights stubbed")
    fsm.group_reductions = orig_red
    fsm.run_controllers = orig_run
    fsm.execute_phase_change = orig_exec
    fsm.build_stop_map = orig_stop

    # ---- stub density ------------------------------------------------------
    orig_dm = engine.density_map
    engine.density_map = lambda occ, rd, r: jnp.zeros((H, W), jnp.float32)
    no_density = timeit(cfg, world, "  - density stubbed")
    engine.density_map = orig_dm

    # ---- stub _post_move (arrivals/service/spawns/rain/blocks) -----------
    orig_post = engine._post_move

    def fake_post(cfg_, world_, es, planes, lights, stop_map, density,
                  peds, ped_map, tick, elapsed, key, k_rain, rl_state,
                  events):
        pa, pb, pc, pd, pe, pl = planes
        return es.replace(pa=pa, pb=pb, pc=pc, pd=pd, pe=pe, pl=pl,
                          stop_map=stop_map, density=density,
                          lights=lights, peds=peds, ped_map=ped_map,
                          tick=tick + 1, elapsed=elapsed, key=key,
                          rl=rl_state)

    engine._post_move = fake_post
    no_post = timeit(cfg, world, "  - post_move stubbed")
    engine._post_move = orig_post

    # ---- floor: empty tick -------------------------------------------------
    orig_step = engine.step_engine
    engine.step_engine = lambda cfg_, world_, es, sdir=None: es.replace(
        tick=es.tick + 1)
    floor = timeit(cfg, world, "  - EMPTY tick (scan floor)")
    engine.step_engine = orig_step

    print()
    print(f"{'build_sdir':26s} ~{base - no_sdir:7.3f} ms")
    print(f"{'select_dest_rows (x6)':26s} ~{base - no_sel:7.3f} ms")
    print(f"{'movement subrounds':26s} ~{base - no_move:7.3f} ms")
    print(f"{'lights':26s} ~{base - no_lights:7.3f} ms")
    print(f"{'density':26s} ~{base - no_density:7.3f} ms")
    print(f"{'post_move':26s} ~{base - no_post:7.3f} ms")
    print(f"{'decide+movement (all)':26s} ~{base - no_dm:7.3f} ms")
    print(f"{'scan floor':26s} ~{floor:7.3f} ms")


if __name__ == "__main__":
    main()
