#!/usr/bin/env python
"""Stage-cost profiler for the SWEEP config (bench config #4: many
64x64 worlds, per-seed geometry, plain vmap) — VERDICT r3 weak #3: a
64x64 world-tick costs ~0.25 ms, nearly what a 256x256 one does, so
per-tick work that does not scale with grid area dominates the
parameter-sweep axis.  Reuses the dependence-preserving stubs of
profile_stages by monkey-patching the same seams.

Usage: python tools/profile_sweep.py [WORLDS] [TICKS]
"""

import functools
import os
import sys
import time

import jax

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from trafficsimulation_tpu.utils import xla_cache_dir
jax.config.update("jax_compilation_cache_dir", xla_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.ops import engine, pallas_engine
from trafficsimulation_tpu.lights import fsm
from trafficsimulation_tpu.sim import init_world, run_chunk

WORLDS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TICKS = int(sys.argv[2]) if len(sys.argv) > 2 else 100

CFG = Config(WIDTH=64, HEIGHT=64, WALL_THICKNESS=6,
             SIDEWALK_RING_WIDTH=2, MAX_FIELD_DESTS=32,
             MAX_VEHICLES=256,
             INTERNAL_POPULATION_TRAFFIC_PER_DAY=2000,
             PASSING_POPULATION_TRAFFIC_PER_DAY=500)


def build_worlds():
    keys = jax.random.split(jax.random.PRNGKey(0), WORLDS)
    init = jax.jit(jax.vmap(functools.partial(init_world, CFG)))
    t0 = time.perf_counter()
    worlds = jax.block_until_ready(init(keys))
    print(f"generated {WORLDS} worlds in {time.perf_counter()-t0:.1f}s",
          flush=True)
    return worlds


def timeit(worlds, label):
    step = jax.jit(functools.partial(
        lambda c, ws, n: jax.vmap(
            functools.partial(run_chunk, c, n=n))(ws), CFG, n=TICKS))
    w = jax.block_until_ready(step(worlds))
    t0 = time.perf_counter()
    w = jax.block_until_ready(step(w))
    dt = time.perf_counter() - t0
    us = dt / TICKS / WORLDS * 1e6
    cups = WORLDS * 64 * 64 * TICKS / dt
    chk = f" [sum tick={int(jnp.sum(w.tick))}," \
          f" live={int(jnp.sum(w.vehicles.active))}]"
    print(f"{label:46s} {us:8.2f} us/world-tick ({cups/1e6:8.1f}M cups)"
          f"{chk}", flush=True)
    return us


def main():
    worlds = build_worlds()

    timeit(worlds, "full tick")

    # Decide+move kernel -> passthrough (dependence-preserving: one
    # element of every input feeds the flag bit — see profile_stages)
    orig_dm = pallas_engine.decide_move_pallas
    orig_core = pallas_engine.decide_move_core

    def cheap_core(cfg_, shift, select, wnd, pa, pb, pc, pd, pe, pl,
                   stop_map, rain_map, ped_block, intersection, dest_id,
                   r_mal, r_side, r_reroll, r_prio, unroll=True):
        dep = (wnd[:1, :1].astype(jnp.int32).sum()
               + stop_map[:1, :1].astype(jnp.int32).sum()
               + r_prio[:1, :1].astype(jnp.int32).sum()
               + select(dest_id)[:1, :1].astype(jnp.int32).sum())
        flags = jnp.zeros(pa.shape, jnp.int32).at[0, 0].set(dep & 1)
        return pa, pb, pc, pd, pe, pl, flags

    def cheap_dm(cfg_, sdir4, wnd, planes, stop_map, rain_map, ped_block,
                 intersection, dest_id, randoms, **kw):
        return cheap_core(cfg_, None,
                          lambda d: sdir4[0].astype(jnp.int32), wnd,
                          *planes, stop_map, rain_map, ped_block,
                          intersection, dest_id, *randoms)

    pallas_engine.decide_move_pallas = cheap_dm
    pallas_engine.decide_move_core = cheap_core
    timeit(worlds, "  decide+move -> passthrough")
    pallas_engine.decide_move_pallas = orig_dm
    pallas_engine.decide_move_core = orig_core

    # routing planes (sdir+wavefront+density) -> cheap
    orig_rp = engine.routing_planes

    def cheap_rp(cfg_, world, es):
        H, W = cfg_.HEIGHT, cfg_.WIDTH
        D4 = world.cost_field.shape[0] // 4
        dep = (world.cost_field[:1, 0, :1, :1].astype(jnp.int32) >> 30) \
            + (es.pa[:1, :1].astype(jnp.int32) >> 31)
        sdir4 = jnp.broadcast_to(jnp.int32(engine.ND_NONE4) + dep * 0,
                                 (D4, H, W))
        wnd = jnp.full((H, W), jnp.int32(0x07070707)) | dep[0]
        return sdir4, wnd, jnp.zeros((H, W), jnp.float32) + dep[0]

    engine.routing_planes = cheap_rp
    timeit(worlds, "  routing_planes -> cheap")
    engine.routing_planes = orig_rp

    # lights: reductions + controllers + stop map
    orig_red = fsm.group_reductions
    orig_stop = fsm.build_stop_map
    orig_rc = fsm.run_controllers

    def cheap_red(grid, occ, mg, gs=None, **kw):
        s = occ.astype(jnp.int32).sum()
        q = jnp.zeros((mg, 5), jnp.int32).at[0, 0].add(s)
        return (q[:, 0], q[:, 1], q[:, 2], q[:, 3], q[:, 4] > 0)

    def cheap_stop(grid, ls, state, **kw):
        H2, W2 = grid.cell_type.shape
        return jnp.zeros((H2, W2), bool) | state.light_stop.any()

    def cheap_rc(cfg_, grid, gs, lights, occupancy, rl_phase_request=None,
                 reductions=None, **kw):
        dep = (reductions[0][:1].sum() if reductions is not None
               else occupancy.astype(jnp.int32)[:1, :1].sum())
        return lights.replace(
            light_stop=lights.light_stop | (dep < -(1 << 30)))

    fsm.group_reductions = cheap_red
    fsm.build_stop_map = cheap_stop
    fsm.run_controllers = cheap_rc
    timeit(worlds, "  lights (red+ctrl+stop) -> cheap")
    fsm.group_reductions = orig_red
    fsm.build_stop_map = orig_stop
    fsm.run_controllers = orig_rc

    # post_move
    orig_post = engine._post_move

    def cheap_post(cfg_, world_, es, planes, lights, stop_map, density,
                   peds, ped_map, tick, elapsed, key, k_rain, rl_state,
                   events, **kw):
        pa, pb, pc, pd, pe, pl = planes
        m = es.metrics
        m = m.replace(completed_internal=m.completed_internal + events[0])
        return es.replace(pa=pa, pb=pb, pc=pc, pd=pd, pe=pe, pl=pl,
                          stop_map=stop_map, density=density, metrics=m,
                          tick=tick + 1, elapsed=elapsed, key=key,
                          rl=rl_state)

    engine._post_move = cheap_post
    timeit(worlds, "  post_move -> cheap")
    for name in ("arrstack", "destio", "rainblocks", "spawn", "service"):
        engine._post_move = orig_post
        engine._POST_SKIP = frozenset({name})
        timeit(worlds, f"  post[{name}] -> skipped")
    engine._POST_SKIP = frozenset()
    engine._post_move = orig_post

    # tick randoms
    orig_tr = engine.tick_randoms

    def cheap_tr(cfg_, key, H2, W2):
        b = jax.random.bits(key, (4,), jnp.uint32)
        z = jnp.zeros((H2, W2), jnp.float32)
        return (z, z, jnp.full((H2, W2), cfg_.VEHICLE_MIN_SPEED, jnp.int32),
                jnp.zeros((H2, W2), jnp.uint32) + b[2])

    engine.tick_randoms = cheap_tr
    timeit(worlds, "  tick_randoms -> cheap")
    engine.tick_randoms = orig_tr

    # everything at once: the machinery floor
    pallas_engine.decide_move_pallas = cheap_dm
    pallas_engine.decide_move_core = cheap_core
    engine.routing_planes = cheap_rp
    fsm.group_reductions = cheap_red
    fsm.build_stop_map = cheap_stop
    fsm.run_controllers = cheap_rc
    engine._post_move = cheap_post
    engine.tick_randoms = cheap_tr
    timeit(worlds, "  ALL stubs (machinery floor)")


if __name__ == "__main__":
    main()
