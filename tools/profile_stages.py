#!/usr/bin/env python
"""Stage-cost profiler for the plane-CA tick (engineering tool).

Times `run_chunk` with individual stages replaced by CHEAP,
DEPENDENCE-PRESERVING stubs.  Constant stubs are useless here: XLA
folds everything downstream of a constant and the apparent saving
includes the folded consumers (see NOTES.md "measurement pitfalls").
Every stub below keeps a data dependence on the stage's inputs so only
the stage's own cost disappears.

Usage: python tools/profile_stages.py [BATCH] [TICKS]
  BATCH=1 profiles the single-world tick, >1 the vmapped batch.
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.ops import engine, pallas_engine
from trafficsimulation_tpu.lights import fsm
from trafficsimulation_tpu.sim import init_world, run_chunk, \
    measure_and_shrink

H = W = 256
N_VEHICLES = 10_000
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
TICKS = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def build_worlds():
    import bench
    cfg = Config(WIDTH=W, HEIGHT=H, MAX_VEHICLES=N_VEHICLES,
                 MAX_FIELD_DESTS=int(os.environ.get('PROF_D', 64)))
    world = jax.jit(functools.partial(init_world, cfg))(
        jax.random.PRNGKey(0))
    cfg, world = measure_and_shrink(cfg, world)
    world = bench.inject_vehicles(cfg, world, N_VEHICLES)
    world = jax.block_until_ready(world)
    if BATCH > 1:
        # shared-geometry batch, exactly like the headline bench: the
        # [D, 4, H, W] field stack (335 MB at D=640) lives ONCE —
        # a fully-broadcast B=16 batch OOMs the 16 GB v5e (observed r3)
        from trafficsimulation_tpu.parallel.mesh import tile_dynamic
        keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
        world = tile_dynamic(world, keys)
    return cfg, world


def timeit(cfg, worlds, label):
    only = os.environ.get("PROF_ONLY")
    if only and label != "full tick" \
            and not any(o in label for o in only.split(",")):
        return 0.0
    if BATCH > 1:
        from trafficsimulation_tpu.parallel.mesh import run_batch_shared
        f = jax.jit(functools.partial(run_batch_shared, cfg,
                                      n_ticks=TICKS))
    else:
        f = jax.jit(functools.partial(run_chunk, cfg, n=TICKS))
    w = jax.block_until_ready(f(worlds))
    t0 = time.perf_counter()
    w = jax.block_until_ready(f(w))
    dt = time.perf_counter() - t0
    ms = dt / TICKS * 1000
    cups = BATCH * H * W * TICKS / dt
    # sanity checksum: a folded/elided run shows an unchanged tick count
    try:
        import numpy as _np
        ticks2 = int(_np.asarray(jnp.sum(w.tick)))
        chk = f" [sum tick={ticks2}, live={int(jnp.sum(w.vehicles.active)) if hasattr(w, 'vehicles') else -1}]"
    except Exception as e:
        chk = f" [checksum failed: {type(e).__name__}]"
    print(f"{label:46s} {ms:8.3f} ms/tick-of-{BATCH}"
          f"  ({cups/1e6:8.1f}M cups){chk}", flush=True)
    return ms


def main():
    cfg, worlds = build_worlds()
    base = timeit(cfg, worlds, "full tick")

    orig_sel = engine.select_rows
    engine.select_rows = lambda sdir, dest: (sdir[0].astype(jnp.int32)
                                             | (dest & 0))
    timeit(cfg, worlds, "  select -> cheap (dep-kept)")
    engine.select_rows = orig_sel

    orig_red = fsm.group_reductions

    def cheap_red(grid, occ, mg, gs=None, **kw):
        s = occ.astype(jnp.int32).sum()
        q = jnp.zeros((mg, 5), jnp.int32).at[0, 0].add(s)
        return (q[:, 0], q[:, 1], q[:, 2], q[:, 3], q[:, 4] > 0)

    fsm.group_reductions = cheap_red
    timeit(cfg, worlds, "  group_reductions -> cheap (dep-kept)")
    fsm.group_reductions = orig_red

    orig_stop = fsm.build_stop_map

    def cheap_stop(grid, ls, state, **kw):
        H2, W2 = grid.cell_type.shape
        return jnp.zeros((H2, W2), bool) | state.light_stop.any()

    fsm.build_stop_map = cheap_stop
    timeit(cfg, worlds, "  build_stop_map -> cheap (dep-kept)")
    fsm.build_stop_map = orig_stop

    timeit(cfg.replace(VEHICLE_MAX_SPEED=1), worlds,
           "  MAX_SPEED=1 (1 movement subround)")

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
    timeit(cfg, worlds, "  post_move -> cheap (dep-kept)")
    engine._post_move = orig_post

    orig_build = engine.build_sdir

    def cheap_build(cfg_, Q_u16, allowed, is_road, soft2, hard, **kw):
        # dep-preserving: one element of each input feeds the output
        # (avoid x & 0 / sum-based stubs — XLA folds them, NOTES.md)
        D4 = Q_u16.shape[0] // 4
        dep = (Q_u16[:1, 0, :1, :1].astype(jnp.int32) >> 15) \
            + (soft2[:1, :1] >> 30) + hard[:1, :1].astype(jnp.int32)
        return jnp.broadcast_to(
            jnp.int32(engine.ND_NONE4) + dep * 0,
            (D4,) + Q_u16.shape[2:])

    engine.build_sdir = cheap_build
    timeit(cfg, worlds, "  build_sdir -> cheap (dep-kept)")
    engine.build_sdir = orig_build

    orig_wf = engine.build_wavefront

    def cheap_wf(cfg_, allowed, is_road, enter2, hard, **kw):
        v = ((enter2.sum() + hard.astype(jnp.int32).sum()) & 0).astype(
            jnp.int32)
        return jnp.full(allowed.shape, jnp.int32(engine.ND_NONE4)) | v

    engine.build_wavefront = cheap_wf
    timeit(cfg, worlds, "  build_wavefront -> cheap (dep-kept)")
    engine.build_wavefront = orig_wf

    # ---- the decide+move kernel itself: passthrough planes + trivial
    # flags (dep on stop_map/randoms kept through one element) ----------
    orig_dm = pallas_engine.decide_move_pallas

    def cheap_dm(cfg_, sdir4, wnd, planes, stop_map, rain_map, ped_bit,
                 inter, dest_id, randoms, **kw):
        pa, pb, pc, pd, pe, pl = planes
        # one-element slices keep every input producer alive (opaque
        # pallas producers stay whole); the single written flag bit
        # perturbs at most one metrics counter per tick
        dep = (sdir4[0, :1, :1].astype(jnp.int32).sum()
               + wnd[:1, :1].sum()
               + stop_map[:1, :1].astype(jnp.int32).sum()
               + randoms[3][:1, :1].astype(jnp.int32).sum())
        flags = jnp.zeros(pa.shape, jnp.uint32).at[0, 0].set(
            (dep & 1).astype(jnp.uint32))
        return (pa, pb, pc, pd, pe, pl, flags)

    pallas_engine.decide_move_pallas = cheap_dm
    timeit(cfg, worlds, "  decide_move kernel -> passthrough")
    pallas_engine.decide_move_pallas = orig_dm

    # ---- controllers (FSM vector math), randoms, rain+blocks, density -
    orig_rc = fsm.run_controllers

    def cheap_rc(cfg_, grid, gs, lights, occupancy, rl_phase_request=None,
                 reductions=None, **kw):
        if reductions is not None:
            dep = reductions[0][:1].sum()
        else:
            dep = occupancy.astype(jnp.int32)[:1, :1].sum()
        return lights.replace(
            light_stop=lights.light_stop | (dep < -(1 << 30)))

    fsm.run_controllers = cheap_rc
    timeit(cfg, worlds, "  run_controllers -> passthrough")
    fsm.run_controllers = orig_rc

    orig_tr = engine.tick_randoms

    def cheap_tr(cfg_, key, H2, W2):
        b = jax.random.bits(key, (4,), jnp.uint32)
        z = jnp.zeros((H2, W2), jnp.float32)
        return (z, z,
                jnp.full((H2, W2), cfg_.VEHICLE_MIN_SPEED, jnp.int32),
                jnp.zeros((H2, W2), jnp.uint32) + b[2])

    engine.tick_randoms = cheap_tr
    timeit(cfg, worlds, "  tick_randoms -> cheap")
    engine.tick_randoms = orig_tr

    engine._POST_SKIP = frozenset({"arrstack"})
    timeit(cfg, worlds, "  arrival stats stack -> skipped")
    engine._POST_SKIP = frozenset({"destio"})
    timeit(cfg, worlds, "  dest-space gathers/scatters -> skipped")
    engine._POST_SKIP = frozenset({"rainblocks"})
    timeit(cfg, worlds, "  rain+blocks -> skipped")
    engine._POST_SKIP = frozenset({"spawn"})
    timeit(cfg, worlds, "  demand spawn -> skipped")
    engine._POST_SKIP = frozenset({"service"})
    timeit(cfg, worlds, "  service FSM -> skipped")
    engine._POST_SKIP = frozenset(
        {"arrstack", "destio", "rainblocks", "spawn", "service"})
    timeit(cfg, worlds, "  post: ALL sections skipped")
    engine._POST_SKIP = frozenset()

    orig_dens = engine.density_map

    def cheap_dens(present, is_road, rng):
        return present.astype(jnp.float32) * 0.1

    engine.density_map = cheap_dens
    timeit(cfg, worlds, "  density_map -> cheap")
    engine.density_map = orig_dens

    # ---- combos: where does the cross-stage interaction live? ---------
    engine.build_sdir = cheap_build
    pallas_engine.decide_move_pallas = cheap_dm
    timeit(cfg, worlds, "  combo: sdir+decide stubbed")
    engine.build_sdir = orig_build
    pallas_engine.decide_move_pallas = orig_dm

    engine._post_move = cheap_post
    fsm.build_stop_map = cheap_stop
    fsm.group_reductions = cheap_red
    timeit(cfg, worlds, "  combo: post+stop+group stubbed")
    engine._post_move = orig_post
    fsm.build_stop_map = orig_stop
    fsm.group_reductions = orig_red

    # ---- floor: ALL stubs at once — what's left is scan/carry/dispatch
    # machinery that no stage owns --------------------------------------
    engine.select_rows = lambda sdir, dest: (sdir[0].astype(jnp.int32)
                                             | (dest & 0))
    fsm.group_reductions = cheap_red
    fsm.build_stop_map = cheap_stop
    engine._post_move = cheap_post
    engine.build_sdir = cheap_build
    engine.build_wavefront = cheap_wf
    pallas_engine.decide_move_pallas = cheap_dm
    fsm.run_controllers = cheap_rc
    engine.tick_randoms = cheap_tr
    engine.density_map = cheap_dens
    timeit(cfg, worlds, "  ALL stubs (machinery floor)")
    engine.select_rows = orig_sel
    fsm.group_reductions = orig_red
    fsm.build_stop_map = orig_stop
    engine._post_move = orig_post
    engine.build_sdir = orig_build
    engine.build_wavefront = orig_wf
    pallas_engine.decide_move_pallas = orig_dm
    fsm.run_controllers = orig_rc
    engine.tick_randoms = orig_tr
    engine.density_map = orig_dens

    print(f"\nbaseline {base:.3f} ms/tick-of-{BATCH}; deltas above are "
          "each stage's honest cost")


if __name__ == "__main__":
    main()
