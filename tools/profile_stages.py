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

    def cheap_stop(grid, ls, state):
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

    def cheap_build(cfg_, Q_u16, allowed, is_road, soft2, hard):
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

    def cheap_wf(cfg_, allowed, is_road, enter2, hard):
        v = ((enter2.sum() + hard.astype(jnp.int32).sum()) & 0).astype(
            jnp.int32)
        return jnp.full(allowed.shape, jnp.int32(engine.ND_NONE4)) | v

    engine.build_wavefront = cheap_wf
    timeit(cfg, worlds, "  build_wavefront -> cheap (dep-kept)")
    engine.build_wavefront = orig_wf

    print(f"\nbaseline {base:.3f} ms/tick-of-{BATCH}; deltas above are "
          "each stage's honest cost")


if __name__ == "__main__":
    main()
