#!/usr/bin/env python
"""Benchmark: cell-updates/sec on the BASELINE headline config
(256x256 grid, 10k vehicles — BASELINE.json `metric`), plus one
sub-benchmark per BASELINE config so regressions in generation,
pedestrians, world-batching and the 1024^2 flagship are visible every
round (VERDICT r2 weak #7):

  #1 generation + light cycling, 100x100, headless
  #2 vehicle CA, 256x256, 10k vehicles (headline, full routability)
  #3 pedestrians on sidewalks with crosswalk/vehicle interaction
  #4 many-world vmapped rollout (64x64 sweep worlds)
  #5 1024x1024, 100k vehicles, on-device framebuffer render

Prints ONE JSON line for the driver; the per-config results ride in
`extra.configs`.  Configs that exceed the time budget are reported as
{"skipped": reason} — never silently dropped.
"""

import functools
import json
import os
import sys
import time
import traceback

import jax


import jax.numpy as jnp
import numpy as np


def _backend_watchdog(
        secs: float = float(os.environ.get("BENCH_WATCHDOG_SECS", 600))):
    """The axon TPU tunnel can HANG backend init (observed r3) — and the
    init can be triggered by the very first device-array creation, so
    this must run BEFORE importing the simulation package: emit an
    explained JSON line and exit instead of eating the driver's whole
    budget silently."""
    import threading
    done = threading.Event()

    def boom():
        if not done.is_set():
            print(json.dumps({
                "metric": "cell-updates/sec (256x256, 10k vehicles)",
                "value": 0, "unit": "cell-updates/sec", "vs_baseline": 0,
                "extra": {"error": "TPU backend init exceeded "
                                   f"{secs:.0f}s watchdog (tunnel down?)"},
            }), flush=True)
            os._exit(3)

    t = threading.Timer(secs, boom)
    t.daemon = True
    t.start()
    dev = jax.devices()
    done.set()
    t.cancel()
    return dev


_backend_watchdog()

# persistent XLA compilation cache: repeated bench/driver runs skip the
# multi-minute generation-pipeline compile.  Keyed by CPU features so a
# cache written on one host cannot SIGILL another (utils.xla_cache_dir).
from trafficsimulation_tpu.utils import xla_cache_dir    # noqa: E402
jax.config.update("jax_compilation_cache_dir", xla_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from trafficsimulation_tpu.config import Config          # noqa: E402
from trafficsimulation_tpu.sim import init_world, run_chunk, \
    measure_and_shrink                                    # noqa: E402

H = W = 256
N_VEHICLES = 10_000
# ticks per timed executable call: the tunnel's fixed per-call overhead
# measured ~170 ms (arg shuttling), so short calls understate
# steady-state throughput — 800-tick chunks amortize it to well under 1%
TICKS = 800
BATCH = 40

_T0 = time.perf_counter()
TIME_BUDGET = float(os.environ.get("BENCH_BUDGET_SECS", 2100))


def _left():
    return TIME_BUDGET - (time.perf_counter() - _T0)


def inject_vehicles(cfg, world, n, seed=0):
    """Synthetic dense load: n vehicles on random reachable road cells."""
    rng = np.random.default_rng(seed)
    Hh, Ww = world.grid.is_road.shape
    # cost_field stores pre-encoded keys (engine.field_to_keys):
    # min over headings >> 2 recovers the best candidate cost,
    # >= KBIG (2^19) = unreachable
    field = np.asarray(world.cost_field.min(axis=1)) >> 2  # [D, H, W]
    DF = field.shape[0]
    if world.dests.rid is not None:
        # hierarchical routing: every valid dest is routable; vehicle
        # dest values are rids; reachability = any dense (hub) row
        dvalid = np.asarray(world.dests.valid)
        dids = np.nonzero(dvalid)[0]
        rid = np.asarray(world.dests.rid)
        reach = (field.min(axis=0) < (1 << 19)).reshape(-1)
    else:
        dvalid = np.asarray(world.dests.valid)[:DF]
        dids = np.nonzero(dvalid)[0]
        rid = np.arange(world.dests.valid.shape[0])
        reach = (field[dids[0]] < (1 << 19)).reshape(-1)
    road = np.asarray(world.grid.is_road).reshape(-1)
    occ_ok = np.asarray(world.veh_map).reshape(-1) < 0
    cells = np.nonzero(reach & road & occ_ok)[0]
    n = min(n, len(cells), world.vehicles.active.shape[0])
    pos = rng.choice(cells, size=n, replace=False).astype(np.int32)
    dest = rid[dids[rng.integers(0, len(dids), size=n)]].astype(np.int32)

    v = world.vehicles
    idx = jnp.arange(n)
    v = v.replace(
        active=v.active.at[idx].set(True),
        pos=v.pos.at[idx].set(jnp.asarray(pos)),
        dest=v.dest.at[idx].set(jnp.asarray(dest)),
        heading=v.heading.at[idx].set(-1),
        kind=v.kind.at[idx].set(0),
    )
    vm = world.veh_map.reshape(-1).at[jnp.asarray(pos)].set(
        idx.astype(jnp.int32)).reshape(Hh, Ww)
    return world.replace(vehicles=v, veh_map=vm)


def _cap_diagnostics(cfg, world):
    """No-silent-caps counters (VERDICT r3 weak #2/#3), batch-aware:
    routability (blocks whose destination has NO field row — their
    demand gets resampled / exit-fallback routed), dropped-spawn
    accounting, and vehicle-pool saturation."""
    bs = world.blocks_static
    DF = world.cost_field.shape[-4]
    lim = (1 << 14) if world.local_sdir4 is not None else DF
    valid = np.asarray(bs.valid)
    dest = np.asarray(bs.dest)
    unroutable = valid & ((dest < 0) | (dest >= lim))
    m = world.metrics
    act = np.asarray(world.vehicles.active)
    dv = np.asarray(world.dests.valid)
    return {
        "field_rows": int(DF),
        "n_valid_dests_max_per_world": int(
            dv.reshape(-1, dv.shape[-1]).sum(axis=-1).max()),
        "blocks_unroutable_no_field": int(unroutable.sum()),
        "worlds_with_unroutable_blocks": int(
            unroutable.reshape(-1, unroutable.shape[-1]).any(-1).sum()),
        "vehicle_pool": int(act.shape[-1]),
        "pool_peak_active": int(act.sum(axis=-1).max()),
        "errored_dropped_or_stuck": int(
            np.asarray(m.errored_internal).sum()
            + np.asarray(m.errored_through).sum()),
    }


def _steps_per_sec(cfg, world, ticks):
    chunk = jax.jit(functools.partial(run_chunk, cfg, n=ticks))
    w = jax.block_until_ready(chunk(world))   # compile + warm
    t0 = time.perf_counter()
    w = jax.block_until_ready(chunk(w))
    return ticks / (time.perf_counter() - t0), w


def bench_headline():
    """#2: the headline — 256x256, 10k vehicles, FULL routability
    (every block destination has a field row; `blocks_unroutable` = 0)."""
    cfg = Config(WIDTH=W, HEIGHT=H, MAX_VEHICLES=N_VEHICLES,
                 MAX_FIELD_DESTS=640)
    key = jax.random.PRNGKey(0)
    world = jax.jit(functools.partial(init_world, cfg))(key)
    cfg, world = measure_and_shrink(cfg, world)
    n_dests = int(np.asarray(world.dests.valid).sum())
    bs = world.blocks_static
    unroutable = int((np.asarray(bs.valid) & (
        (np.asarray(bs.dest) < 0) |
        (np.asarray(bs.dest) >= world.cost_field.shape[0]))).sum())
    world = inject_vehicles(cfg, world, N_VEHICLES)
    world = jax.block_until_ready(world)

    steps_per_sec, world2 = _steps_per_sec(cfg, world, TICKS)

    # batched rollouts of the same city, shared geometry: the 335 MB
    # [D, 4, H, W] routing stack lives ONCE; only dynamic state (planes,
    # pools, metrics) is per-world, so the batch is no longer HBM-capped
    # by the field stack (parallel.mesh.tile_dynamic; bit-identical to a
    # fully broadcast batch — tests/test_parallel.py)
    try:
        if _left() < 300:
            raise TimeoutError("skip batch measurement (time budget)")
        from trafficsimulation_tpu.parallel.mesh import (
            tile_dynamic, run_batch_shared, SHARED_GEOMETRY_FIELDS)
        import dataclasses
        dyn_bytes = sum(
            np.asarray(x).nbytes
            for f in dataclasses.fields(world)
            if f.name not in SHARED_GEOMETRY_FIELDS
            for x in jax.tree_util.tree_leaves(getattr(world, f.name)))
        batch = max(1, min(BATCH, int(7.5e9 / max(dyn_bytes, 1))))
        keys = jax.random.split(jax.random.PRNGKey(1), batch)
        worlds = tile_dynamic(world, keys)
        bstep = jax.jit(functools.partial(run_batch_shared, cfg,
                                          n_ticks=TICKS), donate_argnums=0)
        worlds = jax.block_until_ready(bstep(worlds))
        t0 = time.perf_counter()
        worlds = jax.block_until_ready(bstep(worlds))
        dt_batch = time.perf_counter() - t0
        cups = batch * H * W * TICKS / dt_batch
        batch_ok = True
    except Exception:
        traceback.print_exc(file=sys.stderr)
        cups = H * W * steps_per_sec
        batch_ok = False
        batch = 1

    single_cups = H * W * steps_per_sec
    best_cups = max(cups if batch_ok else 0.0, single_cups)
    best_batch = batch if (batch_ok and cups > single_cups) else 1
    return {
        "value": round(best_cups, 1),
        "batch": best_batch,
        "single_world_steps_per_sec": round(steps_per_sec, 2),
        "single_world_cell_updates_per_sec": round(single_cups, 1),
        "batched_cell_updates_per_sec": round(cups, 1) if batch_ok
        else None,
        "active_vehicles": int(world2.vehicles.active.sum()),
        "n_dests": n_dests,
        "blocks_unroutable_no_field": unroutable,
    }


def bench_config1():
    """#1: generation + light cycling, 100x100, headless, no traffic."""
    cfg = Config(WIDTH=100, HEIGHT=100, ENABLE_TRAFFIC=False,
                 MAX_FIELD_DESTS=64, MAX_VEHICLES=256)
    gen = jax.jit(functools.partial(init_world, cfg))
    w = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for s in range(1, 4):
        jax.block_until_ready(gen(jax.random.PRNGKey(s)))
    gen_ms = (time.perf_counter() - t0) / 3 * 1e3
    sps, _ = _steps_per_sec(cfg, w, 200)
    return {"config": "gen+lights 100x100 headless",
            "generate_ms": round(gen_ms, 1),
            "light_cycling_steps_per_sec": round(sps, 1),
            "lights": int(np.asarray(w.lights_static.valid).sum())}


def bench_config3():
    """#3: pedestrians on sidewalk rings with crosswalk interaction —
    at FULL routability (MAX_FIELD_DESTS=640 covers every block; the
    former 64-row cap silently resampled most internal demand,
    VERDICT r3 weak #2)."""
    cfg = Config(WIDTH=W, HEIGHT=H, MAX_VEHICLES=4096,
                 MAX_FIELD_DESTS=640, PEDESTRIANS_ENABLED=True,
                 PEDESTRIANS_PER_DAY=200_000)
    world = jax.jit(functools.partial(init_world, cfg))(
        jax.random.PRNGKey(0))
    cfg, world = measure_and_shrink(cfg, world)
    world = inject_vehicles(cfg, world, 4000)
    ticks = 100
    sps, w2 = _steps_per_sec(cfg, world, ticks)
    # pedestrian spawn accounting: the plane design spawns per-sidewalk-
    # cell Bernoulli (aggregate ~Poisson(lam), no per-tick cap)
    ticks_per_day = 86400 // cfg.TIME_PER_STEP_IN_SECONDS
    lam = cfg.PEDESTRIANS_PER_DAY / ticks_per_day
    return {"config": "pedestrians 256x256",
            "steps_per_sec": round(sps, 1),
            "cell_updates_per_sec": round(sps * H * W, 1),
            "active_pedestrians": int(np.asarray(w2.peds.walk).sum()
                                      + np.asarray(w2.peds.cross).sum()),
            "expected_ped_spawns_per_tick": round(lam, 1),
            "active_vehicles": int(np.asarray(w2.vehicles.active).sum()),
            **_cap_diagnostics(cfg, w2)}


def bench_config4():
    """#4: many-world vmapped rollout (parameter-sweep axis) at the
    BASELINE-specified 1024 worlds.  64x64 worlds generated per-seed on
    device, stepped together.  MAX_FIELD_DESTS=32 covers every block a
    64x64 city generates (checked by the emitted unroutable counter —
    the former 16-row cap could silently under-cover some seeds)."""
    n_worlds = int(os.environ.get("BENCH_SWEEP_WORLDS", 1024))
    cfg = Config(WIDTH=64, HEIGHT=64, WALL_THICKNESS=6,
                 SIDEWALK_RING_WIDTH=2, MAX_FIELD_DESTS=32,
                 MAX_VEHICLES=256,
                 INTERNAL_POPULATION_TRAFFIC_PER_DAY=2000,
                 PASSING_POPULATION_TRAFFIC_PER_DAY=500)
    keys = jax.random.split(jax.random.PRNGKey(0), n_worlds)
    init = jax.jit(jax.vmap(functools.partial(init_world, cfg)))
    t0 = time.perf_counter()
    worlds = jax.block_until_ready(init(keys))
    gen_s = time.perf_counter() - t0
    ticks = 50
    step = jax.jit(functools.partial(
        lambda c, ws, n: jax.vmap(
            functools.partial(run_chunk, c, n=n))(ws), cfg, n=ticks),
        donate_argnums=0)
    worlds = jax.block_until_ready(step(worlds))
    t0 = time.perf_counter()
    worlds = jax.block_until_ready(step(worlds))
    dt = time.perf_counter() - t0
    return {"config": f"{n_worlds}-world vmapped rollout 64x64",
            "worlds": n_worlds,
            "generate_all_sec": round(gen_s, 1),
            "cell_updates_per_sec": round(n_worlds * 64 * 64 * ticks / dt,
                                          1),
            "steps_per_sec_per_world": round(ticks / dt, 1),
            **_cap_diagnostics(cfg, worlds)}


def bench_config5():
    """#5: 1024x1024 city, 100k vehicles, on-device RGB framebuffer —
    FULL routability via hierarchical two-level routing (ops/hier.py):
    every block destination routes (the former MAX_FIELD_DESTS=64 run
    left ~5.1k of ~5.2k blocks unroutable, VERDICT r4 missing #1)."""
    from trafficsimulation_tpu.ops.render import render_frame
    from trafficsimulation_tpu.sim import init_world_hier
    cfg = Config(WIDTH=1024, HEIGHT=1024, MAX_VEHICLES=100_000,
                 ROUTING_HIER=True,
                 INTERNAL_POPULATION_TRAFFIC_PER_DAY=100_000,
                 PASSING_POPULATION_TRAFFIC_PER_DAY=20_000)
    cfg, world = init_world_hier(cfg, jax.random.PRNGKey(0))
    world = inject_vehicles(cfg, world, 100_000)
    ticks = 20
    sps, w2 = _steps_per_sec(cfg, world, ticks)
    rend = jax.jit(lambda w: render_frame(
        w.grid, w.stop_map, w.rain_map, w.veh_map, w.vehicles,
        pending_mask=jnp.zeros_like(w.stop_map)))
    fb = jax.block_until_ready(rend(w2))
    t0 = time.perf_counter()
    for _ in range(5):
        fb = jax.block_until_ready(rend(w2))
    render_ms = (time.perf_counter() - t0) / 5 * 1e3
    return {"config": "1024x1024, 100k vehicles + framebuffer",
            "steps_per_sec": round(sps, 1),
            "cell_updates_per_sec": round(sps * 1024 * 1024, 1),
            "active_vehicles": int(np.asarray(w2.vehicles.active).sum()),
            "render_ms": round(render_ms, 2),
            **_cap_diagnostics(cfg, w2)}


def main():
    head = bench_headline()

    configs = {}
    for name, fn, need in (("config1_gen_lights", bench_config1, 240),
                           ("config3_pedestrians", bench_config3, 300),
                           ("config4_world_batch", bench_config4, 480),
                           # hier init adds the windowed-field build +
                           # chunked dense rows: needs real headroom
                           ("config5_1024_100k", bench_config5, 900)):
        if _left() < need:
            configs[name] = {"skipped": "time budget"}
            continue
        try:
            configs[name] = fn()
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            configs[name] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "cell-updates/sec (256x256, 10k vehicles, "
                  f"{head['batch']}-world batch, full routability)",
        "value": head["value"],
        "unit": "cell-updates/sec",
        "vs_baseline": round(head["value"] / 1e9, 4),
        "extra": {
            **{k: v for k, v in head.items() if k != "value"},
            "device": str(jax.devices()[0]),
            "configs": configs,
        },
    }))


if __name__ == "__main__":
    main()
