#!/usr/bin/env python
"""Benchmark: cell-updates/sec on the BASELINE headline config
(256x256 grid, 10k vehicles — BASELINE.json `metric`).

Measures the fused `step_world` under `lax.scan`:
  * single world: sim steps/sec with 10k active vehicles
  * vmapped world batch (data-parallel sweep axis, BASELINE config #4):
    aggregate cell-updates/sec = worlds * H * W * steps / time

Prints ONE JSON line for the driver.
"""

import functools
import json
import os
import sys
import time

import jax

# persistent XLA compilation cache: repeated bench/driver runs skip the
# multi-minute generation-pipeline compile
os.makedirs("/tmp/tsim_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tsim_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.sim import init_world, run_chunk, \
    measure_and_shrink

H = W = 256
N_VEHICLES = 10_000
TICKS = 100
BATCH = 40


def inject_vehicles(cfg, world, n, seed=0):
    """Synthetic dense load: n vehicles on random reachable road cells."""
    rng = np.random.default_rng(seed)
    field = np.asarray(world.cost_field.min(axis=1))      # u16 [D, H, W]
    DF = field.shape[0]
    dvalid = np.asarray(world.dests.valid)[:DF]
    dids = np.nonzero(dvalid)[0]
    reach = (field[dids[0]] < 65535).reshape(-1)
    road = np.asarray(world.grid.is_road).reshape(-1)
    occ_ok = np.asarray(world.veh_map).reshape(-1) < 0
    cells = np.nonzero(reach & road & occ_ok)[0]
    n = min(n, len(cells), world.vehicles.active.shape[0])
    pos = rng.choice(cells, size=n, replace=False).astype(np.int32)
    dest = dids[rng.integers(0, len(dids), size=n)].astype(np.int32)

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
        idx.astype(jnp.int32)).reshape(H, W)
    return world.replace(vehicles=v, veh_map=vm)


_T0 = time.perf_counter()


def main():
    cfg = Config(WIDTH=W, HEIGHT=H, MAX_VEHICLES=N_VEHICLES,
                 MAX_FIELD_DESTS=640)
    key = jax.random.PRNGKey(0)

    world = jax.jit(functools.partial(init_world, cfg))(key)
    # measured capacities: every padded-table op (scatters, dest gathers)
    # shrinks to what this world actually contains
    cfg, world = measure_and_shrink(cfg, world)
    n_dests = int(np.asarray(world.dests.valid).sum())
    bs = world.blocks_static
    unroutable = int((np.asarray(bs.valid) & (
        (np.asarray(bs.dest) < 0) |
        (np.asarray(bs.dest) >= world.cost_field.shape[0]))).sum())
    world = inject_vehicles(cfg, world, N_VEHICLES)
    world = jax.block_until_ready(world)

    chunk = jax.jit(functools.partial(run_chunk, cfg, n=TICKS))
    world2 = jax.block_until_ready(chunk(world))   # compile + warm
    t0 = time.perf_counter()
    world2 = jax.block_until_ready(chunk(world2))
    dt_single = time.perf_counter() - t0
    steps_per_sec = TICKS / dt_single

    # ---- batched worlds (same world replicated; the engine is identical
    # per world, so replication measures true batched throughput).  The
    # batch size is memory-bound by the per-world routing-field stack
    # ([D, 4, H, W] u16 — 335 MB at full-routability D=640), so size it
    # to ~10 GB of fields + planes out of the chip's 16 GB HBM.
    t_start = time.perf_counter()
    try:
        if t_start - _T0 > 900:
            raise TimeoutError("skip batch measurement (time budget)")
        world_bytes = sum(np.asarray(x).nbytes
                          for x in jax.tree_util.tree_leaves(world))
        batch = max(1, min(BATCH, int(7.5e9 / max(world_bytes, 1))))
        worlds = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), world)
        bstep = jax.jit(functools.partial(
            lambda c, ws, n: jax.vmap(
                functools.partial(run_chunk, c, n=n))(ws), cfg, n=TICKS),
            donate_argnums=0)
        worlds = jax.block_until_ready(bstep(worlds))
        t0 = time.perf_counter()
        worlds = jax.block_until_ready(bstep(worlds))
        dt_batch = time.perf_counter() - t0
        cups = batch * H * W * TICKS / dt_batch
        batch_ok = True
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        cups = H * W * steps_per_sec
        batch_ok = False
        batch = 1

    active = int(world2.vehicles.active.sum())
    single_cups = H * W * steps_per_sec
    best_cups = max(cups if batch_ok else 0.0, single_cups)
    best_batch = batch if (batch_ok and cups > single_cups) else 1
    print(json.dumps({
        "metric": "cell-updates/sec (256x256, 10k vehicles, "
                  f"{best_batch}-world batch)",
        "value": round(best_cups, 1),
        "unit": "cell-updates/sec",
        "vs_baseline": round(best_cups / 1e9, 4),
        "extra": {
            "single_world_steps_per_sec": round(steps_per_sec, 2),
            "single_world_cell_updates_per_sec": round(single_cups, 1),
            "batched_cell_updates_per_sec": round(cups, 1) if batch_ok
            else None,
            "active_vehicles": active,
            "n_dests": n_dests,
            "blocks_unroutable_no_field": unroutable,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
