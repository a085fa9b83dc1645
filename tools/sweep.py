#!/usr/bin/env python
"""Batched world sweeps (BASELINE config #4): generate N city variants
under vmap — optionally sweeping a generation parameter across the
batch is done by grouping runs per value (parameters are jit-static) —
roll them out in one fused scan, and report fleet metrics.

Usage:
    python tools/sweep.py --worlds 64 --size 128 --ticks 200
    python tools/sweep.py --worlds 16 --sweep MIN_BLOCK_SPACING 4 8 12
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.parallel.mesh import (make_mesh,
                                                 init_world_batch,
                                                 run_batch, fleet_metrics,
                                                 assert_demand_window)


def run_group(cfg: Config, n_worlds: int, ticks: int, seed: int,
              use_mesh: bool):
    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        n_dev = max(d for d in range(1, len(jax.devices()) + 1)
                    if n_worlds % d == 0)
        mesh = make_mesh(n_dev)
    worlds = init_world_batch(cfg, jax.random.PRNGKey(seed), n_worlds, mesh)
    worlds = jax.block_until_ready(worlds)
    # shrunk CAP_OVERRIDES are measured from ONE world; a different seed
    # can overflow a padded table silently (VERDICT r2 weak #9)
    if cfg.CAP_OVERRIDES:
        from trafficsimulation_tpu.sim import assert_world_fits
        assert_world_fits(cfg, worlds)
    roll = jax.jit(functools.partial(run_batch, cfg, n_ticks=ticks))
    # the in-run_batch demand guard is a no-op under jit tracing — check
    # the CONCRETE worlds before each compiled rollout (2x ticks total)
    assert_demand_window(cfg, worlds, 2 * ticks)
    worlds = jax.block_until_ready(roll(worlds))   # compile + warm
    t0 = time.perf_counter()
    worlds = jax.block_until_ready(roll(worlds))
    dt = time.perf_counter() - t0
    fm = {k: int(v) for k, v in fleet_metrics(worlds).items()}
    fm["wall_s"] = round(dt, 2)
    fm["cell_updates_per_sec"] = round(
        n_worlds * cfg.WIDTH * cfg.HEIGHT * ticks / dt, 1)
    fm["avg_completed_per_world"] = fm["completed"] / n_worlds
    return fm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--ticks", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-mesh", action="store_true")
    ap.add_argument("--sweep", nargs="+", default=None,
                    metavar=("PARAM", "VALUES"),
                    help="config field name followed by values")
    args = ap.parse_args()

    base = Config(WIDTH=args.size, HEIGHT=args.size,
                  WALL_THICKNESS=max(6, args.size // 12),
                  MAX_FIELD_DESTS=min(256, args.size),
                  MAX_VEHICLES=args.size * args.size // 16,
                  INTERNAL_POPULATION_TRAFFIC_PER_DAY=2000,
                  PASSING_POPULATION_TRAFFIC_PER_DAY=500)

    if args.sweep:
        name, *values = args.sweep
        cur = getattr(base, name)
        cast = type(cur)
        for v in values:
            cfg = base.replace(**{name: cast(v)})
            fm = run_group(cfg, args.worlds, args.ticks, args.seed,
                           not args.no_mesh)
            print(json.dumps({name: cast(v), **fm}))
    else:
        fm = run_group(base, args.worlds, args.ticks, args.seed,
                       not args.no_mesh)
        print(json.dumps(fm))


if __name__ == "__main__":
    main()
