"""Multi-chip scaling: vmapped world batches sharded over a device mesh.

The reference is single-process with no distributed backend (SURVEY §2.3);
the TPU-native scaling axes are (a) `vmap` over a batch of worlds for
parameter sweeps (BASELINE config #4) and (b) sharding that batch over
ICI with `jax.sharding.NamedSharding` — XLA inserts the collectives.
Light-state reductions for fleet metrics ride `psum` inside `shard_map`
when requested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..sim import init_world, step_world


def make_mesh(n_devices: int | None = None, axis: str = "worlds") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def init_world_batch(cfg: Config, key, n_worlds: int, mesh: Mesh | None):
    """Generate a batch of worlds, sharded across the mesh's `worlds`
    axis.  Sharding the PRNG keys is sufficient: XLA propagates the
    batch-dim sharding through the vmapped generator, keeping each world
    resident on its own device."""
    keys = jax.random.split(key, n_worlds)
    if mesh is not None:
        keys = jax.device_put(keys, NamedSharding(mesh, P("worlds")))
    return jax.jit(jax.vmap(functools.partial(init_world, cfg)))(keys)


def batched_step(cfg: Config):
    """vmapped world step; under jit with sharded inputs XLA keeps every
    world resident on its own chip (fully data-parallel — no cross-world
    communication is required by the model)."""
    return jax.vmap(functools.partial(step_world, cfg))


def run_batch(cfg: Config, worlds, n_ticks: int):
    step = batched_step(cfg)

    def body(ws, _):
        return step(ws), None

    worlds, _ = jax.lax.scan(body, worlds, None, length=n_ticks)
    return worlds


def fleet_metrics(worlds):
    """Cross-world aggregate metrics (completed trips, live vehicles) —
    one all-reduce over the worlds axis when sharded."""
    m = worlds.metrics
    return dict(
        completed=jnp.sum(m.completed_internal + m.completed_through),
        created=jnp.sum(m.created_internal + m.created_through
                        + m.created_service),
        live=jnp.sum(worlds.vehicles.active))
