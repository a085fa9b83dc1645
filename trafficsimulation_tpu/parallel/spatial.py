"""Spatial sharding: ONE world partitioned across the device mesh.

The world-batch axis (`parallel.mesh`) is the data-parallel scaling
dimension; THIS module is the sequence/context-parallel analogue for the
grid CA (SURVEY §2.3 "halo exchange via ppermute if a single world is
ever spatially sharded"): every `[..., H, W]` plane of the `World` is
partitioned along H over a 1-D mesh axis ``y``, and the simulation step
is jitted over the sharded pytree.  XLA's SPMD partitioner then turns
the engine's neighbor shifts (`ops.routing._shift_plane` pads) into halo
exchanges (collective-permutes over ICI) and the plane/metric reductions
into all-reduces — the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert the collectives.

When to use: a single world too big (or too hot) for one chip.  At
1024x1024 the `[D, 4, H, W]` u16 routing stack dominates HBM; splitting
H over k chips divides both its residency and the per-segment
`build_sdir` stream k ways.

The fused whole-grid Pallas kernels are single-device programs the
partitioner cannot see into, so the spatial path forces the XLA executor
(`USE_PALLAS_ENGINE=False`); on-chip fusion inside each shard is XLA's
job here.

Tested against the unsharded step for bit-equality of every integer
plane on the CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..sim import run_chunk


def spatial_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("y",))


def world_shardings(world, mesh: Mesh):
    """NamedSharding pytree for a `World`: arrays whose trailing dims are
    the grid planes shard along H (rows); per-entity tables, demand,
    RL/optimizer state and scalars replicate.  Replicated small tables
    are the right call: they are KB-scale and consumed by scalar
    gathers/scatters that would otherwise each need an all-gather."""
    H, W = world.grid.cell_type.shape
    ny = mesh.devices.shape[0]
    if H % ny:
        raise ValueError(f"grid height {H} not divisible by the mesh's "
                         f"{ny} devices")

    def spec(a):
        if a.ndim >= 2 and tuple(a.shape[-2:]) == (H, W):
            return NamedSharding(
                mesh, P(*([None] * (a.ndim - 2) + ["y", None])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, world)


def shard_world(world, mesh: Mesh):
    """Lay one world out over the mesh (grid planes split along H)."""
    return jax.tree.map(jax.device_put, world, world_shardings(world, mesh))


@functools.lru_cache(maxsize=32)
def spatial_chunk_fn(cfg: Config, n_ticks: int):
    """Jitted n-tick runner for a spatially-sharded world (cached per
    (cfg, n_ticks) so repeated calls reuse the compiled program).
    Forces the XLA executor everywhere — USE_PALLAS_ENGINE=False now
    gates EVERY pallas_call (decide+move, sdir build, select, wavefront,
    prefix sums): the SPMD partitioner cannot partition a single-device
    pallas_call, so the spatial path must be pure XLA.  Semantics are
    identical to the Pallas path (tests/test_pallas_engine.py
    equivalence)."""
    cfg2 = cfg.replace(USE_PALLAS_ENGINE=False)
    return jax.jit(functools.partial(run_chunk, cfg2, n=n_ticks))


def run_chunk_spatial(cfg: Config, world, n_ticks: int, mesh: Mesh):
    """Advance a single world n ticks, partitioned across the mesh."""
    return spatial_chunk_fn(cfg, n_ticks)(shard_world(world, mesh))
