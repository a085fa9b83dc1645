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


def demand_ticks_remaining(worlds) -> int:
    """Host-side: how many more ticks the pre-generated trip table
    covers, min over the batch (last valid depart tick − current tick).
    Accepts a single world, a fully-batched batch (per-world tables) or
    a shared-geometry batch (one table, per-world cursors)."""
    dem = worlds.demand
    depart = np.asarray(dem.depart_tick)
    valid = np.asarray(dem.valid)
    tick = np.asarray(worlds.tick)
    last = np.where(valid, depart, -1).max(axis=-1)   # scalar or [B]
    return int(np.min(last) - np.max(tick))


def assert_demand_window(cfg: Config, worlds, n_ticks: int) -> None:
    """Fail LOUDLY when a batched rollout would outrun the pre-generated
    demand table (VERDICT r3 weak #5): the host wrapper regenerates at
    this point (`sim.TrafficSim._maybe_extend_demand`), but a batched
    scan cannot — past the table, spawning silently stops (the reference
    regenerates at day rollover, `dynamic_traffic_generator.py:161-179`).

    No-op under tracing (a jitted caller cannot host-check; `tools/
    sweep.py` and any custom jit wrapper must call this on the CONCRETE
    worlds before invoking the compiled rollout, as the batch runners
    below do on their plain-host path)."""
    if isinstance(worlds.tick, jax.core.Tracer):
        return
    rem = demand_ticks_remaining(worlds)
    if n_ticks > rem:
        dt = cfg.TIME_PER_STEP_IN_SECONDS
        raise RuntimeError(
            f"batched rollout of {n_ticks} ticks outruns the pre-"
            f"generated demand table ({rem} ticks of coverage left at "
            f"tick {int(np.max(np.asarray(worlds.tick)))}): spawning "
            "would silently stop mid-rollout.  Regenerate the table "
            "first (agents.demand.generate_days from the current day, "
            f"as sim.TrafficSim._maybe_extend_demand does), raise "
            f"DEMAND_PREGEN_DAYS (= {cfg.DEMAND_PREGEN_DAYS}, "
            f"{int(cfg.DEMAND_PREGEN_DAYS * 86400 / dt)} ticks), or "
            "roll out in shorter chunks re-generating between them.")


def run_batch(cfg: Config, worlds, n_ticks: int):
    assert_demand_window(cfg, worlds, n_ticks)
    step = batched_step(cfg)

    def body(ws, _):
        return step(ws), None

    worlds, _ = jax.lax.scan(body, worlds, None, length=n_ticks)
    return worlds


# World fields that are pure geometry / static tables: identical across
# rollouts of the SAME city, so shared-geometry batches map them with
# in_axes=None (one HBM copy for the whole batch).  Everything else is
# per-world dynamic state (axis 0).  The demand TABLE is shared too —
# same city, same trip schedule; only its consumption cursor is
# per-world.  Rollout divergence comes from the per-world step keys
# (conflict priorities, faults, rain).
SHARED_GEOMETRY_FIELDS = frozenset({
    "grid", "lights_static", "groups_static", "blocks_static", "dests",
    "cost_field", "nearest_exit", "local_sdir4"})
_DEMAND_DYNAMIC = frozenset({"cursor"})


def shared_geometry_axes(world):
    """vmap in_axes / out_axes prefix tree for a shared-geometry batch."""
    import dataclasses
    dem = world.demand
    dem_axes = type(dem)(**{
        f.name: (0 if f.name in _DEMAND_DYNAMIC else None)
        for f in dataclasses.fields(dem)})
    return type(world)(**{
        f.name: (None if f.name in SHARED_GEOMETRY_FIELDS
                 else dem_axes if f.name == "demand" else 0)
        for f in dataclasses.fields(world)})


def tile_dynamic(world, keys):
    """Batch ONE world for shared-geometry rollouts: dynamic leaves gain
    a leading batch dim (one per key), geometry stays unbatched.  The
    [D, 4, H, W] routing stack — 335 MB/world at the 256x256 judged
    config — exists ONCE for the whole batch, so batch size is no longer
    HBM-capped by it (the RL-training / ensemble-rollout use case:
    many stochastic rollouts of the same city)."""
    import dataclasses
    B = keys.shape[0]

    def bcast(v):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (B,) + jnp.shape(a)), v)

    out = {}
    for f in dataclasses.fields(world):
        n = f.name
        v = getattr(world, n)
        if n in SHARED_GEOMETRY_FIELDS:
            out[n] = v
        elif n == "key":
            out[n] = keys
        elif n == "demand":
            import dataclasses as dc
            out[n] = type(v)(**{
                g.name: (bcast(getattr(v, g.name))
                         if g.name in _DEMAND_DYNAMIC
                         else getattr(v, g.name))
                for g in dc.fields(v)})
        else:
            out[n] = bcast(v)
    return type(world)(**out)


def run_batch_shared(cfg: Config, batch, n_ticks: int):
    """Advance a shared-geometry batch (see `tile_dynamic`) n_ticks.
    Semantically identical to the fully-batched `run_batch` given equal
    per-world state (tested in tests/test_parallel.py)."""
    from ..sim import run_chunk
    from ..lights.fsm import dense_reducers_profitable
    assert_demand_window(cfg, batch, n_ticks)
    axes = shared_geometry_axes(batch)
    # dense MXU light reductions: the one-hot geometry matrix is
    # unbatched (built from the shared grid), so vmap turns the per-world
    # matvec into ONE batch matmul whose matrix is read from HBM once
    dense = dense_reducers_profitable(cfg)
    return jax.vmap(functools.partial(run_chunk, cfg, n=n_ticks,
                                      dense_reducers=dense),
                    in_axes=(axes,), out_axes=axes)(batch)


def fleet_metrics(worlds):
    """Cross-world aggregate metrics (completed trips, live vehicles) —
    one all-reduce over the worlds axis when sharded."""
    m = worlds.metrics
    return dict(
        completed=jnp.sum(m.completed_internal + m.completed_through),
        created=jnp.sum(m.created_internal + m.created_through
                        + m.created_service),
        live=jnp.sum(worlds.vehicles.active))
