"""Multi-chip path: vmapped world batch sharded over the 8-device CPU
mesh (the CPU stand-in for ICI — SURVEY §2.3)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trafficsimulation_tpu.sim import init_world, step_world


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_world_batch(small_cfg):
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("worlds",))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    keys = jax.device_put(keys, NamedSharding(mesh, P("worlds")))

    init = jax.jit(jax.vmap(functools.partial(init_world, small_cfg)))
    worlds = init(keys)
    step = jax.jit(jax.vmap(functools.partial(step_world, small_cfg)))
    w1 = step(worlds)
    w2 = step(w1)
    assert int(w2.tick[0]) == 2
    # each world evolved independently and stayed sharded
    assert w2.veh_map.shape[0] == 8
    total = jax.jit(lambda ws: jnp.sum(ws.metrics.created_internal
                                       + ws.metrics.created_through))(w2)
    assert int(total) >= 0

    # sharded batch matches an unsharded single world (world 0)
    w_single = jax.jit(functools.partial(init_world, small_cfg))(
        jax.random.split(jax.random.PRNGKey(0), 8)[0])
    s_single = jax.jit(functools.partial(step_world, small_cfg))
    w_single = s_single(s_single(w_single))
    assert (np.asarray(w2.veh_map[0]) == np.asarray(w_single.veh_map)).all()


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out.tick) == int(args[0].tick) + 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_mesh_helpers(small_cfg):
    from trafficsimulation_tpu.parallel.mesh import (
        make_mesh, init_world_batch, run_batch, fleet_metrics)
    mesh = make_mesh(4)
    worlds = init_world_batch(small_cfg, jax.random.PRNGKey(0), 4, mesh)
    worlds = jax.jit(functools.partial(run_batch, small_cfg,
                                       n_ticks=3))(worlds)
    fm = fleet_metrics(worlds)
    assert int(worlds.tick[0]) == 3
    assert int(fm["created"]) >= 0
