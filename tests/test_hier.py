"""Hierarchical routing (cfg.ROUTING_HIER, ops/hier.py + gen/hier.py).

Oracle: on a 128x128 world with HIER_TILE=64, every tile's 3x3 window
covers the WHOLE grid, so each destination's windowed static field must
be bit-identical to a full-grid dense static field for that destination
(same value iteration, same key encode, zero dynamic penalties).  The
routing-id arithmetic (`hier_rows`) is checked against a direct numpy
transcription, and an end-to-end run must complete trips with every
block routable."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.sim import init_world_hier, run_chunk
from trafficsimulation_tpu.ops import engine, routing, hier
from trafficsimulation_tpu.ops.hier import hier_params


CFG = Config(WIDTH=128, HEIGHT=128, WALL_THICKNESS=8,
             SIDEWALK_RING_WIDTH=2, MAX_VEHICLES=512,
             MAX_FIELD_DESTS=256, ROUTING_HIER=True,
             INTERNAL_POPULATION_TRAFFIC_PER_DAY=3000,
             PASSING_POPULATION_TRAFFIC_PER_DAY=600)


@pytest.fixture(scope="module")
def hier_world():
    return init_world_hier(CFG, jax.random.PRNGKey(3))


def test_hier_rows_arithmetic_nofixture():
    """Fast tier: the routing-id arithmetic alone (no world build)."""
    cfg = CFG
    hp = hier_params(cfg)
    H, W = cfg.HEIGHT, cfg.WIDTH
    rng = np.random.default_rng(0)
    dest = rng.integers(0, hp.direct_base + 100,
                        size=(H, W)).astype(np.int32)
    p, r = jax.jit(functools.partial(hier.hier_rows, cfg))(
        jnp.asarray(dest))
    yy, xx = np.mgrid[0:H, 0:W]
    tiled = dest < hp.direct_base
    td = np.where(tiled, dest, 0) // hp.lmax
    l = np.where(tiled, dest, 0) - td * hp.lmax
    ty, tx = td // hp.ntx, td % hp.ntx
    dy, dx = ty - yy // hp.ts, tx - xx // hp.ts
    in_win = tiled & (np.abs(dy) <= 1) & (np.abs(dx) <= 1)
    p_ref = np.where(in_win, ((dy + 1) * 3 + dx + 1) * hp.lmax + l, -1)
    r_ref = np.where(tiled, (ty // 2) * hp.nrx + tx // 2,
                     hp.nr + dest - hp.direct_base)
    np.testing.assert_array_equal(np.asarray(p), p_ref)
    np.testing.assert_array_equal(np.asarray(r), r_ref)


@pytest.mark.slow
def test_rid_assignment(hier_world):
    cfg, w = hier_world
    hp = hier_params(cfg)
    rid = np.asarray(w.dests.rid)
    valid = np.asarray(w.dests.valid)
    assert (rid[valid] >= 0).all()
    assert (rid[~valid] == -1).all()
    r = rid[valid]
    assert len(np.unique(r)) == len(r), "routing ids must be unique"
    assert r.max() < (1 << 14) - 1
    # exits are direct rows; entrances/service cells tiled (or overflow)
    kind = np.asarray(w.dests.kind)
    assert (rid[valid & (kind == 1)] >= hp.direct_base).all()
    # the dest plane carries rids at exactly the valid dest cells
    plane = np.asarray(w.grid.dest_id).reshape(-1)
    pos = np.asarray(w.dests.pos)[valid]
    assert (np.sort(plane[plane >= 0]) == np.sort(r)).all()
    assert (plane[pos] == rid[valid]).all()


@pytest.mark.slow
def test_windowed_bytes_match_dense_static(hier_world):
    """At 128^2 / TILE=64 every window covers the whole grid: the local
    byte read through hier_select's plane arithmetic must equal the
    dense static sdir byte of that destination, everywhere."""
    cfg, w = hier_world
    rid = np.asarray(w.dests.rid)
    valid = np.asarray(w.dests.valid)
    kind = np.asarray(w.dests.kind)
    tiled = valid & (rid >= 0) & (rid < hier_params(cfg).direct_base)
    picks = np.nonzero(tiled)[0][::7][:12]

    grid = w.grid
    soft = jnp.zeros(grid.allowed_dirs.shape, jnp.int32)
    hard = jnp.zeros(grid.allowed_dirs.shape, bool)

    @jax.jit
    def dense_byte(pos):
        F = routing.compute_cost_fields(
            cfg, grid.allowed_dirs, grid.road_class, pos[None],
            jnp.ones((1,), bool), is_road=grid.is_road)
        K0 = engine.field_to_keys(cfg, F, grid.road_class)
        return engine.build_sdir(cfg, K0, grid.allowed_dirs,
                                 grid.is_road, soft, hard,
                                 force_xla=True, pack=False)[0]

    @jax.jit
    def local_byte(d):
        dest = jnp.full(grid.allowed_dirs.shape, d, jnp.int32)
        p, _ = hier.hier_rows(cfg, dest)
        return hier.select_planes(w.local_sdir4, p), p

    for i in picks:
        want = np.asarray(dense_byte(w.dests.pos[i]))
        got, p = local_byte(jnp.int32(rid[i]))
        got, p = np.asarray(got), np.asarray(p)
        assert (p >= 0).all(), "window must cover the whole 128^2 grid"
        np.testing.assert_array_equal(
            got, want, err_msg=f"dest {i} (kind {kind[i]}) windowed "
            "bytes differ from the dense static field")


@pytest.mark.slow
def test_hier_world_runs_and_completes(hier_world):
    cfg, w = hier_world
    # all blocks routable: the headline capability
    bs = w.blocks_static
    dest = np.asarray(bs.dest)
    assert (dest[np.asarray(bs.valid)] >= 0).all()
    chunk = jax.jit(functools.partial(run_chunk, cfg, n=300))
    w2 = jax.block_until_ready(chunk(w))
    done = int(w2.metrics.completed_internal) \
        + int(w2.metrics.completed_through)
    created = int(w2.metrics.created_internal) \
        + int(w2.metrics.created_through)
    assert created > 20, f"spawns too low: {created}"
    assert done > 0, "no trips completed under hierarchical routing"
