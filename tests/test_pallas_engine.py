"""The Pallas decide+movement kernel is bit-identical to the XLA path:
both executors run `decide_move_core` with the same random inputs, so
planes must match exactly (interpreter mode stands in for TPU here)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu.ops import engine, pallas_engine
from trafficsimulation_tpu.sim import _enter_engine

from test_engine import make_world, put_vehicle, two_lane_road, CFG, H, W


def _setup():
    cell, dirs, rc, dest_cell = two_lane_road()
    world = make_world(CFG, cell, dirs, rc, [dest_cell])
    world = put_vehicle(world, 0, 4 * W + 10, dest=0, parked=True)
    world = put_vehicle(world, 1, 4 * W + 7, dest=0)
    world = put_vehicle(world, 2, 4 * W + 3, dest=0)
    world = put_vehicle(world, 3, 5 * W + 20, dest=0, heading=3)
    es = _enter_engine(CFG, world)
    sdir = engine.routing_planes(CFG, world, es)
    return world, es, sdir


def test_pallas_kernel_matches_xla_core():
    world, es, sdir = _setup()
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    randoms = (jax.random.uniform(k1, (H, W)),
               jax.random.uniform(k2, (H, W)),
               jax.random.randint(k3, (H, W), CFG.VEHICLE_MIN_SPEED,
                                  CFG.VEHICLE_MAX_SPEED + 1),
               jax.random.bits(k4, (H, W)))
    planes = (es.pa, es.pb, es.pc, es.pd, es.pe, es.pl)
    stop = jnp.zeros((H, W), bool)
    ped = jnp.zeros((H, W), bool)
    grid = world.grid

    from trafficsimulation_tpu.ops.routing import _shift_plane
    sd, wnd, _density = sdir
    ref = pallas_engine.decide_move_core(
        CFG, _shift_plane, lambda d: engine.select_dest_rows(sd, d), wnd,
        *planes, stop, es.rain_map, ped, grid.intersection, grid.dest_id,
        *randoms)

    got = pallas_engine.decide_move_pallas(
        CFG, sd, wnd, planes, stop, es.rain_map, ped,
        grid.intersection, grid.dest_id, randoms, interpret=True)

    names = ("pa", "pb", "pc", "pd", "pe", "pl", "flags")
    for n, a, b in zip(names, ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"plane {n} diverges between XLA core and Pallas kernel"
    # sanity: something actually happened
    assert (np.asarray(ref[6]) & pallas_engine.FLAG_MOVED).any()


def test_tiled_kernel_matches_core():
    """The halo-tiled fused kernel is bit-identical to the whole-grid
    core across tile boundaries (the TILE_HALO ring absorbs window-edge
    contamination), even at dense random occupancy and tiny tiles."""
    from trafficsimulation_tpu.config import Config
    from trafficsimulation_tpu.ops.routing import _shift_plane

    Hh, Ww, D = 64, 64, 8
    cfg = Config(WIDTH=Ww, HEIGHT=Hh, RAIN_ENABLED=True,
                 VEHICLE_MALFUNCTION_ACTIVE=True,
                 VEHICLE_SIDESWIPE_COLLISION_ACTIVE=True,
                 VEHICLE_MIN_SPEED=1, VEHICLE_MAX_SPEED=5,
                 MAX_VEHICLES=64, MAX_FIELD_DESTS=8)
    for seed in (0, 3):
        ks = jax.random.split(jax.random.PRNGKey(seed), 16)
        sdir = engine.pack_sdir4(jax.random.randint(
            ks[0], (D, Hh, Ww), 0, 256).astype(jnp.uint8))
        # packed per-direction wavefront word: 4 random bytes in 0..15
        wb = jax.random.randint(ks[1], (4, Hh, Ww), 0, 16)
        wnd = (wb[0] | (wb[1] << 8) | (wb[2] << 16)
               | (wb[3] << 24)).astype(jnp.int32)
        planes = tuple(jax.random.bits(ks[i + 2], (Hh, Ww))
                       for i in range(5)) + (
            jax.random.uniform(ks[7], (Hh, Ww)),)
        stop = jax.random.bernoulli(ks[8], 0.15, (Hh, Ww))
        rain = jax.random.bernoulli(ks[9], 0.1, (Hh, Ww))
        ped = jax.random.bernoulli(ks[10], 0.02, (Hh, Ww))
        inter = jax.random.bernoulli(ks[11], 0.1, (Hh, Ww))
        dest = jax.random.randint(ks[12], (Hh, Ww), -1, D)
        randoms = (jax.random.uniform(ks[13], (Hh, Ww)),
                   jax.random.uniform(ks[14], (Hh, Ww)),
                   jax.random.randint(ks[15], (Hh, Ww), 1, 6),
                   jax.random.bits(ks[0], (Hh, Ww)))
        ref = pallas_engine.decide_move_core(
            cfg, _shift_plane,
            lambda d: engine.select_dest_rows(sdir, d), wnd,
            *planes, stop, rain, ped, inter, dest, *randoms)
        got = pallas_engine.decide_move_tiled(
            cfg, sdir, wnd, planes, stop, rain, ped, inter, dest,
            randoms, th=16, tw=32, interpret=True)
        for n, a, b in zip(("pa", "pb", "pc", "pd", "pe", "pl", "flags"),
                           ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (seed, n)


def test_shift_roll_matches_shift_plane():
    """The kernel's roll+fill shift equals the padded-shift used by the
    XLA path for all four directions and several dtypes."""
    from trafficsimulation_tpu.ops.routing import _shift_plane
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(0, 255, size=(8, 16), dtype=np.uint8))
    x32 = jnp.asarray(rng.integers(0, 2**31, size=(8, 16)).astype(np.int32))

    def roll_host(x, d, fill):
        # reimplementation of pallas_engine._shift_roll with jnp.roll for
        # host-side comparison (pltpu.roll needs a kernel context)
        from trafficsimulation_tpu import codes as C
        Hh, Ww = x.shape
        if d == C.N_IDX:
            r = jnp.roll(x, -1, 0)
            edge = jnp.arange(Hh)[:, None] == Hh - 1
        elif d == C.S_IDX:
            r = jnp.roll(x, 1, 0)
            edge = jnp.arange(Hh)[:, None] == 0
        elif d == C.E_IDX:
            r = jnp.roll(x, -1, 1)
            edge = jnp.arange(Ww)[None, :] == Ww - 1
        else:
            r = jnp.roll(x, 1, 1)
            edge = jnp.arange(Ww)[None, :] == 0
        return jnp.where(edge, jnp.asarray(fill, x.dtype), r)

    for d in range(4):
        for x, fill in ((x8, 0xF), (x32, 123)):
            a = _shift_plane(x, d, jnp.asarray(fill, x.dtype))
            b = roll_host(x, d, fill)
            assert np.array_equal(np.asarray(a), np.asarray(b)), d


def test_wavefront_kernel_matches_core():
    """The VMEM-resident wavefront kernel == the padded-shift core on
    random geometry (interpret mode) and on the engine test world."""
    from trafficsimulation_tpu.config import Config
    from trafficsimulation_tpu.ops.routing import _shift_plane
    cfg = Config(WIDTH=32, HEIGHT=32,
                 VEHICLE_MAX_CONTRAFLOW_OVERTAKE_STEPS=6)
    rng = np.random.default_rng(2)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        allowed = jnp.asarray(
            rng.integers(0, 16, (32, 32)).astype(np.int32))
        road = jnp.asarray(rng.random((32, 32)) < 0.5)
        hard = jnp.asarray(rng.random((32, 32)) < 0.1) & road
        ref = pallas_engine.wavefront_core(cfg, _shift_plane, allowed,
                                           road, hard)
        got = pallas_engine.build_wavefront_pallas(cfg, allowed, road,
                                                   hard, interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), seed


def test_prefix_kernel_matches_xla():
    """The fused inclusive-prefix kernel == the XLA log-shift doubling
    on random planes of several shapes (incl. non-square)."""
    rng = np.random.default_rng(4)
    for Hh, Ww in ((8, 16), (32, 32), (16, 64)):
        occ = jnp.asarray(rng.integers(0, 2, (Hh, Ww)).astype(np.int32))
        x = occ
        s = 1
        while s < Ww:
            x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :Ww]
            s *= 2
        y = occ
        s = 1
        while s < Hh:
            y = y + jnp.pad(y, ((s, 0), (0, 0)))[:Hh]
            s *= 2
        gh, gv = pallas_engine.prefix_planes_pallas(occ, interpret=True)
        assert np.array_equal(np.asarray(x), np.asarray(gh)), (Hh, Ww)
        assert np.array_equal(np.asarray(y), np.asarray(gv)), (Hh, Ww)


def test_batched_sdir_kernel_matches_single():
    """The batched sdir kernel (shared candidate stack read once per
    batch, grid=(dest-block, world)) writes EXACTLY what the single-world
    kernel writes per world, for random stacks/penalties including
    blocked (BIG) and unreachable (INF_U16) entries."""
    rng = np.random.default_rng(5)
    D, Hh, Ww, B = 8, 16, 128, 3
    Q = rng.integers(0, 70000, (D, 4, Hh, Ww)).astype(np.uint16)
    pen = rng.integers(0, 3000, (B, 4, Hh, Ww)).astype(np.int32)
    pen = np.where(rng.random((B, 4, Hh, Ww)) < 0.1, 1 << 17, pen)
    legal = (rng.random((4, Hh, Ww)) < 0.6).astype(np.int32)
    K0 = engine.costs_u16_to_keys(jnp.asarray(Q))
    single = np.stack([
        np.asarray(pallas_engine.build_sdir_pallas(
            CFG, K0, jnp.asarray(pen[b]), jnp.asarray(legal),
            interpret=True)) for b in range(B)])
    batched = np.asarray(pallas_engine.build_sdir_pallas_batched(
        CFG, K0, jnp.asarray(pen), jnp.asarray(legal),
        interpret=True))
    assert np.array_equal(single, batched)


def test_sdir_kernel_matches_xla_build():
    """The packed-key kernel encode (bits, tie order, contra flag,
    straight bits, none detection) is EXACTLY engine.build_sdir's XLA
    reference, including unreachable (INF_U16) rows and hard-blocked
    (2^17-penalty) moves."""
    rng = np.random.default_rng(9)
    D, Hh, Ww = 8, 16, 128
    cfg = CFG
    Q = rng.integers(0, 60000, (D, 4, Hh, Ww)).astype(np.uint16)
    Q = np.where(rng.random(Q.shape) < 0.15, 65535, Q).astype(np.uint16)
    allowed = rng.integers(0, 16, (Hh, Ww)).astype(np.uint8)
    is_road = rng.random((Hh, Ww)) < 0.7
    soft2 = rng.integers(0, 5000, (Hh, Ww)).astype(np.int32)
    hard = rng.random((Hh, Ww)) < 0.1
    K0 = engine.costs_u16_to_keys(jnp.asarray(Q))
    xla = np.asarray(engine.build_sdir(
        cfg, K0, jnp.asarray(allowed), jnp.asarray(is_road),
        jnp.asarray(soft2), jnp.asarray(hard)))
    legal, pen_m, _ = engine._entry_costs(
        cfg, jnp.asarray(allowed), jnp.asarray(is_road),
        jnp.asarray(soft2), jnp.asarray(hard))
    pen4 = jnp.stack(pen_m)
    legal4 = jnp.stack([l.astype(jnp.int32) for l in legal])
    kern = np.asarray(pallas_engine.build_sdir_pallas(
        cfg, K0, pen4, legal4, interpret=True))
    assert np.array_equal(xla, kern)
