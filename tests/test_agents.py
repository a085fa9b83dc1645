"""Agent subsystems: demand layout, blocks, rain, pedestrians, service,
RL controllers, checkpoint round-trip."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.agents.demand import (trip_layout,
                                                 largest_remainder)
from trafficsimulation_tpu.agents.blocks import step_blocks
from trafficsimulation_tpu.agents.rain import init_rain_state, step_rain
from trafficsimulation_tpu.sim import init_world, step_world, TrafficSim


def test_largest_remainder_quotas():
    # `compute_quotas` semantics (`dynamic_traffic_generator.py:319-331`)
    shares = [z.through_distribution for z in Config().TIME_ZONES]
    q = largest_remainder(50, shares)
    assert sum(q) == 50
    assert all(x >= 0 for x in q)


def test_trip_layout_counts():
    cfg = Config()
    lay = trip_layout(cfg)
    kinds = np.asarray(lay.kind)
    # service totals are exact
    assert (kinds == 2).sum() == cfg.TOTAL_SERVICE_VEHICLES_FOOD
    assert (kinds == 3).sum() == cfg.TOTAL_SERVICE_VEHICLES_WASTE
    # internal counts = sum of round(P * frac) over zone distributions
    expect = sum(round(cfg.INTERNAL_POPULATION_TRAFFIC_PER_DAY * f)
                 for z in cfg.TIME_ZONES
                 for (_, _, f) in z.internal_distribution)
    assert (kinds == 0).sum() == expect
    # through: round(P * share) minus the zone's service quota, floored 0
    fq = largest_remainder(cfg.TOTAL_SERVICE_VEHICLES_FOOD,
                           [z.through_distribution for z in cfg.TIME_ZONES])
    wq = largest_remainder(cfg.TOTAL_SERVICE_VEHICLES_WASTE,
                           [z.through_distribution for z in cfg.TIME_ZONES])
    expect_thr = sum(max(0, round(cfg.PASSING_POPULATION_TRAFFIC_PER_DAY
                                  * z.through_distribution) - fq[i] - wq[i])
                     for i, z in enumerate(cfg.TIME_ZONES))
    assert (kinds == 1).sum() == expect_thr


def test_block_resources_gradual(small_world):
    cfg = Config()
    bs = small_world.blocks_static
    st = small_world.blocks
    needs = np.asarray(bs.needs_food)
    start_food = np.asarray(st.food).copy()
    for t in range(120):
        st = step_blocks(cfg, bs, st, jnp.int32(t))
    food = np.asarray(st.food)
    # food-consuming blocks lost roughly inner_count * ticks / 50 units
    inner = np.asarray(bs.inner_count)
    exp = np.minimum(start_food, inner * 120 / cfg.FOOD_CONSUMPTION_TICKS)
    got = start_food - food
    assert np.all(got[needs] >= np.floor(exp[needs]) - 1)
    # waste grows on producing blocks, clamped to capacity
    waste = np.asarray(st.waste)
    produces = np.asarray(bs.produces_waste)
    assert (waste[produces] >= 0).all()
    assert (waste <= np.asarray(bs.waste_cap) + 1e-5).all()


def test_rain_lifecycle():
    cfg = Config(RAIN_SPAWN_CHANCE=1.0, RAIN_RADIUS_MIN=5, RAIN_RADIUS_MAX=8)
    rain = init_rain_state(cfg)
    key = jax.random.PRNGKey(0)
    step = jax.jit(functools.partial(step_rain, cfg, 64, 64))
    seen_rain = False
    for i in range(30):
        key, k = jax.random.split(key)
        rain, rmap = step(rain, k)
        if bool(rmap.any()):
            seen_rain = True
    assert seen_rain
    assert int(rain.active.sum()) <= cfg.RAIN_OCCURRENCES_MAX


def test_service_vehicles_run(small_cfg):
    # service departure times are spread across each 3-hour zone
    # (`dynamic_traffic_generator.py:363-377`), so the first truck leaves
    # around tick ~450 with default clocks; drive far enough for it to
    # reach a block and start servicing.
    cfg = small_cfg.replace(TOTAL_SERVICE_VEHICLES_FOOD=20,
                            TOTAL_SERVICE_VEHICLES_WASTE=20,
                            INTERNAL_POPULATION_TRAFFIC_PER_DAY=200,
                            PASSING_POPULATION_TRAFFIC_PER_DAY=100)
    sim = TrafficSim(cfg, seed=3)
    progressed = False
    for _ in range(6):
        sim.step(250)
        w = sim.world
        kinds = np.asarray(w.vehicles.kind)
        active = np.asarray(w.vehicles.active)
        phases = np.asarray(w.vehicles.service_phase)
        moved = np.asarray(w.vehicles.steps_traveled) > 0
        progressed = bool(
            (active & (kinds >= 2) & ((phases >= 1) | moved)).any()
            or int(w.metrics.completed_service) > 0)
        if progressed:
            break
    assert int(sim.world.metrics.created_service) > 0
    assert progressed


def test_pedestrians_walk_on_sidewalks(small_cfg):
    from trafficsimulation_tpu import codes as C
    cfg = small_cfg.replace(PEDESTRIANS_ENABLED=True,
                            PEDESTRIANS_PER_DAY=50000)
    sim = TrafficSim(cfg, seed=1)
    sim.step(100)
    w = sim.world
    active = np.asarray(w.peds.active)
    assert active.sum() > 0
    pos = np.asarray(w.peds.pos)[active]
    ct = np.asarray(w.grid.cell_type).reshape(-1)
    crossing = np.asarray(w.peds.crossing)[active]
    walk_ok = np.isin(ct[pos], [C.SIDEWALK, C.BLOCK_ENTRANCE,
                                C.TRAFFIC_LIGHT])
    road_ok = np.isin(ct[pos], [C.CONTROLLED_ROAD, C.R1, C.R2, C.R3,
                                C.INTERSECTION])
    assert np.all(walk_ok | (crossing & road_ok))


def test_rl_smoke_all_algorithms(small_cfg):
    for algo in ("NEIGHBOR_RL_BATCHED", "RL_A2C_BATCHED",
                 "GAT_DQN_BATCHED"):
        cfg = small_cfg.replace(TRAFFIC_LIGHT_AGENT_ALGORITHM=algo,
                                MAX_VEHICLES=128)
        sim = TrafficSim(cfg, seed=0)
        p0 = jax.tree_util.tree_leaves(sim.world.rl.params)[0].copy()
        sim.step(40)
        w = sim.world
        gv = np.asarray(w.groups_static.valid)
        ph = np.asarray(w.lights.current_phase)
        assert (ph[gv] >= 0).all(), algo
        # gradient steps actually ran: parameters moved AND the
        # optimizer's step counter advanced (lax.cond-gated training
        # makes "never trains" a silent failure mode — VERDICT r1 #7)
        p1 = jax.tree_util.tree_leaves(w.rl.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1)), algo
        counts = [int(x) for x in jax.tree_util.tree_leaves(w.rl.opt_state)
                  if np.ndim(x) == 0 and np.issubdtype(
                      np.asarray(x).dtype, np.integer)]
        assert counts and max(counts) > 0, (algo, counts)


def test_checkpoint_roundtrip(small_cfg, small_world):
    import tempfile
    from trafficsimulation_tpu import checkpoint
    w = jax.jit(functools.partial(step_world, small_cfg))(small_world)
    with tempfile.TemporaryDirectory() as td:
        checkpoint.save(td, w, small_cfg)
        w2 = checkpoint.restore(td, w)
    assert (np.asarray(w2.vehicles.pos) == np.asarray(w.vehicles.pos)).all()
    assert (np.asarray(w2.grid.cell_type) ==
            np.asarray(w.grid.cell_type)).all()
    assert int(w2.tick) == int(w.tick)