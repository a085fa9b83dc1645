"""Bit-exactness of the light FSM vs a Python oracle re-implementing the
reference semantics (`intersection_light_group.py:348-494`) — the test
SURVEY §4 prescribes."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.lights import fsm

H = W = 16
G, L = 1, 2
NS_CELLS = [(7, y) for y in range(3, 7)]    # (x, y) feeding north-south
EW_CELLS = [(x, 7) for x in range(3, 7)]
INTER_CELLS = [(7, 7), (8, 7), (7, 8), (8, 8)]


def make_synthetic():
    queue_group = np.full((H, W), -1, np.int32)
    queue_bucket = np.full((H, W), -1, np.int8)
    for x, y in NS_CELLS:
        queue_group[y, x] = 0
        queue_bucket[y, x] = fsm.NS_IN
    for x, y in EW_CELLS:
        queue_group[y, x] = 0
        queue_bucket[y, x] = fsm.EW_IN
    group_id = np.full((H, W), -1, np.int32)
    for x, y in INTER_CELLS:
        group_id[y, x] = 0
        queue_group[y, x] = 0
        queue_bucket[y, x] = 4   # occupancy bucket (clearance check)
    grid = SimpleNamespace(queue_group=jnp.asarray(queue_group),
                           queue_bucket=jnp.asarray(queue_bucket),
                           group_id=jnp.asarray(group_id),
                           cell_type=jnp.zeros((H, W), jnp.uint8))
    gs = SimpleNamespace(valid=jnp.array([True]),
                         neighbor=jnp.full((G, 4), -1, jnp.int32),
                         bbox=jnp.array([[7, 8, 7, 8]], jnp.int32),
                         intersection_size=jnp.array([4 / 16.0]),
                         penalty_score=jnp.array([0.0]))
    # stop runs in diff-buffer index space (gen/lights.run_decompose):
    # each light's own cell + its single assigned road as length-1 H-runs
    def h1(y, x):
        return y * (W + 1) + x
    ls = SimpleNamespace(valid=jnp.array([True, True]),
                         pos=jnp.array([6 * W + 6, 9 * W + 9], jnp.int32),
                         group=jnp.array([0, 0], jnp.int32),
                         axis=jnp.array([0, 1], jnp.int32),
                         assign_road=jnp.array([6 * W + 7, 7 * W + 6],
                                               jnp.int32),
                         assign_light=jnp.array([0, 1], jnp.int32),
                         assign_valid=jnp.array([True, True]),
                         srun_lo=jnp.array([h1(6, 6), h1(6, 7),
                                            h1(9, 9), h1(7, 6)], jnp.int32),
                         srun_hi=jnp.array([h1(6, 7), h1(6, 8),
                                            h1(9, 10), h1(7, 7)], jnp.int32),
                         srun_light=jnp.array([0, 0, 1, 1], jnp.int32),
                         sextra_cell=jnp.full((4,), -1, jnp.int32),
                         sextra_light=jnp.full((4,), -1, jnp.int32))
    return grid, gs, ls


class OracleGroup:
    """Direct Python re-statement of the reference group FSM semantics."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.current_phase = None
        self.pending_phase = None
        self.transition_timer = 0
        self._ft_phase = 0
        self.fixed_time_timer = 0
        self.queue_timer = 0
        self.gap_timer = 0
        self.last_arrival = 0
        # init: apply_phase(0) when enabled
        if cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM != "DISABLED":
            self.apply_phase(0)
        self.stop = {0: False, 1: False}   # per-axis light stop

    def apply_phase(self, phase):
        if phase == self.current_phase or phase == self.pending_phase:
            return
        self.pending_phase = phase

    def step(self, ns_q, ew_q, occupied):
        cfg = self.cfg
        if self.pending_phase is None:
            algo = cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM
            if algo == "FIXED_TIME":
                self.fixed_time_timer += 1
                if self.fixed_time_timer == 1:
                    self.apply_phase(self._ft_phase)
                if self.fixed_time_timer >= cfg.TRAFFIC_LIGHT_GREEN_DURATION:
                    self._ft_phase = 1 - self._ft_phase
                    self.fixed_time_timer = 0
            elif algo == "QUEUE_ACTUATED":
                self.queue_timer += 1
                cur, opp = (ns_q, ew_q) if self.current_phase == 0 \
                    else (ew_q, ns_q)
                if self.queue_timer == 1:
                    self.last_arrival = cur
                    self.gap_timer = 0
                if cur > self.last_arrival:
                    self.last_arrival = cur
                    self.gap_timer = 0
                else:
                    self.gap_timer += 1
                if (self.queue_timer >=
                        cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_MIN_GREEN and (
                        self.gap_timer >=
                        cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_GAP or
                        self.queue_timer >=
                        cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_MAX_GREEN or
                        (opp > cur == 0))):
                    self.apply_phase(1 - self.current_phase)
                    self.queue_timer = 0
            elif algo == "PRESSURE_CONTROL":
                self.apply_phase(0 if ns_q > ew_q else 1)
        self._execute(occupied)

    def _execute(self, occupied):
        cfg = self.cfg
        if self.pending_phase is None:
            return
        if cfg.TRAFFIC_LIGHT_TRANSITION_DURATION_ENABLED and \
                self.transition_timer > 0:
            self.transition_timer -= 1
            self.stop = {0: True, 1: True}
            return
        if cfg.TRAFFIC_LIGHT_TRANSITION_CLEARANCE_ENABLED and occupied:
            self.stop = {0: True, 1: True}
            return
        p = self.pending_phase
        self.stop[p] = False
        self.stop[1 - p] = True
        self.current_phase = p
        self.pending_phase = None


@pytest.mark.parametrize("algo", ["FIXED_TIME", "QUEUE_ACTUATED",
                                  "PRESSURE_CONTROL"])
def test_fsm_bit_exact_vs_oracle(algo):
    cfg = Config(TRAFFIC_LIGHT_AGENT_ALGORITHM=algo)
    grid, gs, ls = make_synthetic()
    state = fsm.init_lights_state(cfg, G, L, gs.valid)
    oracle = OracleGroup(cfg)
    rng = np.random.default_rng(42)

    for t in range(300):
        occ = np.zeros((H, W), bool)
        # scripted traffic: pseudorandom arrivals on lane + intersection
        for x, y in NS_CELLS:
            occ[y, x] = rng.random() < 0.4
        for x, y in EW_CELLS:
            occ[y, x] = rng.random() < 0.25
        for x, y in INTER_CELLS:
            occ[y, x] = rng.random() < 0.1
        occj = jnp.asarray(occ)

        ns_q = sum(occ[y, x] for x, y in NS_CELLS)
        ew_q = sum(occ[y, x] for x, y in EW_CELLS)
        occupied = any(occ[y, x] for x, y in INTER_CELLS)

        state = fsm.run_controllers(cfg, grid, gs, state, occj)
        state = fsm.execute_phase_change(
            cfg, ls, gs, state, fsm.group_occupied(grid, occj, G))
        oracle.step(ns_q, ew_q, occupied)

        cur = int(state.current_phase[0])
        pend = int(state.pending_phase[0])
        assert cur == (-1 if oracle.current_phase is None
                       else oracle.current_phase), f"tick {t} phase"
        assert pend == (-1 if oracle.pending_phase is None
                        else oracle.pending_phase), f"tick {t} pending"
        # per-axis stop flags (light 0 = N-S axis, light 1 = E-W)
        assert bool(state.light_stop[0]) == oracle.stop[0], f"tick {t} ns"
        assert bool(state.light_stop[1]) == oracle.stop[1], f"tick {t} ew"


# ---------------------------------------------------------------------------
# Neighbor controllers: two vertically adjacent groups
# (`run_neighbor_pressure_control` / `run_neighbor_green_wave`
# `intersection_light_group.py:496-546`).  Divergence note: the reference
# steps groups in RandomActivation order, so a neighbor's stored pressure /
# phase may be same-tick or previous-tick depending on shuffle; this engine
# (and the oracle below) uses the batched-decide convention — every group
# reads its neighbors' START-OF-TICK state.
# ---------------------------------------------------------------------------

H2, W2 = 24, 16
G2, L2 = 2, 4


def make_two_group():
    queue_group = np.full((H2, W2), -1, np.int32)
    queue_bucket = np.full((H2, W2), -1, np.int8)
    lanes = {}
    for g, ybase in ((0, 4), (1, 16)):
        ns_in = [(7, ybase + dy) for dy in range(-3, 0)]
        ns_out = [(7, ybase + dy) for dy in range(2, 4)]
        ew_in = [(3 + dx, ybase) for dx in range(3)]
        ew_out = [(10 + dx, ybase) for dx in range(2)]
        inter = [(7, ybase), (8, ybase), (7, ybase + 1), (8, ybase + 1)]
        for cells, bucket in ((ns_in, fsm.NS_IN), (ns_out, fsm.NS_OUT),
                              (ew_in, fsm.EW_IN), (ew_out, fsm.EW_OUT),
                              (inter, 4)):
            for x, y in cells:
                queue_group[y, x] = g
                queue_bucket[y, x] = bucket
        lanes[g] = dict(ns_in=ns_in, ns_out=ns_out, ew_in=ew_in,
                        ew_out=ew_out, inter=inter)
    grid = SimpleNamespace(queue_group=jnp.asarray(queue_group),
                           queue_bucket=jnp.asarray(queue_bucket),
                           group_id=jnp.full((H2, W2), -1, jnp.int32),
                           cell_type=jnp.zeros((H2, W2), jnp.uint8))
    # group 0's north neighbor is group 1; group 1's south neighbor is 0
    neighbor = np.full((G2, 4), -1, np.int32)
    neighbor[0, 0] = 1    # N
    neighbor[1, 2] = 0    # S
    gs = SimpleNamespace(valid=jnp.array([True, True]),
                         neighbor=jnp.asarray(neighbor),
                         bbox=jnp.array([[7, 8, 4, 5], [7, 8, 16, 17]],
                                        jnp.int32),
                         intersection_size=jnp.array([0.25, 0.25]),
                         penalty_score=jnp.array([0.0, 0.0]))
    ls = SimpleNamespace(
        valid=jnp.ones((L2,), bool),
        pos=jnp.array([6 * W2 + 6, 9 * W2 + 9, 15 * W2 + 6, 18 * W2 + 9],
                      jnp.int32),
        group=jnp.array([0, 0, 1, 1], jnp.int32),
        axis=jnp.array([0, 1, 0, 1], jnp.int32),
        assign_road=jnp.zeros((4,), jnp.int32),
        assign_light=jnp.arange(4, dtype=jnp.int32),
        assign_valid=jnp.zeros((4,), bool))
    return grid, gs, ls, lanes


class OracleNeighborNet:
    """Python oracle for the two neighbor controllers over a group graph,
    batched-decide convention (all groups read start-of-tick neighbor
    state)."""

    def __init__(self, cfg, neighbor):
        self.cfg = cfg
        self.neighbor = neighbor    # {gid: {dir_idx: gid}}
        self.g = [OracleGroup(cfg) for _ in range(len(neighbor))]
        self.ns_p = [0.0] * len(self.g)
        self.ew_p = [0.0] * len(self.g)

    def step(self, queues, occupied):
        cfg = self.cfg
        algo = cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM
        prev_ns = list(self.ns_p)
        prev_ew = list(self.ew_p)
        prev_phase = [grp.current_phase for grp in self.g]
        for i, grp in enumerate(self.g):
            ns_in, ns_out, ew_in, ew_out = queues[i]
            if grp.pending_phase is None:
                if algo == "NEIGHBOR_PRESSURE_CONTROL":
                    ns_p = float(ns_in - ns_out)
                    ew_p = float(ew_in - ew_out)
                    for d, nb in self.neighbor[i].items():
                        if d in (0, 2):
                            ns_p -= prev_ns[nb]
                        else:
                            ew_p -= prev_ew[nb]
                    self.ns_p[i] = ns_p
                    self.ew_p[i] = ew_p
                    grp.apply_phase(0 if ns_p > ew_p else 1)
                elif algo == "NEIGHBOR_GREEN_WAVE":
                    favor_ns = any(prev_phase[nb] == 0
                                   for d, nb in self.neighbor[i].items()
                                   if d in (0, 2))
                    favor_ew = any(prev_phase[nb] == 1
                                   for d, nb in self.neighbor[i].items()
                                   if d in (1, 3))
                    if favor_ns and not favor_ew:
                        grp.apply_phase(0)
                    elif favor_ew and not favor_ns:
                        grp.apply_phase(1)
                    else:
                        grp.apply_phase(0 if ns_in > ew_in else 1)
            grp._execute(occupied[i])


@pytest.mark.parametrize("algo", ["NEIGHBOR_PRESSURE_CONTROL",
                                  "NEIGHBOR_GREEN_WAVE"])
def test_neighbor_fsm_bit_exact_vs_oracle(algo):
    cfg = Config(TRAFFIC_LIGHT_AGENT_ALGORITHM=algo)
    grid, gs, ls, lanes = make_two_group()
    state = fsm.init_lights_state(cfg, G2, L2, gs.valid)
    oracle = OracleNeighborNet(cfg, {0: {0: 1}, 1: {2: 0}})
    rng = np.random.default_rng(7)

    for t in range(300):
        occ = np.zeros((H2, W2), bool)
        for g in (0, 1):
            for kind, p in (("ns_in", 0.45), ("ns_out", 0.2),
                            ("ew_in", 0.3), ("ew_out", 0.15),
                            ("inter", 0.1)):
                for x, y in lanes[g][kind]:
                    occ[y, x] = rng.random() < p
        occj = jnp.asarray(occ)
        queues = []
        occupied = []
        for g in (0, 1):
            queues.append(tuple(
                sum(occ[y, x] for x, y in lanes[g][k])
                for k in ("ns_in", "ns_out", "ew_in", "ew_out")))
            occupied.append(any(occ[y, x] for x, y in lanes[g]["inter"]))

        state = fsm.run_controllers(cfg, grid, gs, state, occj)
        state = fsm.execute_phase_change(
            cfg, ls, gs, state, fsm.group_occupied(grid, occj, G2))
        oracle.step(queues, occupied)

        for g in (0, 1):
            ocur = oracle.g[g].current_phase
            opend = oracle.g[g].pending_phase
            assert int(state.current_phase[g]) == (
                -1 if ocur is None else ocur), f"tick {t} g{g} phase"
            assert int(state.pending_phase[g]) == (
                -1 if opend is None else opend), f"tick {t} g{g} pending"
            if algo == "NEIGHBOR_PRESSURE_CONTROL":
                assert float(state.ns_pressure[g]) == oracle.ns_p[g], \
                    f"tick {t} g{g} ns_p"
                assert float(state.ew_pressure[g]) == oracle.ew_p[g], \
                    f"tick {t} g{g} ew_p"


def test_stop_map_scatter():
    cfg = Config()
    grid, gs, ls = make_synthetic()
    state = fsm.init_lights_state(cfg, G, L, gs.valid)
    state = state.replace(light_stop=jnp.array([True, False]))
    grid2 = SimpleNamespace(cell_type=jnp.zeros((H, W), jnp.uint8))
    stop = fsm.build_stop_map(grid2, ls, state)
    assert bool(stop[6, 6])          # light 0 own cell
    assert bool(stop[6, 7])          # light 0 controlled road
    assert not bool(stop[9, 9])      # light 1 not stopped
    assert not bool(stop[7, 6])


def test_overrides():
    cfg = Config()
    grid, gs, ls = make_synthetic()
    state = fsm.init_lights_state(cfg, G, L, gs.valid)
    state = state.replace(light_stop=jnp.array([True, True]))
    state = fsm.apply_light_overrides(state, jnp.array([0, -1], jnp.int8))
    assert not bool(state.light_stop[0])
    assert bool(state.light_stop[1])


def test_run_reduction_equals_plane_reduction(small_cfg, small_city):
    """The axis-aligned run decomposition (gen/lights.py 6d) + prefix
    sums compute EXACTLY the per-group queue/clearance counts of the
    full-plane segment-sum, for random occupancies."""
    import jax
    grid, _, gs, _, _, _ = small_city
    G = small_cfg.capacities().max_groups
    key = jax.random.PRNGKey(11)
    for _ in range(3):
        key, k = jax.random.split(key)
        occ = jax.random.bernoulli(k, 0.35, grid.cell_type.shape)
        a = fsm.group_reductions(grid, occ, G, gs=gs)
        b = fsm.group_reductions(grid, occ, G, gs=None)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_stop_map_runs_match_pair_scatter(small_world):
    """The runs-based stop map (diff-array + prefix, `fsm.build_stop_map`)
    covers exactly the cells the per-pair scatter semantics define
    (`cell.py:241-251`: a stopped light writes its own cell + every
    assigned road), on a GENERATED world across random stop patterns."""
    w = small_world
    ls = w.lights_static
    L = int(ls.valid.shape[0])
    Hh, Ww = w.grid.cell_type.shape
    lvalid = np.asarray(ls.valid)
    lpos = np.asarray(ls.pos)
    av = np.asarray(ls.assign_valid)
    al = np.asarray(ls.assign_light)
    ar = np.asarray(ls.assign_road)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        flags = rng.random(L) < (0.0, 0.4, 0.7, 1.0)[seed]
        state = w.lights.replace(light_stop=jnp.asarray(flags))
        got = np.asarray(fsm.build_stop_map(w.grid, ls, state))
        exp = np.zeros((Hh * Ww,), bool)
        on = lvalid & flags
        exp[lpos[on]] = True
        pair_on = av & on[np.clip(al, 0, L - 1)]
        exp[ar[pair_on]] = True
        assert (got.reshape(-1) == exp).all(), seed


def test_dense_reducers_match_sparse(small_cfg, small_world):
    """The dense MXU form of both per-tick geometry reductions
    (fsm.build_dense_reducers: one-hot bf16 matmuls, used for batched
    rollouts) is EXACTLY the sparse run/scatter form — queue counts,
    clearance flags, and stop maps — on a generated world."""
    import jax
    w = small_world
    G = small_cfg.capacities().max_groups
    M, A = fsm.build_dense_reducers(small_cfg, w.grid, w.lights_static)
    key = jax.random.PRNGKey(3)
    L = int(w.lights_static.valid.shape[0])
    for i in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        occ = jax.random.bernoulli(k1, 0.4, w.grid.cell_type.shape)
        a = fsm.group_reductions(w.grid, occ, G, gs=w.groups_static)
        b = fsm.group_reductions(w.grid, occ, G, dense_m=M)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), i
        stops = jax.random.bernoulli(k2, (0.0, 0.5, 1.0)[i], (L,))
        state = w.lights.replace(light_stop=stops)
        sp = np.asarray(fsm.build_stop_map(w.grid, w.lights_static, state))
        de = np.asarray(fsm.build_stop_map(w.grid, w.lights_static, state,
                                           dense_a=A))
        assert np.array_equal(sp, de), i
