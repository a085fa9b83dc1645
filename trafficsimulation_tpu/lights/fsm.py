"""Traffic-light control: queue reductions, FSM controllers, phase commit.

Vectorized over all intersection light groups at once — the reference's
per-group `IntersectionLightGroup.step()` dispatch
(`intersection_light_group.py:396-423`) becomes masked array updates; the
njit queue/pressure reducers (`numba_utilities.py:65-152`) become one
segment-sum over the lane-label planes.

Controllers (bit-exact to the reference):
  FIXED_TIME           `intersection_light_group.py:427-441`
  QUEUE_ACTUATED       `intersection_light_group.py:463-494`
  PRESSURE_CONTROL     `intersection_light_group.py:448-461`
  NEIGHBOR_PRESSURE_CONTROL `intersection_light_group.py:496-519`
  NEIGHBOR_GREEN_WAVE  `intersection_light_group.py:521-546`
Phase commit with all-red transition + clearance hard rule:
  `_execute_phase_change` `intersection_light_group.py:348-384`.
RL controllers plug in through the same (pending_phase, rl_timer) surface
from `trafficsimulation_tpu.rl`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..core.state import LightsState, LightStatic, GroupStatic, Grid

NS_IN, NS_OUT, EW_IN, EW_OUT = 0, 1, 2, 3

FSM_ALGOS = ("DISABLED", "FIXED_TIME", "QUEUE_ACTUATED", "PRESSURE_CONTROL",
             "NEIGHBOR_PRESSURE_CONTROL", "NEIGHBOR_GREEN_WAVE")
RL_ALGOS = ("NEIGHBOR_RL", "NEIGHBOR_RL_BATCHED", "RL_A2C_BATCHED",
            "GAT_DQN", "GAT_DQN_BATCHED")


def init_lights_state(cfg: Config, num_groups: int, num_lights: int,
                      group_valid: jnp.ndarray) -> LightsState:
    G, L = num_groups, num_lights
    pending = jnp.where(
        group_valid & (cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM != "DISABLED"),
        0, -1).astype(jnp.int32)
    z = jnp.zeros((G,), jnp.int32)
    return LightsState(
        current_phase=jnp.full((G,), -1, jnp.int32),
        pending_phase=pending,
        transition_timer=z, clearance_timer=z,
        ft_phase=z, fixed_time_timer=z,
        queue_timer=z, gap_timer=z, last_arrival=z,
        ns_pressure=jnp.zeros((G,), jnp.float32),
        ew_pressure=jnp.zeros((G,), jnp.float32),
        rl_timer=z,
        light_stop=jnp.zeros((L,), bool),
    )


def _prefix_planes(occupancy: jnp.ndarray,
                   use_pallas: bool = True) -> jnp.ndarray:
    """Concatenated flat prefix buffer [H*(W+1) + (H+1)*W]: first the
    row-exclusive prefixes Ph[y, j] = sum(occ[y, :j]), then the
    column-exclusive prefixes Pv[k, x] = sum(occ[:k, x]).  The inclusive
    prefixes come from one VMEM-resident kernel on TPU (the XLA
    log-shift doubling materializes ~16 padded plane passes per tick) or
    the same doubling in XLA elsewhere."""
    H, W = occupancy.shape
    occ = occupancy.astype(jnp.int32)

    from ..ops.engine import _on_tpu
    # whole-grid kernel: ~8 live i32 planes of working set
    if use_pallas and _on_tpu() and 32 * H * W < 100 * 1024 * 1024:
        from ..ops.pallas_engine import prefix_planes_pallas
        x, y = prefix_planes_pallas(occ)
    else:
        x = occ
        s = 1
        while s < W:
            x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :W]
            s *= 2
        y = occ
        s = 1
        while s < H:
            y = y + jnp.pad(y, ((s, 0), (0, 0)))[:H]
            s *= 2
    Ph = jnp.pad(x, ((0, 0), (1, 0)))          # [H, W+1] exclusive-at-j
    Pv = jnp.pad(y, ((1, 0), (0, 0)))          # [H+1, W]
    return jnp.concatenate([Ph.reshape(-1), Pv.reshape(-1)])


def build_dense_reducers(cfg, grid: Grid, ls: LightStatic,
                         build_m: bool = True, build_a: bool = True):
    """Dense one-hot matrices for the two per-tick geometry reductions,
    built ONCE per chunk from static geometry (sim.run_chunk hoists the
    build outside the tick scan):

      M [HW, G*5+1] bf16 — M[c, g*5+b] = 1 iff cell c carries queue
        label (g, b); queue counts become q = occ @ M.
      A [L, HW] bf16 — A[l, c] = 1 iff light l stops cell c (own cell +
        assigned controlled roads); the stop map becomes light_stop @ A.

    Both are oriented so the CONTRACTED axis is the matrix's leading
    one: under vmap the batch becomes the product's M axis and the wide
    output (HW / G*5) fills the 128-lane N axis — the N=batch
    orientation measured 5x slower (MXU lane underutilization).

    Why: sparse run gathers/scatters price ~15-19 cycles per scalar
    ELEMENT on TPU, every tick, per world.  As dense bf16 matmuls the
    same reductions ride the MXU — and under `jax.vmap` (shared-geometry
    batches, parallel/mesh.py) the matrix is read from HBM once for the
    WHOLE batch, so the per-world cost collapses by ~B.  Exact: operands
    are 0/1, accumulation is f32 (counts < 2^24).  Only profitable when
    batched — callers gate via `dense_reducers_profitable`."""
    H, W = grid.cell_type.shape
    HW = H * W
    G = int(cfg.capacities().max_groups)
    L = ls.valid.shape[0]
    M = A = None
    if build_m:
        qg = grid.queue_group.reshape(-1).astype(jnp.int32)
        qb = grid.queue_bucket.reshape(-1).astype(jnp.int32)
        seg = jnp.where(qg >= 0, qg * 5 + qb, G * 5)
        M = (seg[:, None]
             == jnp.arange(G * 5 + 1, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    if build_a:
        A = jnp.zeros((L, HW), jnp.bfloat16)
        pc = jnp.where(ls.assign_valid, ls.assign_road, HW)
        A = A.at[jnp.clip(ls.assign_light, 0, L - 1), pc].set(
            jnp.bfloat16(1), mode="drop")
        A = A.at[jnp.arange(L),
                 jnp.where(ls.valid, ls.pos, HW)].set(jnp.bfloat16(1),
                                                      mode="drop")
    return M, A


def dense_reducer_modes(cfg) -> tuple:
    """(use_dense_M, use_dense_A): each dense matrix pays only when its
    per-tick HBM read beats the sparse form it replaces.  Measured at
    256x256/B=16: the run-decomposed queue reduction costs ~10 us/tick
    — the [HW, G*5] one-hot (252 MB at G=384) LOSES unless tiny — while
    the stop map's scatter + two log-shift prefixes cost ~40 us/tick,
    so the [L, HW] one-hot (144 MB at L=1152, ~12 us/tick read) wins up
    to ~192 MB.  Grids under 256x256 keep the sparse forms (cheap
    anyway)."""
    caps = cfg.capacities()
    HW = cfg.HEIGHT * cfg.WIDTH
    m_ok = HW >= 256 * 256 and \
        (caps.max_groups * 5 + 1) * HW * 2 <= 64 * 1024 * 1024
    a_ok = HW >= 256 * 256 and \
        HW * caps.max_lights * 2 <= 192 * 1024 * 1024
    return m_ok, a_ok


def dense_reducers_profitable(cfg) -> bool:
    return any(dense_reducer_modes(cfg))


def group_reductions(grid: Grid, occupancy: jnp.ndarray, num_groups: int,
                     gs: GroupStatic = None, use_pallas: bool = True,
                     dense_m: jnp.ndarray = None):
    """One segment-sum over the queue labels yields per-group
    (ns_in, ns_out, ew_in, ew_out) queue counts AND the intersection
    occupancy flag (bucket 4) — the njit reducers
    (`compute_approach_queue` `numba_utilities.py:65-72`) plus
    `is_intersection_occupied` (`intersection_light_group.py:284-291`)
    in a single scatter.

    With `gs`, each queue RUN (axis-aligned segment of labeled cells,
    gen/lights.py 6d) costs two prefix-sum gathers instead of one gather
    per cell — TPU gathers/scatters cost ~19 cycles/element, so scalar
    work drops from O(cells) to O(runs) (~5x at range 10) plus ~16
    vector passes for the prefix planes."""
    G = num_groups
    if dense_m is not None:
        q = jnp.matmul(occupancy.reshape(-1).astype(jnp.bfloat16),
                       dense_m,
                       preferred_element_type=jnp.float32)
        q = q[:G * 5].astype(jnp.int32).reshape(G, 5)
        return (q[:, NS_IN], q[:, NS_OUT], q[:, EW_IN], q[:, EW_OUT],
                q[:, 4] > 0)
    if gs is not None:
        P = _prefix_planes(occupancy, use_pallas=use_pallas)
        cnt = P[gs.run_hi] - P[gs.run_lo]
        seg = jnp.where(gs.run_seg >= 0, gs.run_seg, G * 5)
        sums = jnp.zeros((G * 5 + 1,), jnp.int32).at[seg].add(cnt)
    else:
        occ = occupancy.reshape(-1)
        qg = grid.queue_group.reshape(-1)
        qb = grid.queue_bucket.reshape(-1).astype(jnp.int32)
        seg = jnp.where(qg >= 0, qg * 5 + qb, G * 5)
        sums = jnp.zeros((G * 5 + 1,), jnp.int32).at[seg].add(
            occ.astype(jnp.int32))
    q = sums[:G * 5].reshape(G, 5)
    return (q[:, NS_IN], q[:, NS_OUT], q[:, EW_IN], q[:, EW_OUT],
            q[:, 4] > 0)


def group_queues(grid: Grid, occupancy: jnp.ndarray, num_groups: int):
    return group_reductions(grid, occupancy, num_groups)[:4]


def group_occupied(grid: Grid, occupancy: jnp.ndarray,
                   num_groups: int) -> jnp.ndarray:
    return group_reductions(grid, occupancy, num_groups)[4]


def _apply_phase(state: LightsState, want, phase) -> LightsState:
    """`apply_phase` (`intersection_light_group.py:386-393`): register the
    request unless it matches current or pending."""
    ok = want & (phase != state.current_phase) & (state.pending_phase == -1)
    return state.replace(pending_phase=jnp.where(ok, phase,
                                                 state.pending_phase))


def run_controllers(cfg: Config, grid: Grid, gs: GroupStatic,
                    state: LightsState, occupancy: jnp.ndarray,
                    rl_phase_request=None, reductions=None) -> LightsState:
    """One control decision per group (only where no phase is pending).
    `reductions` optionally passes precomputed (ns_in, ns_out, ew_in,
    ew_out) so the segment-sum is shared with the clearance check."""
    algo = cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM
    G = gs.valid.shape[0]
    active = gs.valid & (state.pending_phase == -1)

    if algo == "DISABLED":
        return state

    if algo == "FIXED_TIME":
        timer = jnp.where(active, state.fixed_time_timer + 1,
                          state.fixed_time_timer)
        state = state.replace(fixed_time_timer=timer)
        state = _apply_phase(state, active & (timer == 1), state.ft_phase)
        flip = active & (timer >= cfg.TRAFFIC_LIGHT_GREEN_DURATION)
        return state.replace(
            ft_phase=jnp.where(flip, 1 - state.ft_phase, state.ft_phase),
            fixed_time_timer=jnp.where(flip, 0, state.fixed_time_timer))

    if reductions is None:
        reductions = group_queues(grid, occupancy, G)
    ns_in, ns_out, ew_in, ew_out = reductions

    if algo == "QUEUE_ACTUATED":
        timer = jnp.where(active, state.queue_timer + 1, state.queue_timer)
        cur_is_ns = state.current_phase == 0
        cur_q = jnp.where(cur_is_ns, ns_in, ew_in)
        opp_q = jnp.where(cur_is_ns, ew_in, ns_in)
        first = active & (timer == 1)
        grew = active & (cur_q > state.last_arrival)
        last_arrival = jnp.where(first | grew, cur_q, state.last_arrival)
        gap = jnp.where(first, 0,
                        jnp.where(grew, 0,
                                  jnp.where(active, state.gap_timer + 1,
                                            state.gap_timer)))
        switch = active & \
            (timer >= cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_MIN_GREEN) & (
                (gap >= cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_GAP) |
                (timer >= cfg.TRAFFIC_LIGHT_QUEUE_ACTUATED_MAX_GREEN) |
                ((opp_q > cur_q) & (cur_q == 0)))
        state = state.replace(queue_timer=jnp.where(switch, 0, timer),
                              gap_timer=gap, last_arrival=last_arrival)
        return _apply_phase(state, switch, 1 - state.current_phase)

    if algo in ("PRESSURE_CONTROL", "NEIGHBOR_PRESSURE_CONTROL"):
        ns_p = (ns_in - ns_out).astype(jnp.float32)
        ew_p = (ew_in - ew_out).astype(jnp.float32)
        if algo == "NEIGHBOR_PRESSURE_CONTROL":
            # subtract downstream neighbors' stored pressures
            # (`intersection_light_group.py:496-519`)
            for d in range(4):
                nb = gs.neighbor[:, d]
                has = nb >= 0
                nbs = jnp.clip(nb, 0, G - 1)
                if d in (0, 2):      # N, S
                    ns_p = ns_p - jnp.where(has, state.ns_pressure[nbs], 0.0)
                else:                # E, W
                    ew_p = ew_p - jnp.where(has, state.ew_pressure[nbs], 0.0)
        state = state.replace(
            ns_pressure=jnp.where(active, ns_p, state.ns_pressure),
            ew_pressure=jnp.where(active, ew_p, state.ew_pressure))
        return _apply_phase(state, active, jnp.where(ns_p > ew_p, 0, 1))

    if algo == "NEIGHBOR_GREEN_WAVE":
        favor_ns = jnp.zeros((G,), bool)
        favor_ew = jnp.zeros((G,), bool)
        for d in range(4):
            nb = gs.neighbor[:, d]
            has = nb >= 0
            nbs = jnp.clip(nb, 0, G - 1)
            ph = state.current_phase[nbs]
            if d in (0, 2):
                favor_ns = favor_ns | (has & (ph == 0))
            else:
                favor_ew = favor_ew | (has & (ph == 1))
        tie = ~(favor_ns ^ favor_ew)
        phase = jnp.where(favor_ns & ~favor_ew, 0,
                          jnp.where(favor_ew & ~favor_ns, 1,
                                    jnp.where(ns_in > ew_in, 0, 1)))
        del tie
        return _apply_phase(state, active, phase)

    if algo in RL_ALGOS:
        if rl_phase_request is None:
            raise ValueError(
                f"algorithm {algo} requires an RL controller; pass its "
                "phase request (see trafficsimulation_tpu.rl)")
        want, phase = rl_phase_request
        return _apply_phase(state, active & want, phase)

    raise ValueError(f"unknown TRAFFIC_LIGHT_AGENT_ALGORITHM {algo!r}")


def execute_phase_change(cfg: Config, ls: LightStatic, gs: GroupStatic,
                         state: LightsState,
                         intersection_occupied: jnp.ndarray) -> LightsState:
    """`_execute_phase_change` (`intersection_light_group.py:348-384`)."""
    G = gs.valid.shape[0]
    has_pending = gs.valid & (state.pending_phase >= 0)

    in_transition = jnp.zeros((G,), bool)
    transition_timer = state.transition_timer
    if cfg.TRAFFIC_LIGHT_TRANSITION_DURATION_ENABLED:
        in_transition = has_pending & (transition_timer > 0)
        transition_timer = jnp.where(in_transition, transition_timer - 1,
                                     transition_timer)

    blocked_clear = jnp.zeros((G,), bool)
    if cfg.TRAFFIC_LIGHT_TRANSITION_CLEARANCE_ENABLED:
        blocked_clear = has_pending & ~in_transition & intersection_occupied

    all_red = in_transition | blocked_clear
    commit = has_pending & ~all_red

    # per-light stop update
    lg = jnp.clip(ls.group, 0, G - 1)
    l_has_group = ls.valid & (ls.group >= 0)
    l_all_red = l_has_group & all_red[lg]
    l_commit = l_has_group & commit[lg]
    commit_phase = state.pending_phase[lg]
    # axis 0 lights go on phase 0; axis 1 on phase 1; unclassified untouched
    go = (ls.axis >= 0) & (ls.axis == commit_phase)
    stop = (ls.axis >= 0) & (ls.axis != commit_phase)
    light_stop = state.light_stop
    light_stop = jnp.where(l_all_red, True, light_stop)
    light_stop = jnp.where(l_commit & go, False, light_stop)
    light_stop = jnp.where(l_commit & stop, True, light_stop)

    return state.replace(
        transition_timer=transition_timer,
        current_phase=jnp.where(commit, state.pending_phase,
                                state.current_phase),
        pending_phase=jnp.where(commit, -1, state.pending_phase),
        light_stop=light_stop)


def build_stop_map(grid: Grid, ls: LightStatic,
                   state: LightsState,
                   dense_a: jnp.ndarray = None) -> jnp.ndarray:
    """stop_map from per-light stop flags: a stopped light writes its own
    cell and each assigned controlled road (`cell.py:241-251`).

    Runs-based: each light's stop cells are axis-aligned RUNS
    (ls.srun_*, gen/lights.py 6e), so the write is two diff-array
    elements per stopped run + one log-shift prefix pass per axis —
    TPU scatters price per ELEMENT (~19 cycles), so O(runs) beats the
    former O(cells) scatter ~4x at range 10.  Multi-light cells keep
    exact OR-semantics through the extras scatter."""
    H, W = grid.cell_type.shape
    HW = H * W
    L = ls.valid.shape[0]
    if dense_a is not None:
        # dense MXU form (see build_dense_reducers): one bf16 matvec —
        # batched and matrix-read-amortized under vmap — replaces the
        # run scatter + two log-shift prefix passes
        cnt = jnp.matmul(state.light_stop.astype(jnp.bfloat16), dense_a,
                         preferred_element_type=jnp.float32)
        return (cnt > 0.5).reshape(H, W)
    NH = H * (W + 1)
    NV = (H + 1) * W

    stopped = (ls.srun_light >= 0) & \
        state.light_stop[jnp.clip(ls.srun_light, 0, L - 1)]
    one = stopped.astype(jnp.int32)
    sink = NH + NV
    diff = jnp.zeros((NH + NV + 1,), jnp.int32)
    diff = diff.at[jnp.where(stopped, ls.srun_lo, sink)].add(one)
    diff = diff.at[jnp.where(stopped, ls.srun_hi, sink)].add(-one)

    def incsum(x, axis):
        n = x.shape[axis]
        s = 1
        while s < n:
            if axis == 1:
                x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :x.shape[1]]
            else:
                x = x + jnp.pad(x, ((s, 0), (0, 0)))[:x.shape[0]]
            s *= 2
        return x

    cov_h = incsum(diff[:NH].reshape(H, W + 1), 1)[:, :W]
    cov_v = incsum(diff[NH:NH + NV].reshape(H + 1, W), 0)[:H]
    stop = (cov_h + cov_v) > 0

    # rare cells assigned to a light other than their run's owner
    ex_ok = ls.sextra_cell >= 0
    ex_stop = ex_ok & state.light_stop[jnp.clip(ls.sextra_light, 0, L - 1)]
    extra = jnp.zeros((HW + 1,), bool).at[
        jnp.where(ex_stop, ls.sextra_cell, HW)].max(ex_stop)[:HW]
    return stop | extra.reshape(H, W)


def apply_light_overrides(state: LightsState,
                          light_force: jnp.ndarray) -> LightsState:
    """Host-bridge Go/Stop endpoints (`traffic_light_control.py:254-402`):
    -1 none, 0 force go, 1 force stop."""
    ls = state.light_stop
    ls = jnp.where(light_force == 0, False, ls)
    ls = jnp.where(light_force == 1, True, ls)
    return state.replace(light_stop=ls)
