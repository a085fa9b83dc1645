"""Vectorized per-group RL state features.

One segment-sum over the lane-label planes yields every group's local
flows at once; the reference computes these per group with njit gathers
(`rl_simple.py:30-80`, `rl_a2c.py:41-70`, `rl_gatdqn.py:105-175`).

Cross pressures p_ns = local_ns - local_ew follow `compute_pressure`
(`rl_simple.py:54-58`).  Neighbor averages use each neighbor's current
cross pressures (plain mean over valid neighbors; the reference's
occupancy-weighted variant `avg_pressures_in_neighbors`
`numba_utilities.py:154-180` falls back to the plain mean whenever it is
reached before neighbors cache occupancies).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import Grid, GroupStatic, LightsState

NS_IN, NS_OUT, EW_IN, EW_OUT = 0, 1, 2, 3


def group_flows(grid: Grid, flow_map: jnp.ndarray, num_groups: int):
    """(local_ns, local_ew) per group: sum of flow_map over in-flow lane
    cells."""
    G = num_groups
    qg = grid.queue_group.reshape(-1)
    qb = grid.queue_bucket.reshape(-1).astype(jnp.int32)
    seg = jnp.where(qg >= 0, qg * 5 + qb, G * 5)
    vals = flow_map.reshape(-1).astype(jnp.float32)
    sums = jnp.zeros((G * 5 + 1,), jnp.float32).at[seg].add(vals)
    q = sums[:G * 5].reshape(G, 5)
    return q[:, NS_IN], q[:, EW_IN]


def neighbor_mean(gs: GroupStatic, vals: jnp.ndarray) -> jnp.ndarray:
    """Mean of `vals` over each group's valid neighbors (cnt >= 1)."""
    G = vals.shape[0]
    s = jnp.zeros((G,), jnp.float32)
    c = jnp.zeros((G,), jnp.int32)
    for d in range(4):
        nb = gs.neighbor[:, d]
        has = nb >= 0
        s = s + jnp.where(has, vals[jnp.clip(nb, 0, G - 1)], 0.0)
        c = c + has.astype(jnp.int32)
    return s / jnp.maximum(c, 1)


def srl_state(cfg, grid: Grid, gs: GroupStatic, lights: LightsState,
              occupancy, stuck_map):
    """`get_rl_state` (`rl_simple.py:95-143`): 7/11/13/17/19 dims."""
    G = gs.valid.shape[0]
    ln, le = group_flows(grid, occupancy, G)
    p_ns, p_ew = ln - le, le - ln
    phase = lights.ft_phase   # RL phase register
    ph0 = (phase == 0).astype(jnp.float32)
    t_norm = lights.rl_timer.astype(jnp.float32) / 30.0
    cols = [ln, le, p_ns, p_ew, ph0, 1.0 - ph0, t_norm]
    if cfg.SRL_INPUT_DIMENSIONS > 7:
        cols += [gs.intersection_size, gs.penalty_score,
                 neighbor_mean(gs, gs.intersection_size),
                 neighbor_mean(gs, gs.penalty_score)]
    if cfg.SRL_INPUT_DIMENSIONS > 11:
        cols += [neighbor_mean(gs, p_ns), neighbor_mean(gs, p_ew)]
    if cfg.SRL_INPUT_DIMENSIONS > 13:
        sn, se = group_flows(grid, stuck_map, G)
        cols += [sn, se, sn - se, se - sn]
    if cfg.SRL_INPUT_DIMENSIONS > 17:
        sn, se = group_flows(grid, stuck_map, G)
        cols += [neighbor_mean(gs, sn - se), neighbor_mean(gs, se - sn)]
    return jnp.stack(cols, axis=1)


def a2c_state(cfg, grid: Grid, gs: GroupStatic, lights: LightsState,
              occupancy):
    """`get_rl_state` (`rl_a2c.py:41-70`): 13 dims."""
    G = gs.valid.shape[0]
    ln, le = group_flows(grid, occupancy, G)
    p_ns, p_ew = ln - le, le - ln
    phase = lights.ft_phase
    ph0 = (phase == 0).astype(jnp.float32)
    t_norm = lights.rl_timer.astype(jnp.float32) / 30.0
    return jnp.stack([
        ln, le, p_ns, p_ew,
        neighbor_mean(gs, p_ns), neighbor_mean(gs, p_ew),
        ph0, 1.0 - ph0, t_norm,
        gs.intersection_size, gs.penalty_score,
        neighbor_mean(gs, gs.intersection_size),
        neighbor_mean(gs, gs.penalty_score)], axis=1)


def gat_state(cfg, grid: Grid, gs: GroupStatic, lights: LightsState,
              occupancy):
    """`get_gat_state` (`rl_gatdqn.py:105-175`): star graph of
    (1 + 4 neighbors) x 9 features + validity mask."""
    G = gs.valid.shape[0]
    ln, le = group_flows(grid, occupancy, G)
    p_ns, p_ew = ln - le, le - ln
    phase = lights.ft_phase
    ph0 = (phase == 0).astype(jnp.float32)
    t_norm = lights.rl_timer.astype(jnp.float32) / 30.0
    node = jnp.stack([ln, le, p_ns, p_ew, ph0, 1.0 - ph0, t_norm,
                      gs.intersection_size, gs.penalty_score], axis=1)
    feats = [node]
    masks = [jnp.ones((G,), jnp.float32)]
    for d in range(4):
        nb = gs.neighbor[:, d]
        has = nb >= 0
        nbs = jnp.clip(nb, 0, G - 1)
        feats.append(jnp.where(has[:, None], node[nbs], 0.0))
        masks.append(has.astype(jnp.float32))
    return jnp.stack(feats, axis=1), jnp.stack(masks, axis=1)  # [G,5,9],[G,5]
