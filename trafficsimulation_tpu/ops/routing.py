"""On-device routing: per-destination cost-to-go fields + greedy descent.

Replaces the reference's per-vehicle A* (`astar_numba.py:87-239`, batched
TF variant `astar_tensorflow_batch.py:108-304`) with multi-destination
value iteration over the lane graph — the plan from SURVEY §7.3(1): all
vehicles heading to the same destination share one field; per-vehicle
divergence (dynamic obstacles, contraflow overtakes) is handled by local
penalties at step-choice time.

Cost model = the reference A* edge costs (`astar_numba.py:11-24,184-230`):
  base 1 per cell
  + VEHICLE_TURN_PENALTY when the move direction changes
  + road-type penalty of the *entered* cell (R1 0.5 / R2 5 / R3 50,
    with road_type_map parity: intersections/entrances/ring-corners = 1)
  + dynamic: occupied cell VEHICLE_OBSTACLE_PENALTY_VEHICLE x
    (1 + VEHICLE_DYNAMIC_PENALTY_SCALE * density), stop cell
    VEHICLE_OBSTACLE_PENALTY_STOP, contraflow VEHICLE_CONTRAFLOW_PENALTY.

Unlike the reference (dist keyed by cell only), the field carries the
heading dimension, so turn penalties are exact.

Field layout: [D, 4, H, W] f32 — W last for TPU lane tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config

# Python float, NOT jnp.float32: a module-level device constant would
# initialize the JAX backend at import time (observed hanging every
# package import when the TPU tunnel is down).  Weak-typed promotion
# keeps every `jnp.where(..., INF)` / `>= INF` use f32.
INF = 1e9


def _shift_plane(f: jnp.ndarray, d: int, fill) -> jnp.ndarray:
    """Value at the neighbor in direction d along the last two axes."""
    out = jnp.full_like(f, fill)
    if d == C.N_IDX:
        return out.at[..., :-1, :].set(f[..., 1:, :])
    if d == C.S_IDX:
        return out.at[..., 1:, :].set(f[..., :-1, :])
    if d == C.E_IDX:
        return out.at[..., :, :-1].set(f[..., :, 1:])
    return out.at[..., :, 1:].set(f[..., :, :-1])


def road_type_penalty(cfg: Config, road_class: jnp.ndarray) -> jnp.ndarray:
    """Penalty for entering a cell, by road_type_map value [H, W]."""
    if not cfg.VEHICLE_ROAD_TYPES_PENALTIES_ENABLED:
        return jnp.zeros(road_class.shape, jnp.float32)
    tab = jnp.array([0.0, cfg.VEHICLE_ROAD_TYPES_PENALTY_R1,
                     cfg.VEHICLE_ROAD_TYPES_PENALTY_R2,
                     cfg.VEHICLE_ROAD_TYPES_PENALTY_R3], jnp.float32)
    return tab[jnp.clip(road_class.astype(jnp.int32), 0, 3)]


def compute_cost_fields(cfg: Config, allowed_dirs: jnp.ndarray,
                        road_class: jnp.ndarray, dest_pos: jnp.ndarray,
                        dest_valid: jnp.ndarray,
                        max_iters: int | None = None,
                        is_road: jnp.ndarray = None) -> jnp.ndarray:
    """Value-iterate cost-to-go fields.

    F[d, h, y, x] = min cost to reach destination d from (y,x) when the
    vehicle's current heading is h.  Returns [D, 4, H, W] f32 (INF where
    unreachable).

    With `is_road`, moves onto road cells AGAINST the flow are included
    at +VEHICLE_CONTRAFLOW_PENALTY per cell — the reference A*'s
    `ignore_flow` cost model (`astar_numba.py:184-214`), which is what
    lets the overtake/stuck-detour ladders route THROUGH an opposite
    lane and merge back (`vehicle_base.py:309-419`).  The penalty is so
    large that wherever a legal path exists it dominates; only vehicles
    holding a contraflow allowance may actually take the contraflow
    moves (engine gating)."""
    H, W = allowed_dirs.shape
    D = dest_pos.shape[0]
    if max_iters is None:
        max_iters = 3 * (H + W)
    tp = jnp.float32(cfg.VEHICLE_TURN_PENALTY
                     if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0.0)
    cp = jnp.float32(cfg.VEHICLE_CONTRAFLOW_PENALTY)
    use_contra = is_road is not None and (
        cfg.VEHICLE_CONTRAFLOW_OVERTAKE_ACTIVE
        or cfg.VEHICLE_STUCK_CONTRAFLOW_ENABLED)
    enter = 1.0 + road_type_penalty(cfg, road_class)          # [H, W]
    bits = allowed_dirs

    dest_oh = jnp.zeros((D, H * W), bool).at[
        jnp.arange(D), jnp.clip(dest_pos, 0, H * W - 1)].set(dest_valid)
    dest_oh = dest_oh.reshape(D, H, W)

    F0 = jnp.where(dest_oh[:, None], 0.0, INF)                # [D, 1, H, W]
    F0 = jnp.broadcast_to(F0, (D, 4, H, W))

    def sweep(F):
        # cand[m] = enter(n_m) + F[m at n_m]  (cost of moving m then
        # continuing with heading m)
        cands = []
        for m in range(4):
            fn = _shift_plane(F[:, m], m, INF)                # [D, H, W]
            en = _shift_plane(enter, m, INF)                  # [H, W]
            legal = (bits & jnp.uint8(C.DIR_BITS[m])) != 0
            if use_contra:
                rd = _shift_plane(is_road, m, False)
                extra = jnp.where(legal, 0.0, cp)
                cands.append(jnp.where(legal | rd, fn + en + extra, INF))
            else:
                cands.append(jnp.where(legal, fn + en, INF))
        cand = jnp.stack(cands, axis=1)                       # [D, 4, H, W]
        best_any = jnp.min(cand, axis=1, keepdims=True)
        # heading h either continues straight (cand[h]) or turns (best + tp)
        newF = jnp.minimum(cand, best_any + tp)
        return jnp.minimum(newF, F0)  # destinations pinned at 0

    def cond(carry):
        F, changed, it = carry
        return changed & (it < max_iters)

    def body(carry):
        F, _, it = carry
        newF = sweep(F)
        return newF, jnp.any(newF != F), it + 1

    F, _, _ = jax.lax.while_loop(cond, body, (F0, jnp.bool_(True),
                                              jnp.int32(0)))
    return F


def neighbor_info(pos: jnp.ndarray, H: int, W: int):
    """For flat positions [V], return per-direction neighbor flat index
    [V, 4] and in-bounds mask [V, 4]."""
    y = pos // W
    x = pos % W
    dy = jnp.asarray(C.DIR_DY)[None, :]
    dx = jnp.asarray(C.DIR_DX)[None, :]
    ny = y[:, None] + dy
    nx = x[:, None] + dx
    inb = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
    nflat = jnp.clip(ny, 0, H - 1) * W + jnp.clip(nx, 0, W - 1)
    return nflat, inb


def next_dir_planes(cfg: Config, allowed_dirs: jnp.ndarray,
                    enter_dyn: jnp.ndarray, hard: jnp.ndarray,
                    is_road: jnp.ndarray, dynb: jnp.ndarray,
                    F: jnp.ndarray) -> jnp.ndarray:
    """Per-tick next-hop planes: the greedy-descent argmin evaluated for
    EVERY cell at full vector bandwidth, so the per-vehicle lookahead
    becomes one u8 gather per step (TPU random gathers are the per-index
    bottleneck; plane math is free by comparison).

    Returns u8 [D, 5, H, W]: [dest, heading+1, y, x].  Value encoding:
    bits 0-2 = best move direction, bit 3 = target cell is a stop cell,
    bit 4 = target cell is occupied (both from `dynb`, the per-cell
    dynamic byte), bit 5 = the move is contraflow (only vehicles with a
    contraflow allowance may take it; others treat it as blocked —
    exactly when the reference's overtake/detour ladder would trigger),
    255 = no legal move.  heading slot 0 = unknown heading (no turn
    penalty), slots 1..4 = N/E/S/W.
    """
    H, W = allowed_dirs.shape
    tp = jnp.float32(cfg.VEHICLE_TURN_PENALTY
                     if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0.0)
    cp = jnp.float32(cfg.VEHICLE_CONTRAFLOW_PENALTY)

    # dyn byte of the target cell per move direction (shifted planes).
    # The per-move "extra" byte (dyn bits + contraflow flag) is cheap to
    # keep as 4 [H, W] planes; the expensive [D, ...] work streams with
    # running min/argmin so no [D, 4, H, W] transient materializes (it
    # would dominate HBM under vmapped world batches).
    dyn2d = dynb.reshape(H, W)
    extras = []
    per_m = []
    for m in range(4):
        en = _shift_plane(enter_dyn, m, INF)             # [H, W]
        hd = _shift_plane(hard, m, True)
        rd = _shift_plane(is_road, m, False)
        legal = (allowed_dirs & jnp.uint8(C.DIR_BITS[m])) != 0
        ok = (legal | rd) & ~hd
        base_hw = en + jnp.where(legal, 0.0, cp)
        per_m.append((jnp.where(ok, base_hw, INF),))
        extras.append((_shift_plane(dyn2d, m, 0).astype(jnp.uint8) << 3)
                      | (jnp.uint8(m))
                      | ((~legal).astype(jnp.uint8) << 5))

    def cand_m(m):
        fn = _shift_plane(F[:, m], m, INF)               # [D, H, W]
        return fn + per_m[m][0]

    best = cand_m(0)
    arg = jnp.zeros(best.shape, jnp.uint8)
    for m in range(1, 4):
        c = cand_m(m)
        upd = c < best
        best = jnp.where(upd, c, best)
        arg = jnp.where(upd, jnp.uint8(m), arg)
    none_any = best >= INF

    # extras byte of the chosen direction (dir | dyn<<3 | contra<<5)
    enc_best = jnp.where(arg == 0, extras[0],
                         jnp.where(arg == 1, extras[1],
                                   jnp.where(arg == 2, extras[2],
                                             extras[3])))
    enc_best = jnp.where(none_any, jnp.uint8(255), enc_best)
    slot0 = enc_best[:, None]
    # heading h: straight move cand[h] vs best turn (best + tp)
    per_h = []
    for h in range(4):
        take_straight = cand_m(h) <= best + tp
        d_h = jnp.where(take_straight, extras[h], enc_best)
        d_h = jnp.where(none_any, jnp.uint8(255), d_h)
        per_h.append(d_h)
    return jnp.concatenate(
        [slot0, jnp.stack(per_h, axis=1)], axis=1)       # [D, 5, H, W]


def route_argmin(cfg: Config, H: int, W: int, allowed_flat: jnp.ndarray,
                 enter_flat: jnp.ndarray, is_road_flat: jnp.ndarray,
                 F: jnp.ndarray, pos: jnp.ndarray, heading: jnp.ndarray,
                 dest: jnp.ndarray, soft_cost_flat: jnp.ndarray,
                 hard_flat: jnp.ndarray, allow_contraflow: jnp.ndarray):
    """Greedy descent step choice for a batch of vehicles.

    soft_cost_flat [H*W] f32 — additive dynamic penalty for entering a
    cell (moving-vehicle + stop penalties per `astar_core`
    `astar_numba.py:193-214`); hard_flat [H*W] bool — impassable cells
    (stranded/parked occupants; the reference's strict phase-1 planner
    treats these as hard blocks, `vehicle_base.py:280-291`).

    Returns (best_dir [V] i32 (-1 if no move), best_next [V] flat index,
    best_cost [V]).
    """
    V = pos.shape[0]
    D4 = F.reshape(F.shape[0] * 4, H * W)
    nflat, inb = neighbor_info(jnp.clip(pos, 0, H * W - 1), H, W)  # [V,4]
    my_bits = allowed_flat[jnp.clip(pos, 0, H * W - 1)]            # [V]
    tp = jnp.float32(cfg.VEHICLE_TURN_PENALTY
                     if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0.0)

    costs = []
    for m in range(4):
        n = nflat[:, m]
        legal = (my_bits & jnp.uint8(C.DIR_BITS[m])) != 0
        contra = ~legal & allow_contraflow & is_road_flat[n]
        ok = inb[:, m] & (legal | contra) & ~hard_flat[n]
        c = enter_flat[n] + soft_cost_flat[n]
        c = c + jnp.where(contra, jnp.float32(cfg.VEHICLE_CONTRAFLOW_PENALTY),
                          0.0)
        c = c + jnp.where((heading >= 0) & (heading != m), tp, 0.0)
        fval = D4[jnp.clip(dest, 0, F.shape[0] - 1) * 4 + m, n]
        costs.append(jnp.where(ok, c + fval, INF))
    cost = jnp.stack(costs, axis=1)                                # [V, 4]
    best_dir = jnp.argmin(cost, axis=1).astype(jnp.int32)
    best_cost = jnp.min(cost, axis=1)
    none = best_cost >= INF
    best_next = jnp.where(none, pos,
                          nflat[jnp.arange(V), best_dir])
    best_dir = jnp.where(none, -1, best_dir)
    return best_dir, best_next, best_cost


def dynamic_soft_costs(cfg: Config, occ_moving_flat: jnp.ndarray,
                       stop_flat: jnp.ndarray,
                       density_flat: jnp.ndarray) -> jnp.ndarray:
    """Soft entry penalties (`astar_core` `astar_numba.py:193-214`)."""
    if cfg.VEHICLE_DYNAMIC_PENALTIES_ENABLED:
        vp = cfg.VEHICLE_OBSTACLE_PENALTY_VEHICLE * (
            1.0 + cfg.VEHICLE_DYNAMIC_PENALTY_SCALE * density_flat)
    else:
        vp = jnp.full_like(density_flat, cfg.VEHICLE_OBSTACLE_PENALTY_VEHICLE)
    c = jnp.where(occ_moving_flat, vp, 0.0)
    return c + jnp.where(stop_flat,
                         jnp.float32(cfg.VEHICLE_OBSTACLE_PENALTY_STOP), 0.0)
