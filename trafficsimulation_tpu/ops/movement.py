"""Vehicle decide + cellular-automaton movement commit.

The reference's per-vehicle `step_decide` / `step`
(`vehicle_base.py:616-753`) becomes a two-phase array program, matching
the reference's own batched-decide mode (`PATHFINDING_BATCHING`,
`city_model.py:1811-1829, 1855-1858`): all decisions read start-of-tick
maps; movement executes in VEHICLE_MAX_SPEED sub-rounds with
deterministic random priority resolving conflicts (SURVEY §7.3(2)).

Decide per tick (`step_decide` `vehicle_base.py:616-663`):
  stranded ticking -> malfunction roll -> sideswipe roll -> red-light
  check -> speed (persistent cruising speed re-rolled after full stops,
  rain penalty `vehicle_base.py:94-107`) -> route lookahead (the A*
  path of the reference becomes greedy cost-field descent) -> obstacle
  scan (`_scan_ahead_for_obstacles` `vehicle_base.py:422-452`) ->
  max_steps (`_determine_max_steps` `vehicle_base.py:719-731`).

Contraflow ladder (`vehicle_base.py:309-419`): stranded/parked blockers
are hard obstacles; when the strict pass yields no progress and the
blocker ahead is stranded/parked (overtake) or the vehicle has been
stuck past the threshold (detour), a second descent pass permits
contraflow moves at VEHICLE_CONTRAFLOW_PENALTY for a bounded duration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from ..core.state import Vehicles
from . import routing
from .routing import dynamic_soft_costs


def _lookahead_nd(cfg, H, W, nd_planes, vehicles: Vehicles,
                  allow_contra, K: int, dest_pos_of_vehicle):
    """Greedy-descent path via precomputed next-dir planes: exactly one
    u8 gather per path step.  Contraflow-flagged moves (bit 5) are only
    taken by vehicles holding a contraflow allowance.

    Returns (cells, dirs, valid, on_stop, on_veh), all [K, V]."""
    V = vehicles.pos.shape[0]
    HW = H * W
    D = nd_planes.shape[0]
    ndf = nd_planes.reshape(-1)
    # flat-step offsets per direction (N=+W, E=+1, S=-W, W=-1)
    offs = jnp.array([W, 1, -W, -1, 0], jnp.int32)

    p = jnp.clip(vehicles.pos, 0, HW - 1)
    h1 = jnp.clip(vehicles.heading, -1, 3) + 1
    alive = vehicles.active
    dest = jnp.clip(vehicles.dest, 0, D - 1)
    row_base = (dest * 5) * HW

    cells, dirs, valids, stops, vehs = [], [], [], [], []
    for _k in range(K):
        nd = ndf[row_base + h1 * HW + p]            # u8 [V]
        at_dest = p == dest_pos_of_vehicle
        contra_mv = (nd & 32) != 0                  # bit 5: contraflow move
        ok = alive & ~at_dest & (nd != 255) & (~contra_mv | allow_contra)
        d = (nd & 7).astype(jnp.int32)              # bits 0-2: direction
        step = offs[jnp.clip(d, 0, 4)]
        np_ = jnp.clip(p + jnp.where(ok, step, 0), 0, HW - 1)
        cells.append(np_)
        dirs.append(jnp.where(ok, d, -1))
        valids.append(ok)
        stops.append(ok & ((nd & 8) != 0))          # bit 3: target stop
        vehs.append(ok & ((nd & 16) != 0))          # bit 4: target occupied
        p = np_
        h1 = jnp.where(ok, d + 1, h1)
        alive = ok
    stack = lambda xs: jnp.stack(xs, axis=0)        # [K, V]
    return (stack(cells), stack(dirs), stack(valids), stack(stops),
            stack(vehs))


def decide(cfg: Config, H: int, W: int, allowed_dirs, enter, is_road,
           intersection_flat, F, dest_pos_all,
           vehicles: Vehicles, veh_map, stop_map, rain_map, density,
           key, ped_block=None):
    """Returns (vehicles', path_cells [V,K], path_dirs, path_valid,
    max_steps [V]).  allowed_dirs/enter/is_road are [H, W] planes;
    ped_block optionally marks cells with crossing pedestrians (hard
    obstacles for vehicles)."""
    V = vehicles.pos.shape[0]
    HW = H * W
    k_mal, k_side, k_speed = jax.random.split(key, 3)
    pos = jnp.clip(vehicles.pos, 0, HW - 1)
    active = vehicles.active

    # ---- stranded ticking (`_tick_stranded` `vehicle_base.py:552-566`)
    stranded = vehicles.in_collision | vehicles.in_malfunction
    st = jnp.where(active & stranded, vehicles.stranded_ticks - 1,
                   vehicles.stranded_ticks)
    recovered = active & stranded & (st <= 0)
    in_collision = vehicles.in_collision & ~recovered
    in_malfunction = vehicles.in_malfunction & ~recovered
    st = jnp.where(recovered, 0, st)
    still_stranded = active & (in_collision | in_malfunction)

    # ---- malfunction roll (intended semantics of `vehicle_base.py:608-610`;
    # the reference's probability check is inverted — documented bug)
    if cfg.VEHICLE_MALFUNCTION_ACTIVE:
        roll = jax.random.uniform(k_mal, (V,)) < cfg.VEHICLE_MALFUNCTION_CHANCE
        new_mal = active & ~still_stranded & ~vehicles.parked & roll
        in_malfunction = in_malfunction | new_mal
        st = jnp.where(new_mal, cfg.VEHICLE_MALFUNCTION_DURATION, st)
        still_stranded = still_stranded | new_mal
    else:
        new_mal = jnp.zeros((V,), bool)

    # ---- sideswipe roll (`_check_sideswipe_collision`
    # `vehicle_base.py:567-605`): a moving lateral neighbor heading the
    # opposite way collides with probability VEHICLE_SIDESWIPE_COLLISION_CHANCE
    new_col = jnp.zeros((V,), bool)
    if cfg.VEHICLE_SIDESWIPE_COLLISION_ACTIVE:
        vm = veh_map.reshape(-1)
        y, x = pos // W, pos % W
        moving = active & (vehicles.current_speed > 0) & \
            ~vehicles.is_stuck & ~vehicles.parked & ~still_stranded
        has_head = vehicles.heading >= 0
        side_hit = jnp.zeros((V,), bool)
        for side in (1, 3):  # right of / left of heading
            lat = (vehicles.heading + side) % 4
            ny = y + jnp.asarray(C.DIR_DY)[jnp.clip(lat, 0, 3)]
            nx = x + jnp.asarray(C.DIR_DX)[jnp.clip(lat, 0, 3)]
            inb = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
            nb = vm[jnp.clip(ny, 0, H - 1) * W + jnp.clip(nx, 0, W - 1)]
            nb_ok = inb & (nb >= 0)
            nbs = jnp.clip(nb, 0, V - 1)
            nb_moving = (vehicles.current_speed[nbs] > 0) & \
                ~vehicles.is_stuck[nbs] & ~vehicles.parked[nbs] & \
                ~vehicles.in_collision[nbs] & ~vehicles.in_malfunction[nbs]
            nb_opposite = vehicles.heading[nbs] == (vehicles.heading + 2) % 4
            side_hit = side_hit | (nb_ok & nb_moving & nb_opposite)
        roll = jax.random.uniform(k_side, (V,)) < \
            cfg.VEHICLE_SIDESWIPE_COLLISION_CHANCE
        new_col = moving & has_head & side_hit & roll
        in_collision = in_collision | new_col
        st = jnp.where(new_col, cfg.VEHICLE_SIDESWIPE_COLLISION_DURATION, st)
        still_stranded = still_stranded | new_col

    # ---- red light / parked: full stop
    at_stop = stop_map.reshape(-1)[pos]
    halted = still_stranded | (active & at_stop) | vehicles.parked

    # ---- speed (`_compute_speed` `vehicle_base.py:94-107`)
    base = vehicles.base_speed
    new_roll = jax.random.randint(k_speed, (V,), cfg.VEHICLE_MIN_SPEED,
                                  cfg.VEHICLE_MAX_SPEED + 1)
    base = jnp.where(active & (base == 0), new_roll, base)
    speed = base
    if cfg.RAIN_ENABLED:
        rained = rain_map.reshape(-1)[pos]
        speed = jnp.where(rained,
                          jnp.maximum(1, speed - cfg.RAIN_SPEED_REDUCTION),
                          speed)
    speed = jnp.where(halted, 0, speed)
    base = jnp.where(halted, 0, base)

    # ---- dynamic obstacle planes ---------------------------------------
    vm = veh_map.reshape(-1)
    occ = vm >= 0
    # stranded-occupant plane via a [V]-scatter (cheaper on TPU than a
    # [H*W]-gather of per-vehicle flags)
    vstr = vehicles.active & (vehicles.in_collision |
                              vehicles.in_malfunction | vehicles.parked)
    vpos = jnp.where(vehicles.active, jnp.clip(vehicles.pos, 0, HW - 1), HW)
    occ_stranded = jnp.zeros((HW + 1,), bool).at[vpos].max(vstr)[:HW]
    if ped_block is not None:
        occ_stranded = occ_stranded | ped_block
    occ_moving = occ & ~occ_stranded
    soft = dynamic_soft_costs(cfg, occ_moving, stop_map.reshape(-1),
                              density.reshape(-1))
    enter_dyn = enter + soft.reshape(H, W)
    hard = occ_stranded.reshape(H, W)

    # next-hop planes: all the routing math at vector bandwidth ----------
    dynb = (stop_map.reshape(-1).astype(jnp.uint8)
            | (occ.astype(jnp.uint8) << 1))
    nd_planes = routing.next_dir_planes(cfg, allowed_dirs, enter_dyn, hard,
                                        is_road, dynb, F)
    D = F.shape[0]
    ndf = nd_planes.reshape(-1)

    dest_pos_of_vehicle = dest_pos_all[jnp.clip(vehicles.dest, 0,
                                                dest_pos_all.shape[0] - 1)]

    # ---- contraflow triggers (`vehicle_base.py:309-419`).  Stranded
    # blockers are hard obstacles, so the best move being contraflow (or
    # none at all) on the first step = blocked by a stranded/parked car
    # or a dead end -> the reference's overtake trigger.
    destc = jnp.clip(vehicles.dest, 0, D - 1)
    h1 = jnp.clip(vehicles.heading, -1, 3) + 1
    first_nd = ndf[(destc * 5 + h1) * HW + pos]
    blocked = active & ~halted & \
        ((first_nd == 255) | ((first_nd & 32) != 0)) & \
        (pos != dest_pos_of_vehicle)
    overtake = cfg.VEHICLE_CONTRAFLOW_OVERTAKE_ACTIVE & blocked
    at_inter = intersection_flat[pos]
    stuck_thresh = jnp.where(
        at_inter, cfg.VEHICLE_STUCK_CONTRAFLOW_THRESHOLD_INTERSECTION,
        cfg.VEHICLE_STUCK_CONTRAFLOW_THRESHOLD)
    stuck_detour = (cfg.VEHICLE_STUCK_CONTRAFLOW_ENABLED &
                    (vehicles.stuck_ticks >= stuck_thresh))
    contra_ticks = jnp.maximum(vehicles.contraflow_ticks - 1, 0)
    newly = active & ~halted & (overtake | stuck_detour) & (contra_ticks == 0)
    contra_ticks = jnp.where(
        newly, jnp.where(stuck_detour,
                         cfg.VEHICLE_CONTRAFLOW_STUCK_DETOUR_DURATION,
                         cfg.VEHICLE_CONTRAFLOW_OVERTAKE_DURATION),
        contra_ticks)
    allow_contra = active & ~halted & (contra_ticks > 0)

    # ---- lookahead: only the first VEHICLE_MAX_SPEED cells can bound
    # max_steps (speed <= MAX_SPEED), so K = MAX_SPEED suffices for exact
    # `_determine_max_steps` semantics (`vehicle_base.py:719-731`).
    K = cfg.VEHICLE_MAX_SPEED
    cells, dirs, valid, on_stop, on_veh = _lookahead_nd(
        cfg, H, W, nd_planes, vehicles, allow_contra, K,
        dest_pos_of_vehicle)

    # ---- obstacle scan (`_scan_ahead_for_obstacles`) --------------------
    idxs = jnp.arange(K)[:, None]
    big = jnp.int32(K + 16)
    idx_stop = jnp.min(jnp.where(on_stop, idxs, big), axis=0)
    idx_vehicle = jnp.min(jnp.where(on_veh, idxs, big), axis=0)
    path_len = jnp.sum(valid, axis=0)

    max_steps = jnp.minimum(speed, path_len)
    max_steps = jnp.minimum(max_steps, idx_stop)
    max_steps = jnp.minimum(max_steps, idx_vehicle)
    max_steps = jnp.where(active & ~halted, max_steps, 0)
    # full stop resets the cruising speed (`step_decide`
    # `vehicle_base.py:656-659`)
    base = jnp.where(active & (max_steps <= 0), 0, base)

    new_vehicles = vehicles.replace(
        base_speed=base,
        current_speed=jnp.where(active, speed, vehicles.current_speed),
        stranded_ticks=st,
        in_collision=in_collision,
        in_malfunction=in_malfunction,
        contraflow_ticks=jnp.where(active, contra_ticks,
                                   vehicles.contraflow_ticks),
    )
    events = dict(new_malfunctions=jnp.sum(new_mal),
                  new_collisions=jnp.sum(new_col))
    return new_vehicles, cells, dirs, valid, on_stop, max_steps, events


def move(cfg: Config, H: int, W: int, vehicles: Vehicles, veh_map,
         stop_map, cells, dirs, valid, on_stop, max_steps, key,
         ped_block=None):
    """Execute movement in VEHICLE_MAX_SPEED sub-rounds with random-priority
    conflict resolution (`_execute_movement` `vehicle_base.py:733-753`).
    cells/dirs/valid/on_stop are [K, V] (K-major so each sub-round reads
    one row; stop flags come from the decide-time lookahead — lights
    update before decide, so they are current)."""
    V = vehicles.pos.shape[0]
    HW = H * W
    prio = jax.random.permutation(key, V).astype(jnp.int32)
    stop_flat = stop_map.reshape(-1)

    def subround(s, carry):
        pos, heading, vm, halted, moved = carry
        want = vehicles.active & ~halted & (s < max_steps)
        tgt = jnp.clip(cells[s], 0, HW - 1)
        d = dirs[s]
        ok = want & valid[s]
        # runtime re-checks (`vehicle_base.py:739-746`)
        stop_block = ok & on_stop[s] & (s != max_steps - 1)
        occ_block = ok & (vm[tgt] >= 0)
        if ped_block is not None:
            occ_block = occ_block | (ok & ped_block[tgt])
        proposer = ok & ~stop_block & ~occ_block
        # conflict resolution: lowest priority value wins the cell
        win_tab = jnp.full((HW + 1,), jnp.int32(2**30)).at[
            jnp.where(proposer, tgt, HW)].min(prio)
        win = proposer & (win_tab[tgt] == prio)
        halted = halted | (want & ~win)
        # commit winners
        old = jnp.clip(pos, 0, HW - 1)
        vm = vm.at[jnp.where(win, old, HW)].set(-1, mode="drop")
        vm = vm.at[jnp.where(win, tgt, HW)].set(
            jnp.arange(V, dtype=jnp.int32), mode="drop")
        pos = jnp.where(win, tgt, pos)
        heading = jnp.where(win, d, heading)
        moved = moved + win.astype(jnp.int32)
        return pos, heading, vm, halted, moved

    vm = jnp.concatenate([veh_map.reshape(-1),
                          jnp.full((1,), -1, jnp.int32)])
    init = (vehicles.pos, vehicles.heading, vm,
            jnp.zeros((V,), bool), jnp.zeros((V,), jnp.int32))
    pos, heading, vm, halted, moved = jax.lax.fori_loop(
        0, cfg.VEHICLE_MAX_SPEED, subround, init)
    veh_map = vm[:HW].reshape(H, W)

    # stuck bookkeeping: moving resets; standing still off a stop cell
    # increments (`_move_to` `vehicle_base.py:528-532`, `tick_stuck`
    # `vehicle_base.py:687-693`)
    did_move = moved > 0
    at_stop = stop_flat[jnp.clip(pos, 0, HW - 1)]
    stuck_inc = vehicles.active & ~did_move & ~at_stop
    stuck_ticks = jnp.where(did_move, 0,
                            jnp.where(stuck_inc, vehicles.stuck_ticks + 1,
                                      vehicles.stuck_ticks))
    is_stuck = jnp.where(did_move, False,
                         jnp.where(stuck_ticks >
                                   cfg.VEHICLE_STUCK_RECOMPUTE_THRESHOLD,
                                   True, vehicles.is_stuck))

    new_vehicles = vehicles.replace(
        pos=pos, heading=heading,
        steps_traveled=vehicles.steps_traveled + moved,
        stuck_ticks=stuck_ticks, is_stuck=is_stuck)
    return new_vehicles, veh_map
