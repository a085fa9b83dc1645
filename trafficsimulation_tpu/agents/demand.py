"""Time-of-day demand: pre-generated device-resident trip tables.

Re-expresses `DynamicTrafficAgent` (`dynamic_traffic_generator.py:18-430`):
the per-day trip list becomes a fixed-layout array whose *counts, kinds
and zone assignment are static* (they depend only on config — trip counts
are `round(P * frac)` of config constants, `:337-396`), while departure
times, origins and destinations are drawn on-device.

Largest-remainder service quotas: `compute_quotas`
(`dynamic_traffic_generator.py:319-331`).
Spawn rule: trips with `prev < depart <= now` spawn each tick (`:182-186`);
day-0 trips scheduled before the simulation start never spawn (`:161-186`
semantics with SIMULATION_STARTING_TIME_OF_DAY offset).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import codes as C
from ..config import Config, ABBR
from ..core.state import Demand

KIND_INTERNAL, KIND_THROUGH, KIND_FOOD, KIND_WASTE = 0, 1, 2, 3


def largest_remainder(total: int, shares) -> list:
    """`compute_quotas` (`dynamic_traffic_generator.py:319-331`)."""
    float_counts = [total * s for s in shares]
    floors = [math.floor(x) for x in float_counts]
    rem = total - sum(floors)
    fracs = sorted(enumerate(float_counts),
                   key=lambda iv: iv[1] - math.floor(iv[1]), reverse=True)
    for i in range(rem):
        floors[fracs[i][0]] += 1
    return floors


@dataclass(frozen=True)
class TripLayout:
    """Static per-slot tables (host numpy; shapes fixed by config)."""
    zone_start: np.ndarray   # i32 [T] zone start hour
    zone_end: np.ndarray     # i32 [T]
    kind: np.ndarray         # u8 [T]
    o_code: np.ndarray       # u8 [T] origin block type code (internal only)
    d_code: np.ndarray       # u8 [T] dest block type code
    j_idx: np.ndarray        # i32 [T] service slot index within zone
    n_svc: np.ndarray        # i32 [T] service quota of the zone
    size: int


def trip_layout(cfg: Config) -> TripLayout:
    zs, ze, kind, oc, dc, jj, nn = [], [], [], [], [], [], []

    shares = [z.through_distribution for z in cfg.TIME_ZONES]
    food_q = largest_remainder(cfg.TOTAL_SERVICE_VEHICLES_FOOD, shares)
    waste_q = largest_remainder(cfg.TOTAL_SERVICE_VEHICLES_WASTE, shares)

    def add(zone, k, o=0, d=0, j=0, n=0):
        zs.append(zone.start_hour)
        ze.append(zone.end_hour)
        kind.append(k)
        oc.append(o)
        dc.append(d)
        jj.append(j)
        nn.append(n)

    for zi, zone in enumerate(cfg.TIME_ZONES):
        for (o, d, frac) in zone.internal_distribution:
            cnt = round(cfg.INTERNAL_POPULATION_TRAFFIC_PER_DAY * frac)
            ocode = C.NAME_TO_TYPE[ABBR[o]]
            dcode = C.NAME_TO_TYPE[ABBR[d]]
            for _ in range(cnt):
                add(zone, KIND_INTERNAL, ocode, dcode)
        nf, nw = food_q[zi], waste_q[zi]
        for j in range(1, nf + 1):
            add(zone, KIND_FOOD, j=j, n=nf)
        for j in range(1, nw + 1):
            add(zone, KIND_WASTE, j=j, n=nw)
        thr = round(cfg.PASSING_POPULATION_TRAFFIC_PER_DAY *
                    zone.through_distribution)
        thr = max(0, thr - (nf + nw))   # SERVICE_VEHICLES_COUNT_AS_THROUGH
        for _ in range(thr):
            add(zone, KIND_THROUGH)

    return TripLayout(
        zone_start=np.asarray(zs, np.int32),
        zone_end=np.asarray(ze, np.int32),
        kind=np.asarray(kind, np.uint8),
        o_code=np.asarray(oc, np.uint8),
        d_code=np.asarray(dc, np.uint8),
        j_idx=np.asarray(jj, np.int32),
        n_svc=np.asarray(nn, np.int32),
        size=len(kind))


def _weighted_pick(key, weights: jnp.ndarray, n: int):
    """Sample n indices ~ weights (cumsum + searchsorted).  Returns
    (idx [n], ok [n]) — ok False when all weights are zero."""
    w = weights.astype(jnp.float32)
    cum = jnp.cumsum(w)
    total = cum[-1]
    u = jax.random.uniform(key, (n,)) * total
    idx = jnp.searchsorted(cum, u, side="right")
    idx = jnp.clip(idx, 0, w.shape[0] - 1).astype(jnp.int32)
    return idx, jnp.full((n,), total > 0)


def generate_day(cfg: Config, layout: TripLayout, key, day,
                 current_tick, blk_valid, blk_btype, blk_dest,
                 blk_entrance, dest_valid, dest_kind, entrance_pos,
                 entrance_valid, n_field_dests: int,
                 dest_rid=None) -> Demand:
    """Build one day's Demand table (`_generate_day`
    `dynamic_traffic_generator.py:307-396`).

    `dest_rid`: optional [D] ROUTING-id column (ops/hier.py) — through
    trips store the picked exit's rid instead of its table index (block
    tables already hold rid values, so internal trips need no map)."""
    T = layout.size
    dt = cfg.TIME_PER_STEP_IN_SECONDS
    off = (cfg.SIMULATION_STARTING_TIME_OF_DAY_HOURS * 3600
           + cfg.SIMULATION_STARTING_TIME_OF_DAY_MINUTES * 60)

    kt, ko, kd, ke, kx = jax.random.split(key, 5)
    zsec0 = jnp.asarray(layout.zone_start) * 3600
    zsec1 = jnp.asarray(layout.zone_end) * 3600
    z0 = day * 86400 + zsec0 - off
    span = (zsec1 - zsec0).astype(jnp.float32)
    kind = jnp.asarray(layout.kind)
    is_svc = kind >= KIND_FOOD
    u = jax.random.uniform(kt, (T,))
    t_rand = z0.astype(jnp.float32) + u * span
    t_svc = z0.astype(jnp.float32) + jnp.asarray(layout.j_idx) * span / (
        jnp.asarray(layout.n_svc) + 1).astype(jnp.float32)
    t = jnp.where(is_svc, t_svc, t_rand)
    depart_tick = jnp.ceil(t / dt).astype(jnp.int32)
    valid = depart_tick > current_tick       # past trips never spawn

    # origins / destinations.  Block sampling: one cumsum per zone type,
    # then a batched searchsorted per trip (avoids a [T, B] blowup).
    blk_field_ok = blk_valid & (blk_dest >= 0) & (blk_dest < n_field_dests)
    B = blk_valid.shape[0]
    type_rows = list(C.ZONE_TYPES)
    cums = jnp.stack([
        jnp.cumsum((blk_field_ok & (blk_btype == tc)).astype(jnp.float32))
        for tc in type_rows])                                   # [5, B]
    totals = cums[:, -1]

    def pick_block(key, codes):
        row = jnp.zeros((T,), jnp.int32)
        for i, tc in enumerate(type_rows):
            row = jnp.where(codes == tc, i, row)
        tot = totals[row]
        r = jax.random.uniform(key, (T,)) * tot
        # searchsorted per type row, then select by each trip's row
        idx_by_row = jnp.stack([
            jnp.searchsorted(cums[i], r, side="right")
            for i in range(len(type_rows))])                    # [5, T]
        idx = jnp.take_along_axis(idx_by_row, row[None, :], axis=0)[0]
        return jnp.clip(idx, 0, B - 1).astype(jnp.int32), tot > 0

    ob, ob_ok = pick_block(ko, jnp.asarray(layout.o_code))
    db, db_ok = pick_block(kd, jnp.asarray(layout.d_code))

    ent_idx, ent_ok = _weighted_pick(ke, entrance_valid, T)
    exit_w = dest_valid & (dest_kind == 1) & (
        jnp.arange(dest_valid.shape[0]) < n_field_dests)
    exd, exd_ok = _weighted_pick(kx, exit_w, T)

    # internal: origin block's entrance cell; others: highway entrance cell
    origin = jnp.where(kind == KIND_INTERNAL, blk_entrance[ob],
                       entrance_pos[jnp.clip(ent_idx, 0,
                                             entrance_pos.shape[0] - 1)])
    exd_id = (exd.astype(jnp.int32) if dest_rid is None
              else dest_rid[exd].astype(jnp.int32))
    dest = jnp.where(kind == KIND_INTERNAL, blk_dest[db],
                     jnp.where(kind == KIND_THROUGH, exd_id, -2))
    valid = valid & jnp.where(
        kind == KIND_INTERNAL, ob_ok & db_ok,
        jnp.where(kind == KIND_THROUGH, ent_ok & exd_ok, ent_ok))

    # sort by departure tick (invalid at the end)
    sort_key = jnp.where(valid, depart_tick, jnp.int32(2**30))
    order = jnp.argsort(sort_key)
    return Demand(
        depart_tick=depart_tick[order],
        origin=origin[order],
        dest=dest[order],
        kind=kind[order],
        valid=valid[order],
        cursor=jnp.int32(0),
        day=jnp.asarray(day, jnp.int32),
    )


def generate_days(cfg: Config, layout: TripLayout, key, start_day,
                  n_days: int, current_tick, blk_valid, blk_btype,
                  blk_dest, blk_entrance, dest_valid, dest_kind,
                  entrance_pos, entrance_valid,
                  n_field_dests: int, dest_rid=None) -> Demand:
    """Concatenate `n_days` consecutive day tables and re-sort globally
    so invalid trips land at the very end (the spawn cursor walks a
    valid-sorted prefix)."""
    keys = jax.random.split(key, n_days)
    days = [generate_day(cfg, layout, keys[i], start_day + i, current_tick,
                         blk_valid, blk_btype, blk_dest, blk_entrance,
                         dest_valid, dest_kind, entrance_pos,
                         entrance_valid, n_field_dests, dest_rid)
            for i in range(n_days)]
    cat = lambda f: jnp.concatenate([f(d) for d in days])
    depart = cat(lambda d: d.depart_tick)
    valid = cat(lambda d: d.valid)
    order = jnp.argsort(jnp.where(valid, depart, jnp.int32(2**30)))
    return Demand(
        depart_tick=depart[order],
        origin=cat(lambda d: d.origin)[order],
        dest=cat(lambda d: d.dest)[order],
        kind=cat(lambda d: d.kind)[order],
        valid=valid[order],
        cursor=jnp.int32(0),
        day=jnp.asarray(start_day + n_days - 1, jnp.int32),
    )
