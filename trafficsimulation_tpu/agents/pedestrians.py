"""Pedestrians as per-cell count PLANES (crowd field, not a pool CA).

BASELINE config #3 extension: the reference has NO pedestrians
(`readme.md:118-124` lists them as future work), so this subsystem is a
new TPU-first design built on the sidewalk/crosswalk substrate.

Representation (round-4 redesign): the crowd is eight `[H, W]` i32
count planes — `walk[4]` and `cross[4]`, indexed by heading — instead
of a 25k-slot agent pool.  The pool form cost ~12 scalar-priced gathers
over the padded pool per tick plus a `nonzero(size=16)` pool scan
(VERDICT r3 weak #4: config #3 ran 8x slower than the vehicle CA); the
plane form is a handful of whole-plane vector ops and shifted adds,
same shape as the vehicle engine.

Semantics (unchanged from the pool design, now expressed on counts):

* pedestrians live on Sidewalk / BlockEntrance / TrafficLight cells;
  many share a cell (no exclusion — a crowd field, not a CA);
* walking: persistent-heading random walk — with p=PED_KEEP_HEADING a
  pedestrian continues straight onto a walkable cell, otherwise it
  re-picks uniformly among walkable neighbors (stays put, keeping its
  heading, when there is none);
* crossing: a pedestrian whose heading points into a ControlledRoad
  cell whose light currently holds vehicles (stop_map set — the
  vehicle red phase IS the walk phase) steps onto the roadway with the
  same keep-heading probability and walks straight until it reaches a
  sidewalk again;
* vehicle interaction: cells holding crossing pedestrians are hard
  obstacles for vehicle routing and movement (`ped_block` plane);
* lifetime: each walking pedestrian despawns with probability
  1/PED_MEAN_LIFE_TICKS per tick (geometric lifetime with the same
  mean as the pool design's uniform 100..1000-tick draw); pedestrians
  mid-crossing never despawn (the pool design could despawn a BLOCKED
  crosser on the roadway — an artifact, not a feature);
* spawning: per-sidewalk-cell Bernoulli(p) with
  p = PEDESTRIANS_PER_DAY / ticks_per_day / n_sidewalk_cells, i.e. the
  aggregate spawn count is Binomial(n_side, lam/n_side) ~= Poisson(lam)
  with NO per-tick cap (the pool design silently truncated at 16/tick
  while lam ~= 13.9 at 200k/day — VERDICT r3 weak #4).

Fractional count splits use stochastic rounding floor(n*p + u) with
per-(cell, heading) hashed uniforms (`engine._hash32` counters): the
expectation is exact, and for a crowd field the per-agent identity the
binomial would preserve does not exist in the first place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .. import codes as C
from ..config import Config

PED_KEEP_HEADING = 0.8
PED_MEAN_LIFE_TICKS = 550        # mean of the pool design's randint(100, 1000)

# heading -> (dy, dx); same order as the pool design's offs = [W, 1, -W, -1]
_DELTAS = ((1, 0), (0, 1), (-1, 0), (0, -1))


@struct.dataclass
class Pedestrians:
    walk: jnp.ndarray    # i32 [4, H, W] walking counts by heading
    cross: jnp.ndarray   # i32 [4, H, W] mid-crossing counts by heading


def init_pedestrians(H: int, W: int, enabled: bool = True) -> Pedestrians:
    """Count planes; a 1x1 stub when pedestrians are disabled so the
    scan carry does not haul 8 dead [H, W] planes through every tick."""
    if not enabled:
        H = W = 1
    z = jnp.zeros((4, H, W), jnp.int32)
    return Pedestrians(walk=z, cross=z)


def total_pedestrians(peds: Pedestrians) -> jnp.ndarray:
    return jnp.sum(peds.walk) + jnp.sum(peds.cross)


def _shift_pad(a, dy, dx):
    """Move plane content one cell by (dy, dx), zero-filled edges:
    out[c + (dy, dx)] = a[c]."""
    H, W = a.shape[-2:]
    if dy == 1:
        a = jnp.pad(a[..., :-1, :], [(0, 0)] * (a.ndim - 2) + [(1, 0), (0, 0)])
    elif dy == -1:
        a = jnp.pad(a[..., 1:, :], [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)])
    if dx == 1:
        a = jnp.pad(a[..., :, :-1], [(0, 0)] * (a.ndim - 2) + [(0, 0), (1, 0)])
    elif dx == -1:
        a = jnp.pad(a[..., :, 1:], [(0, 0)] * (a.ndim - 2) + [(0, 0), (0, 1)])
    return a


def _ahead(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """Value of plane a at cell + delta_d (zero/False beyond the edge)."""
    dy, dx = _DELTAS[d]
    return _shift_pad(a, -dy, -dx)


def _hash32(x: jnp.ndarray) -> jnp.ndarray:
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _uniform_planes(key, n: int, H: int, W: int):
    """n cheap (0,1) uniform planes from one threefry draw + counter
    hashing (same scheme/resolution as `engine.tick_randoms`)."""
    seeds = jax.random.bits(key, (n,), jnp.uint32)
    iota = (jax.lax.broadcasted_iota(jnp.uint32, (H, W), 0) * jnp.uint32(W)
            + jax.lax.broadcasted_iota(jnp.uint32, (H, W), 1))
    unit = jnp.float32(1.0 / (1 << 24))
    return [(_hash32(iota + seeds[i]) >> 8).astype(jnp.float32) * unit
            for i in range(n)]


def _sround(n_i32: jnp.ndarray, p_f32, u_f32) -> jnp.ndarray:
    """Stochastically-rounded n*p: floor(n*p + u), clamped to [0, n]."""
    k = jnp.floor(n_i32.astype(jnp.float32) * p_f32 + u_f32).astype(jnp.int32)
    return jnp.clip(k, 0, n_i32)


def step_pedestrians(cfg: Config, H: int, W: int, peds: Pedestrians,
                     cell_type, stop_map, key):
    """One tick on the count planes.

    Returns (peds', ped_block [H, W] bool, ped_count [H, W] i32).
    `cell_type` u8 [H, W]; `stop_map` bool [H, W].
    """
    walkable = ((cell_type == C.SIDEWALK)
                | (cell_type == C.BLOCK_ENTRANCE)
                | (cell_type == C.TRAFFIC_LIGHT))
    roady = ((cell_type == C.CONTROLLED_ROAD) | (cell_type == C.R1)
             | (cell_type == C.R2) | (cell_type == C.R3)
             | (cell_type == C.INTERSECTION))
    cross_entry = (cell_type == C.CONTROLLED_ROAD) & stop_map

    ks = jax.random.split(key, 3)
    u_keep = _uniform_planes(ks[0], 4, H, W)      # keep/cross split per heading
    u_take = _uniform_planes(ks[1], 8, H, W)      # 4 redistribution + 4 despawn
    u_spawn = _uniform_planes(ks[2], 2, H, W)     # spawn roll + heading pick

    aw = [_ahead(walkable, d) for d in range(4)]          # bool [H, W] x4
    ar = [_ahead(roady, d) for d in range(4)]
    ac = [_ahead(cross_entry, d) for d in range(4)]

    new_walk = [jnp.zeros((H, W), jnp.int32) for _ in range(4)]
    new_cross = [jnp.zeros((H, W), jnp.int32) for _ in range(4)]

    # ---- walking: keep-heading / start-crossing / redistribute ----------
    n_alt = sum(a.astype(jnp.int32) for a in aw)          # walkable nbr count
    pool = jnp.zeros((H, W), jnp.int32)                   # redistribution pool
    p_keep = jnp.float32(PED_KEEP_HEADING)
    for d in range(4):
        n = peds.walk[d]
        # straight ahead onto walkable, or step off the curb onto a held
        # controlled road — mutually exclusive targets, one keep roll
        p = jnp.where(aw[d], p_keep, jnp.where(ac[d], p_keep, 0.0))
        k = _sround(n, p, u_keep[d])
        k_walk = jnp.where(aw[d], k, 0)
        k_cross = k - k_walk
        rest = n - k
        new_walk[d] = new_walk[d] + _shift_pad(k_walk, *_DELTAS[d])
        new_cross[d] = new_cross[d] + _shift_pad(k_cross, *_DELTAS[d])
        # no walkable neighbor at all: stay put, keep heading
        pool = pool + jnp.where(n_alt > 0, rest, 0)
        new_walk[d] = new_walk[d] + jnp.where(n_alt > 0, 0, rest)
    # uniform allocation of the pooled re-pickers over walkable neighbor
    # directions (sequential stochastic split: remaining/remaining-dirs)
    rem_dirs = n_alt
    m = pool
    for d in range(4):
        cnt = jnp.maximum(rem_dirs, 1).astype(jnp.float32)
        take = jnp.where(aw[d] & (rem_dirs > 0),
                         _sround(m, 1.0 / cnt, u_take[d]), 0)
        take = jnp.where(rem_dirs == 1, m, take) * aw[d]  # last dir takes all
        new_walk[d] = new_walk[d] + _shift_pad(take, *_DELTAS[d])
        m = m - take
        rem_dirs = rem_dirs - aw[d].astype(jnp.int32)

    # ---- crossing: straight ahead over the roadway until a sidewalk -----
    for d in range(4):
        c = peds.cross[d]
        can = aw[d] | ar[d]
        moved = jnp.where(can, c, 0)
        landed = _shift_pad(moved, *_DELTAS[d])
        on_road = jnp.where(roady, landed, 0)
        new_cross[d] = new_cross[d] + on_road + (c - moved)
        new_walk[d] = new_walk[d] + (landed - on_road)

    # ---- lifetime thinning (walkers only; crossers finish their cross) --
    p_die = jnp.float32(1.0 / PED_MEAN_LIFE_TICKS)
    for d in range(4):
        new_walk[d] = new_walk[d] - _sround(new_walk[d], p_die, u_take[4 + d])

    # ---- spawns: Bernoulli per sidewalk cell, aggregate ~ Poisson(lam) --
    if cfg.PEDESTRIANS_ENABLED:
        ticks_per_day = 86400 // cfg.TIME_PER_STEP_IN_SECONDS
        lam = cfg.PEDESTRIANS_PER_DAY / ticks_per_day
        side = cell_type == C.SIDEWALK
        n_side = jnp.maximum(jnp.sum(side.astype(jnp.int32)), 1)
        p_cell = jnp.float32(lam) / n_side.astype(jnp.float32)
        born = side & (u_spawn[0] < p_cell)
        h = (u_spawn[1] * 4.0).astype(jnp.int32)
        for d in range(4):
            new_walk[d] = new_walk[d] + (born & (h == d)).astype(jnp.int32)

    walk = jnp.stack(new_walk)
    cross = jnp.stack(new_cross)
    ped_count = jnp.sum(walk, axis=0) + jnp.sum(cross, axis=0)
    ped_block = jnp.sum(cross, axis=0) > 0
    return Pedestrians(walk=walk, cross=cross), ped_block, ped_count
