"""Pedestrian agents on sidewalk rings with crosswalk/vehicle interaction.

BASELINE config #3 extension: the reference has NO pedestrians
(`readme.md:118-124` lists them as future work), so this subsystem is a
new TPU-first design built on the sidewalk/crosswalk substrate:

* pedestrians live on Sidewalk (and BlockEntrance) cells; many may share
  a cell (no exclusion — they are a crowd field, not a CA);
* walking: persistent-heading random walk over the sidewalk graph
  (straight with p=PED_KEEP_HEADING, else a uniform sidewalk neighbor);
* crossing: a pedestrian whose heading points into a ControlledRoad cell
  whose light currently holds vehicles (stop_map set — i.e. the vehicle
  red phase = the walk phase) steps onto the roadway and walks straight
  until it reaches a sidewalk again;
* vehicle interaction: cells holding crossing pedestrians are hard
  obstacles for vehicle routing and movement (`ped_block` plane).

All pure array ops: one gather per neighbor direction, no scatter
conflicts (pedestrian counts accumulate with scatter-add for render).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .. import codes as C
from ..config import Config

PED_KEEP_HEADING = 0.8


@struct.dataclass
class Pedestrians:
    active: jnp.ndarray    # bool [P]
    pos: jnp.ndarray       # i32 [P] flat cell
    heading: jnp.ndarray   # i32 [P]
    crossing: jnp.ndarray  # bool [P]
    life: jnp.ndarray      # i32 [P] remaining ticks before despawn


def init_pedestrians(n: int) -> Pedestrians:
    return Pedestrians(
        active=jnp.zeros((n,), bool),
        pos=jnp.full((n,), -1, jnp.int32),
        heading=jnp.zeros((n,), jnp.int32),
        crossing=jnp.zeros((n,), bool),
        life=jnp.zeros((n,), jnp.int32))


def ped_capacity(cfg: Config) -> int:
    return cfg.PEDESTRIAN_MAX or max(256, cfg.PEDESTRIANS_PER_DAY // 8)


def step_pedestrians(cfg: Config, H: int, W: int, peds: Pedestrians,
                     cell_type_flat, stop_flat, sidewalk_spawn_cells,
                     key):
    """One tick. Returns (peds', ped_block [H*W] bool, ped_count [H*W] i32)."""
    P = peds.pos.shape[0]
    HW = H * W
    k_keep, k_dir, k_spawn, k_slot, k_life = jax.random.split(key, 5)
    offs = jnp.array([W, 1, -W, -1], jnp.int32)

    pos = jnp.clip(peds.pos, 0, HW - 1)
    walkable = jnp.isin(cell_type_flat, jnp.array(
        [C.SIDEWALK, C.BLOCK_ENTRANCE, C.TRAFFIC_LIGHT], dtype=jnp.uint8))
    roady = jnp.isin(cell_type_flat, jnp.array(
        [C.CONTROLLED_ROAD, C.R1, C.R2, C.R3, C.INTERSECTION],
        dtype=jnp.uint8))

    y = pos // W
    x = pos % W
    nb = jnp.stack([pos + offs[d] for d in range(4)], axis=1)   # [P, 4]
    inb = jnp.stack([
        (y < H - 1), (x < W - 1), (y > 0), (x > 0)], axis=1)
    nb = jnp.clip(nb, 0, HW - 1)
    nb_walk = walkable[nb] & inb
    nb_roady = roady[nb] & inb
    nb_stop = stop_flat[nb] & inb

    # --- crossing pedestrians continue straight until sidewalk ----------
    hsel = jnp.clip(peds.heading, 0, 3)
    ahead = nb[jnp.arange(P), hsel]
    ahead_walk = nb_walk[jnp.arange(P), hsel]
    ahead_roady = nb_roady[jnp.arange(P), hsel]
    cross_next = peds.crossing & peds.active & (ahead_walk | ahead_roady)
    # --- walking pedestrians -------------------------------------------
    keep = jax.random.uniform(k_keep, (P,)) < PED_KEEP_HEADING
    can_keep = ahead_walk
    # random alternative among walkable neighbors
    rnd = jax.random.uniform(k_dir, (P, 4))
    rnd = jnp.where(nb_walk, rnd, -1.0)
    alt = jnp.argmax(rnd, axis=1).astype(jnp.int32)
    has_alt = jnp.any(nb_walk, axis=1)
    walk_dir = jnp.where(keep & can_keep, hsel,
                         jnp.where(has_alt, alt, hsel))
    # start crossing: heading points into a held (red-for-vehicles)
    # controlled road -> the walk signal
    want_cross = peds.active & ~peds.crossing & \
        (cell_type_flat[ahead] == C.CONTROLLED_ROAD) & \
        stop_flat[ahead] & keep
    del nb_stop

    new_dir = jnp.where(peds.crossing | want_cross, hsel, walk_dir)
    tgt = nb[jnp.arange(P), jnp.clip(new_dir, 0, 3)]
    tgt_ok = jnp.where(
        peds.crossing, cross_next,
        jnp.where(want_cross, True,
                  nb_walk[jnp.arange(P), jnp.clip(new_dir, 0, 3)]))
    move = peds.active & tgt_ok
    new_pos = jnp.where(move, tgt, pos)
    now_crossing = (peds.crossing | want_cross) & move & \
        roady[new_pos]
    life = jnp.maximum(peds.life - 1, 0)
    despawn = peds.active & (life == 0) & ~now_crossing
    active = peds.active & ~despawn

    peds = Pedestrians(
        active=active,
        pos=jnp.where(active, new_pos, -1),
        heading=jnp.where(move, new_dir, peds.heading),
        crossing=now_crossing & active,
        life=life)

    # --- spawns ----------------------------------------------------------
    if cfg.PEDESTRIANS_ENABLED:
        ticks_per_day = 86400 // cfg.TIME_PER_STEP_IN_SECONDS
        lam = cfg.PEDESTRIANS_PER_DAY / ticks_per_day
        n_spawn = jnp.minimum(
            jax.random.poisson(k_spawn, lam), 16).astype(jnp.int32)
        S = 16
        slots = jnp.nonzero(~peds.active, size=S, fill_value=-1)[0]
        cells, ok = _pick_cells(k_slot, sidewalk_spawn_cells, S)
        place = (jnp.arange(S) < n_spawn) & (slots >= 0) & ok
        sl = jnp.where(place, slots, P)
        life0 = jax.random.randint(k_life, (S,), 100, 1000)
        peds = peds.replace(
            active=peds.active.at[sl].set(True, mode="drop"),
            pos=peds.pos.at[sl].set(cells, mode="drop"),
            heading=peds.heading.at[sl].set(
                jax.random.randint(k_slot, (S,), 0, 4), mode="drop"),
            crossing=peds.crossing.at[sl].set(False, mode="drop"),
            life=peds.life.at[sl].set(life0, mode="drop"))

    # --- planes ----------------------------------------------------------
    ppos = jnp.where(peds.active, jnp.clip(peds.pos, 0, HW - 1), HW)
    ped_count = jnp.zeros((HW + 1,), jnp.int32).at[ppos].add(
        peds.active.astype(jnp.int32))[:HW]
    ped_block = jnp.zeros((HW + 1,), bool).at[ppos].max(
        peds.active & peds.crossing)[:HW]
    return peds, ped_block, ped_count


def _pick_cells(key, spawn_cells, n):
    """Uniform pick of n cells from a padded (-1) candidate list."""
    valid = spawn_cells >= 0
    cnt = jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.randint(key, (n,), 0, cnt)
    return spawn_cells[jnp.clip(idx, 0, spawn_cells.shape[0] - 1)], \
        jnp.any(valid)
