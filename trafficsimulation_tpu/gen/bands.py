"""Road-band sampling as a jittable scan.

Re-expresses the reference band generator
(`city_model.py:1076-1266`: `_make_road_bands_for_interior`,
`_choose_road_type`, `_force_one_highway`, `_ensure_minimum_highways`)
as fixed-capacity array programs under `jax.lax.scan` / `fori_loop`.

A band is (start, end, road_class, dir_idx) on one axis.  Horizontal bands
are indexed by y (dir ∈ {E, W}), vertical by x (dir ∈ {N, S}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..codes import RC_R1, RC_R2, RC_R3, N_IDX, E_IDX, S_IDX, W_IDX
from ..config import Config


@struct.dataclass
class Bands:
    start: jnp.ndarray   # i32 [MB]
    end: jnp.ndarray     # i32 [MB]
    rclass: jnp.ndarray  # i32 [MB] RC_R1/RC_R2/RC_R3
    dir: jnp.ndarray     # i32 [MB] direction index (R1: unused, -1)
    valid: jnp.ndarray   # bool [MB]


def _thickness_table(cfg: Config) -> jnp.ndarray:
    # index by road class: [_, R1, R2, R3]
    return jnp.array([0, cfg.ROAD_THICKNESS_R1, cfg.ROAD_THICKNESS_R2,
                      cfg.ROAD_THICKNESS_R3], dtype=jnp.int32)


def _choose_road_type(key, cfg: Config):
    """Reference `_choose_road_type` (`city_model.py:1179-1204`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p_r1 = jnp.clip(cfg.R1_CHANCE_MEAN
                    + cfg.R1_CHANCE_STD * jax.random.normal(k1), 0.0, 1.0)
    p_r2 = jnp.clip(jnp.minimum(
        1.0 - p_r1,
        cfg.R2_CHANCE_MEAN + cfg.R2_CHANCE_STD * jax.random.normal(k2)),
        0.0, 1.0)
    r = jax.random.uniform(k3)
    return jnp.where(r < p_r1, RC_R1, jnp.where(r < p_r1 + p_r2, RC_R2, RC_R3))


def sample_axis_bands(key, cfg: Config, start_coord: int, end_coord: int,
                      horizontal: bool, max_bands: int) -> Bands:
    """Random bands between start_coord and end_coord, with forced ring
    first/last bands of cfg.RING_ROAD_TYPE
    (`city_model.py:1096-1177`)."""
    thick_tab = _thickness_table(cfg)
    dir_pair = (E_IDX, W_IDX) if horizontal else (N_IDX, S_IDX)

    def body(carry, key):
        current, last_r3_dir, done = carry
        kt, kd, ks = jax.random.split(key, 3)
        rclass = _choose_road_type(kt, cfg)
        thick = thick_tab[rclass]
        bstart = current
        bend = jnp.minimum(bstart + thick - 1, end_coord)
        rand_dir = jnp.where(jax.random.bernoulli(kd),
                             dir_pair[0], dir_pair[1])
        bdir = jnp.where((rclass == RC_R3) & (last_r3_dir >= 0),
                         (last_r3_dir + 2) % 4, rand_dir)
        emit_valid = ~done
        new_last_r3 = jnp.where(rclass == RC_R3, bdir, -1)

        next_pos = bend + 1
        block_size = jax.random.randint(
            ks, (), cfg.MIN_BLOCK_SPACING, cfg.MAX_BLOCK_SPACING + 1)
        block_end = next_pos + block_size - 1
        new_done = done | (next_pos > end_coord) | (block_end > end_coord)
        new_current = block_end + 1
        carry = (jnp.where(done, current, new_current),
                 jnp.where(done, last_r3_dir, new_last_r3),
                 new_done)
        return carry, (bstart, bend, rclass, bdir, emit_valid)

    keys = jax.random.split(key, max_bands + 1)
    init = (jnp.int32(start_coord), jnp.int32(-1), jnp.bool_(False))
    _, (bs, be, rc, bd, bv) = jax.lax.scan(body, init, keys[:max_bands])

    # ---- force first & last ring bands (`city_model.py:1131-1176`) ------
    ring_rc = {"R1": RC_R1, "R2": RC_R2, "R3": RC_R3}[cfg.RING_ROAD_TYPE]
    forced_thick = cfg.road_thickness(cfg.RING_ROAD_TYPE)
    kf, kl = jax.random.split(keys[max_bands])
    if cfg.RING_ROAD_TYPE == "R3":
        # fixed directions: bottom E / top W (horizontal), left S / right N
        first_dir = jnp.int32(E_IDX if horizontal else S_IDX)
        last_dir = jnp.int32(W_IDX if horizontal else N_IDX)
    else:
        first_dir = jnp.where(jax.random.bernoulli(kf),
                              dir_pair[0], dir_pair[1]).astype(jnp.int32)
        last_dir = jnp.where(jax.random.bernoulli(kl),
                             dir_pair[0], dir_pair[1]).astype(jnp.int32)

    n_valid = jnp.sum(bv).astype(jnp.int32)
    slots = jnp.arange(max_bands, dtype=jnp.int32)
    # replace slot 0 with the forced first band
    is_first = slots == 0
    last_idx = jnp.maximum(n_valid - 1, 1)  # if 0/1 bands, last goes to slot 1
    is_last = slots == last_idx
    bs = jnp.where(is_first, start_coord,
                   jnp.where(is_last, end_coord - forced_thick + 1, bs))
    be = jnp.where(is_first, start_coord + forced_thick - 1,
                   jnp.where(is_last, end_coord, be))
    rc = jnp.where(is_first | is_last, ring_rc, rc)
    bd = jnp.where(is_first, first_dir, jnp.where(is_last, last_dir, bd))
    bv = bv | is_first | is_last
    # drop any leftover band that now overlaps the forced last band
    overlaps_last = (be >= end_coord - forced_thick + 1) & ~is_last
    bv = bv & ~(overlaps_last & ~is_first)
    return Bands(start=bs, end=be, rclass=rc, dir=bd, valid=bv)


def ensure_minimum_highways(key, cfg: Config, bands: Bands, total_size: int,
                            inset: int) -> Bands:
    """Insert R1 bands until the non-ring R1 quota is met
    (`city_model.py:1206-1266`).  Bands overlapping the new highway's
    exclusion range [start-MIN_BLOCK_SPACING, end+MIN_BLOCK_SPACING] are
    removed, exactly as `_force_one_highway` does."""
    thick = cfg.ROAD_THICKNESS_R1
    start_min = inset
    start_max = total_size - thick - inset
    if start_min > start_max:
        start_min, start_max = 0, total_size - thick
    ring_is_r1 = cfg.RING_ROAD_TYPE == "R1"
    max_bands = bands.start.shape[0]

    def count_r1(b: Bands):
        c = b.valid & (b.rclass == RC_R1)
        if ring_is_r1:
            # exclude ring (first/last by start order) from the count
            starts = jnp.where(b.valid, b.start, 2**30)
            ends = jnp.where(b.valid, b.end, -1)
            c = c & (b.start != jnp.min(starts)) & (b.end != jnp.max(ends))
        return jnp.sum(c)

    def attempt(i, carry):
        b, key = carry
        key, kh = jax.random.split(key)
        need = count_r1(b) < cfg.MIN_R1_BANDS
        hw_start = jax.random.randint(kh, (), start_min, start_max + 1)
        hw_end = hw_start + thick - 1
        skip_lo = hw_start - cfg.MIN_BLOCK_SPACING
        skip_hi = hw_end + cfg.MIN_BLOCK_SPACING
        kill = b.valid & ~((b.end < skip_lo) | (b.start > skip_hi))
        new_valid = jnp.where(need, b.valid & ~kill, b.valid)
        # append the highway into the first free slot
        free = jnp.argmin(new_valid)  # first False (or 0 if full)
        can_place = need & ~new_valid[free]
        b = Bands(
            start=jnp.where(can_place, b.start.at[free].set(hw_start), b.start),
            end=jnp.where(can_place, b.end.at[free].set(hw_end), b.end),
            rclass=jnp.where(can_place, b.rclass.at[free].set(RC_R1), b.rclass),
            dir=jnp.where(can_place, b.dir.at[free].set(-1), b.dir),
            valid=jnp.where(need, new_valid.at[free].set(
                new_valid[free] | can_place), b.valid),
        )
        return b, key

    bands, _ = jax.lax.fori_loop(0, 20, attempt, (bands, key))
    del max_bands
    return bands


def per_coord_tables(bands: Bands, size: int):
    """Rasterize a band list to per-coordinate lookup tables.

    Returns dict of arrays [size]: cover (bool), rclass, offset, bsize,
    dir, is_first (ring first band), is_last.  Bands never overlap after
    `ensure_minimum_highways` (overlapping ones are removed), so at most
    one band covers each coordinate (`_find_band_covering`
    `city_model.py:1268-1273`)."""
    coords = jnp.arange(size, dtype=jnp.int32)[:, None]       # [size, 1]
    st, en = bands.start[None, :], bands.end[None, :]          # [1, MB]
    covered = (coords >= st) & (coords <= en) & bands.valid[None, :]
    any_cover = jnp.any(covered, axis=1)
    band_idx = jnp.argmax(covered, axis=1)
    starts_v = jnp.where(bands.valid, bands.start, 2**30)
    ends_v = jnp.where(bands.valid, bands.end, -(2**30))
    first_band = jnp.argmin(starts_v)
    last_band = jnp.argmax(ends_v)
    return dict(
        cover=any_cover,
        rclass=jnp.where(any_cover, bands.rclass[band_idx], 0),
        offset=jnp.where(any_cover, coords[:, 0] - bands.start[band_idx], 0),
        bsize=jnp.where(any_cover,
                        bands.end[band_idx] - bands.start[band_idx] + 1, 0),
        dir=jnp.where(any_cover, bands.dir[band_idx], -1),
        is_first=any_cover & (band_idx == first_band),
        is_last=any_cover & (band_idx == last_band),
        first_start=bands.start[first_band],
        last_start=bands.start[last_band],
    )
