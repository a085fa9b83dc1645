"""Literal-transcription oracles for the two generation partials that
were argued-but-not-tested equivalent (VERDICT r4 next #6):

* #16 neighbor/intermediate group discovery: the reference walks rays
  from EVERY diagonal-adjacent intersection of every traffic light of a
  group and takes blocking hits per `blocks_all_lanes`
  (`intersection_light_group.py:175-241`); this framework walks ONE ray
  per direction from the group's bbox center (`gen/lights.py` stage 8).
  The oracle transcribes the reference algorithm (including its
  per-(group, direction) blocks-cache quirk, evaluated in ascending
  group order) on generated cities and compares the resulting
  neighbor/intermediate relations.

The comparison asserts on the structure that the control algorithms
actually consume (fsm neighbor pressure / green wave): the BLOCKING
neighbor in each direction.  Divergences that stem from the different
ray origins are enumerated and bounded, not hidden.
"""

import functools

import numpy as np
import jax
import pytest

# needs the jitted generation pipeline + 5 seeds: slow tier
pytestmark = pytest.mark.slow

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.gen.bands import (sample_axis_bands,
                                             ensure_minimum_highways)
from trafficsimulation_tpu.gen.generate import generate_city


def _bands_np(cfg, key):
    """Replicate generate_city's band sampling (same key splits)."""
    kh, kv, khm, kvm, _kz, _ke = jax.random.split(key, 6)
    hb = sample_axis_bands(kh, cfg, cfg.interior_y_min,
                           cfg.interior_y_max, True,
                           cfg.capacities().max_bands)
    vb = sample_axis_bands(kv, cfg, cfg.interior_x_min,
                           cfg.interior_x_max, False,
                           cfg.capacities().max_bands)
    inset = cfg.interior_x_min + cfg.HIGHWAY_OFFSET
    hb = ensure_minimum_highways(khm, cfg, hb, cfg.HEIGHT, inset)
    vb = ensure_minimum_highways(kvm, cfg, vb, cfg.WIDTH, inset)
    out = []
    for b in (hb, vb):
        iv = [(int(s), int(e)) for s, e, v in
              zip(np.asarray(b.start), np.asarray(b.end),
                  np.asarray(b.valid)) if v]
        out.append(iv)
    return out  # [h_intervals, v_intervals]


def _band_or_single(i, ivals):
    for a, b in ivals:
        if a <= i <= b:
            return a, b
    return i, i


def _oracle_links(cfg, cell, gplane, lpos, lgroup, lvalid, hiv, viv):
    """Reference `populate_links` transcribed: returns (neighbor [G,4],
    intermediates [G] set list).  Rays use this framework's direction
    vectors (C.DIR_DY/DX) so the d-index matches groups_static.neighbor.
    The `_blocks_{d}` cache is evaluated lazily in ascending group order
    (the reference caches on first evaluation in Mesa agent order)."""
    H, W = cell.shape
    inter = cell == C.INTERSECTION
    G = int(gplane.max()) + 1 if (gplane >= 0).any() else 0

    def blocks_all_lanes(ix, iy, d):
        # transcription of intersection_light_group.py:185-202
        if d in (C.N_IDX, C.S_IDX):
            vx0, vx1 = _band_or_single(ix, viv)
            if vx1 == vx0:
                good_v = inter[iy, vx0]
                hy0, hy1 = _band_or_single(iy, hiv)
                return bool(good_v and (hy1 != hy0 or inter[hy0, ix]))
            return bool(all(inter[iy, xx] for xx in range(vx0, vx1 + 1)))
        hy0, hy1 = _band_or_single(iy, hiv)
        if hy1 == hy0:
            good_h = inter[hy0, ix]
            vx0, vx1 = _band_or_single(ix, viv)
            return bool(good_h and (vx1 != vx0 or inter[iy, vx0]))
        return bool(all(inter[yy, ix] for yy in range(hy0, hy1 + 1)))

    blocks_cache = {}
    neighbor = np.full((G, 4), -1, np.int64)
    inters = [set() for _ in range(G)]
    for g in range(G):
        lights = [(int(p) % W, int(p) // W)
                  for p, gg, v in zip(lpos, lgroup, lvalid)
                  if v and gg == g]
        diag = []
        for lx, ly in lights:
            for dx, dy in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
                nx, ny = lx + dx, ly + dy
                if 0 <= nx < W and 0 <= ny < H and inter[ny, nx]:
                    diag.append((nx, ny))
        for cx, cy in diag:
            for d in range(4):
                x, y, steps = cx, cy, 0
                while steps < 1000:
                    x += int(C.DIR_DX[d])
                    y += int(C.DIR_DY[d])
                    if not (0 <= x < W and 0 <= y < H):
                        break
                    tg = gplane[y, x]
                    if cell[y, x] != C.INTERSECTION or tg < 0 or tg == g:
                        steps += 1
                        continue
                    key = (int(tg), d)
                    if key not in blocks_cache:
                        blocks_cache[key] = blocks_all_lanes(x, y, d)
                    if blocks_cache[key]:
                        neighbor[g, d] = tg
                        break
                    inters[g].add(int(tg))
                    steps += 1
    return neighbor, inters


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_neighbor_links_vs_reference_oracle(small_cfg, gen_fn, seed):
    cfg = small_cfg
    key = jax.random.PRNGKey(seed)
    grid, ls, gs, _bs, _dests, _f = jax.block_until_ready(gen_fn(key))
    cell = np.asarray(grid.cell_type)
    gplane = np.asarray(grid.group_id)
    hiv, viv = _bands_np(cfg, key)
    neighbor_o, inters_o = _oracle_links(
        cfg, cell, gplane, np.asarray(ls.pos), np.asarray(ls.group),
        np.asarray(ls.valid), hiv, viv)

    gv = np.asarray(gs.valid)
    nb = np.asarray(gs.neighbor)
    im = np.asarray(gs.intermediates)
    G = min(len(gv), neighbor_o.shape[0])

    agree = total = 0
    diverge = []
    for g in range(G):
        if not gv[g]:
            continue
        for d in range(4):
            o, m = neighbor_o[g, d], nb[g, d]
            # only compare where either side found a neighbor
            if o < 0 and m < 0:
                continue
            total += 1
            if o == m:
                agree += 1
            else:
                diverge.append((g, d, int(o), int(m)))
    assert total > 0, "city generated no neighbor relations at all"
    # The bbox-center ray is a declared approximation of the
    # all-diagonal-corner rays (PARITY component #16).  On generated
    # lattice cities both almost always hit the same next blocking
    # crossing; divergences must stay a small bounded residual.
    frac = agree / total
    assert frac >= 0.9, (
        f"seed {seed}: neighbor links agree only {frac:.0%} "
        f"({agree}/{total}); divergences {diverge[:10]}")
    # intermediates: every oracle intermediate that is a valid group
    # should appear in our table OR be one of our blocking neighbors
    # (ray-origin differences can promote/demote borderline crossings)
    for g in range(G):
        if not gv[g]:
            continue
        mine = set(im[g][im[g] >= 0].tolist()) | set(
            nb[g][nb[g] >= 0].tolist())
        extra = inters_o[g] - mine
        assert len(extra) <= max(2, len(inters_o[g]) // 2), (
            f"seed {seed} group {g}: oracle intermediates {inters_o[g]} "
            f"mostly missing from ours {mine}")
