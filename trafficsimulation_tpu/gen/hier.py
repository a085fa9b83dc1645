"""Hierarchical routing build: id assignment, hub selection, windowed
static fields (see ops/hier.py for the runtime representation and the
reference-parity argument).

The id assignment runs host-side in numpy (one pass over ~10k
destinations at flagship scale — microseconds); the field builds are
jitted device code: the dense hub/direct rows reuse the exact dense-path
value iteration (`ops.routing.compute_cost_fields` +
`ops.engine.field_to_keys`), and the windowed per-destination fields run
the SAME value iteration + sdir encode per 3x3-tile window under a
`lax.scan` over tiles, so the windowed bytes are bit-identical to what a
dense row restricted to the window would produce with zero dynamic
penalties (tested: tests/test_hier.py)."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.hier import hier_params, RID_SPACE
from ..ops import routing
from ..ops import engine


def assign_hier_np(cfg: Config, pos, valid, kind):
    """Host-side routing-id assignment.  `pos/valid/kind`: numpy views
    of the compact DestStatic table.  Returns a dict of numpy arrays:

      rid[D]            routing id per dest (-1 for invalid dests)
      hub_dest[NR]      dest index of each region's hub (-1: empty region)
      direct_dest[ND]   dest indices given direct dense rows (exits +
                        tile overflow), in dense-row order
      tile_dest[NT, LMAX]   dest index per (tile, local id) (-1 pad)
    """
    hp = hier_params(cfg)
    TS, LMAX = hp.ts, hp.lmax
    H, W = cfg.HEIGHT, cfg.WIDTH
    pos = np.asarray(pos)
    valid = np.asarray(valid)
    kind = np.asarray(kind)
    D = pos.shape[0]
    y, x = pos // W, pos % W
    ty, tx = y // TS, x // TS
    tid = ty * hp.ntx + tx

    rid = np.full(D, -1, np.int32)
    assign_tile = np.full(D, -1, np.int64)
    counts = np.zeros(hp.nt, np.int64)
    tiled_sel = np.nonzero(valid & (kind != 1))[0]
    # pass 1: own tile while slots remain
    for i in tiled_sel:
        t = tid[i]
        if counts[t] < LMAX:
            assign_tile[i] = t
            counts[t] += 1
    # pass 2: spill to the adjacent tile with the most free slots (the
    # destination stays inside the assigned tile's 3x3 window, so the
    # windowed field still covers it exactly)
    overflow = []
    for i in tiled_sel:
        if assign_tile[i] >= 0:
            continue
        tyi, txi = ty[i], tx[i]
        best, bestfree = -1, 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = tyi + dy, txi + dx
                if 0 <= ny < hp.nty and 0 <= nx < hp.ntx:
                    t = ny * hp.ntx + nx
                    free = LMAX - counts[t]
                    if free > bestfree:
                        best, bestfree = t, free
        if best >= 0:
            assign_tile[i] = best
            counts[best] += 1
        else:
            overflow.append(i)  # all 9 tiles full -> direct dense row

    tile_dest = np.full((hp.nt, LMAX), -1, np.int64)
    fill = np.zeros(hp.nt, np.int64)
    for i in tiled_sel:
        t = assign_tile[i]
        if t < 0:
            continue
        l = fill[t]
        fill[t] += 1
        tile_dest[t, l] = i
        rid[i] = t * LMAX + l

    direct = list(np.nonzero(valid & (kind == 1))[0]) + overflow
    # 16383 (DEST_NONE) is reserved as the no-destination sentinel
    assert hp.direct_base + len(direct) < RID_SPACE - 1, \
        f"direct rows {len(direct)} overflow the rid space"
    for j, i in enumerate(direct):
        rid[i] = hp.direct_base + j

    # hubs: per 2x2-tile region, the block-entrance destination assigned
    # to a tile of the region nearest the region center (entrances are
    # ordinary road-adjacent cells — always-valid dense targets).  Fall
    # back to any assigned dest; empty regions keep -1 (their hub row is
    # never addressed: a destination's own region contains it).
    hub_dest = np.full(hp.nr, -1, np.int64)
    reg_of_tile = (np.arange(hp.nt) // hp.ntx // 2) * hp.nrx \
        + (np.arange(hp.nt) % hp.ntx) // 2
    for r in range(hp.nr):
        tiles = np.nonzero(reg_of_tile == r)[0]
        members = tile_dest[tiles].reshape(-1)
        members = members[members >= 0]
        if members.size == 0:
            continue
        ry, rx = r // hp.nrx, r % hp.nrx
        cy, cx = (2 * ry + 1) * TS, (2 * rx + 1) * TS  # region center
        ents = members[kind[members] == 0]
        cand = ents if ents.size else members
        d2 = (y[cand] - cy) ** 2 + (x[cand] - cx) ** 2
        hub_dest[r] = cand[np.argmin(d2)]

    return {"rid": rid, "hub_dest": hub_dest,
            "direct_dest": np.asarray(direct, np.int64),
            "tile_dest": tile_dest}


def build_dense_keys(cfg: Config, grid, dense_pos: jnp.ndarray,
                     dense_valid: jnp.ndarray,
                     rows_per_chunk: int = 16) -> jnp.ndarray:
    """Dense dynamic rows (hubs first, then direct dests): the same
    pre-encoded key stack as the dense path (`engine.field_to_keys`).

    Chunked over rows: the value-iteration while_loop holds ~4 live
    copies of its [D, 4, H, W] f32 carry, which at 1024^2 with the
    ~270 hier dense rows is ~17 GB — past HBM.  16-row chunks keep the
    transient under ~1.1 GB while total work is unchanged (iterations
    are per-chunk convergence-bounded)."""
    D = dense_pos.shape[0]
    nb = max(1, -(-D // rows_per_chunk))
    pad = nb * rows_per_chunk - D
    dpos = jnp.concatenate([dense_pos, jnp.zeros((pad,), jnp.int32)])
    dval = jnp.concatenate([dense_valid, jnp.zeros((pad,), bool)])

    def one(args):
        pos, val = args
        F = routing.compute_cost_fields(cfg, grid.allowed_dirs,
                                        grid.road_class, pos, val,
                                        is_road=grid.is_road)
        return engine.field_to_keys(cfg, F, grid.road_class)

    K = jax.lax.map(one, (dpos.reshape(nb, rows_per_chunk),
                          dval.reshape(nb, rows_per_chunk)))
    return K.reshape(nb * rows_per_chunk, 4, *grid.allowed_dirs.shape)[:D]


def build_local_stack(cfg: Config, grid, tile_dest_wpos: jnp.ndarray,
                      tile_dest_valid: jnp.ndarray,
                      tile_coords: jnp.ndarray) -> jnp.ndarray:
    """Windowed static next-move planes, packed 4/word.

    `tile_dest_wpos` i32 [NT, LMAX]: each destination's flat position in
    its tile's 3x3 window (3TS x 3TS, PADDED frame: window origin of
    tile (ty,tx) is (ty*TS, tx*TS) in planes padded by TS on every
    side).  `tile_coords` i32 [NT, 2] = (ty, tx).  Returns i32
    [ceil(9*LMAX/4), H, W]: plane (dy+1)*3+(dx+1))*LMAX + l at cell c
    holds the sdir byte toward destination (tile(c) + (dy,dx), l)."""
    hp = hier_params(cfg)
    TS, LMAX = hp.ts, hp.lmax
    H, W = cfg.HEIGHT, cfg.WIDTH
    WS = 3 * TS

    def pad(p, fill):
        return jnp.pad(p, TS, constant_values=fill)

    allowed_p = pad(grid.allowed_dirs, 0)
    road_p = pad(grid.is_road, False)
    rclass_p = pad(grid.road_class, 0)

    zsoft = jnp.zeros((WS, WS), jnp.int32)
    zhard = jnp.zeros((WS, WS), bool)

    def one_tile(carry, xs):
        stack = carry
        (ty, tx), wpos, dvalid = xs
        oy, ox = ty * TS, tx * TS
        al = jax.lax.dynamic_slice(allowed_p, (oy, ox), (WS, WS))
        rd = jax.lax.dynamic_slice(road_p, (oy, ox), (WS, WS))
        rc = jax.lax.dynamic_slice(rclass_p, (oy, ox), (WS, WS))
        F = routing.compute_cost_fields(cfg, al, rc, wpos, dvalid,
                                        is_road=rd)
        K0 = engine.field_to_keys(cfg, F, rc)
        sd = engine.build_sdir(cfg, K0, al, rd, zsoft, zhard,
                               force_xla=True, pack=False)  # [LMAX,WS,WS]
        for wy in range(3):
            for wx in range(3):
                base = ((2 - wy) * 3 + (2 - wx)) * LMAX
                patch = jax.lax.slice(
                    sd, (0, wy * TS, wx * TS),
                    (LMAX, (wy + 1) * TS, (wx + 1) * TS))
                stack = jax.lax.dynamic_update_slice(
                    stack, patch, (base, oy + wy * TS, ox + wx * TS))
        return stack, None

    stack0 = jnp.full((9 * LMAX, H + 2 * TS, W + 2 * TS), 7, jnp.uint8)
    stack, _ = jax.lax.scan(
        one_tile, stack0,
        (tile_coords, tile_dest_wpos, tile_dest_valid))
    stack = jax.lax.slice(stack, (0, TS, TS), (9 * LMAX, TS + H, TS + W))
    return engine.pack_sdir4(stack)


def hier_tables_np(cfg: Config, assign: dict, pos, H, W):
    """Device-ready tables from the host assignment: window-relative
    dest positions and dense row cells."""
    hp = hier_params(cfg)
    TS, LMAX, WS = hp.ts, hp.lmax, 3 * hp.ts
    pos = np.asarray(pos)
    y, x = pos // W, pos % W
    td = assign["tile_dest"]
    tv = td >= 0
    tds = np.where(tv, td, 0)
    tyx = np.stack([np.arange(hp.nt) // hp.ntx,
                    np.arange(hp.nt) % hp.ntx], axis=1)
    # padded-frame window origin of tile t is (ty*TS, tx*TS); dest (y,x)
    # maps to ((y+TS) - ty*TS, (x+TS) - tx*TS) inside the window
    wy = y[tds] + TS - tyx[:, 0:1] * TS
    wx = x[tds] + TS - tyx[:, 1:2] * TS
    assert ((wy >= 0) & (wy < WS) & (wx >= 0) & (wx < WS))[tv].all()
    wpos = wy * WS + wx

    hub = assign["hub_dest"]
    direct = assign["direct_dest"]
    nd_pad = max(8, -(-max(1, len(direct)) // 8) * 8)
    dense_pos = np.zeros(hp.nr + nd_pad, np.int64)
    dense_valid = np.zeros(hp.nr + nd_pad, bool)
    dense_pos[:hp.nr] = np.where(hub >= 0, pos[np.where(hub >= 0, hub, 0)],
                                 0)
    dense_valid[:hp.nr] = hub >= 0
    dense_pos[hp.nr:hp.nr + len(direct)] = pos[direct]
    dense_valid[hp.nr:hp.nr + len(direct)] = True
    return {
        "tile_dest_wpos": jnp.asarray(wpos, jnp.int32),
        "tile_dest_valid": jnp.asarray(tv),
        "tile_coords": jnp.asarray(tyx, jnp.int32),
        "dense_pos": jnp.asarray(dense_pos, jnp.int32),
        "dense_valid": jnp.asarray(dense_valid),
    }
