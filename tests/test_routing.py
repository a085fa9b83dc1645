"""Cost-field correctness vs an exact Dijkstra oracle over the
(cell, heading) graph with the reference edge costs
(`astar_numba.py:87-239` static parts: base 1 + turn 10 + road-type
penalty of the entered cell)."""

import heapq

import jax
import jax.numpy as jnp
import numpy as np

from trafficsimulation_tpu import codes as C
from trafficsimulation_tpu.ops.routing import (compute_cost_fields,
                                               route_argmin, INF)
from trafficsimulation_tpu.config import Config


def dijkstra_oracle(cfg, allowed, road_class, dest_flat, is_road=None):
    """Exact cost-to-go F[h, y, x] by backward Dijkstra on the reversed
    (cell, heading) graph.  With `is_road`, includes contraflow edges
    onto road cells at +VEHICLE_CONTRAFLOW_PENALTY (the reference A*'s
    `ignore_flow` cost model, `astar_numba.py:184-214`)."""
    H, W = allowed.shape
    pen = {0: 0.0, 1: cfg.VEHICLE_ROAD_TYPES_PENALTY_R1,
           2: cfg.VEHICLE_ROAD_TYPES_PENALTY_R2,
           3: cfg.VEHICLE_ROAD_TYPES_PENALTY_R3}
    tp = cfg.VEHICLE_TURN_PENALTY
    cp = cfg.VEHICLE_CONTRAFLOW_PENALTY
    F = np.full((4, H, W), np.inf)
    pq = []
    dy, dx = C.DIR_DY, C.DIR_DX
    ty, tx = dest_flat // W, dest_flat % W
    for h in range(4):
        F[h, ty, tx] = 0.0
        heapq.heappush(pq, (0.0, h, ty, tx))
    while pq:
        d, h, y, x = heapq.heappop(pq)
        if d > F[h, y, x]:
            continue
        # predecessors: cells c with allowed move h landing on (y, x);
        # c = (y, x) - vec(h); cost = 1 + pen(entered=(y,x)) + turn(h', h)
        py, px = y - dy[h], x - dx[h]
        if not (0 <= py < H and 0 <= px < W):
            continue
        legal = bool(allowed[py, px] & (1 << h))
        contra_ok = is_road is not None and bool(is_road[y, x])
        if not (legal or contra_ok):
            continue
        base = 1.0 + pen[int(road_class[y, x])] + (0.0 if legal else cp)
        for hp in range(4):
            nd = d + base + (tp if hp != h else 0.0)
            if nd < F[hp, py, px]:
                F[hp, py, px] = nd
                heapq.heappush(pq, (nd, hp, py, px))
    return F


def test_field_matches_dijkstra(small_cfg, small_city):
    grid, _, _, _, dests, field = small_city
    allowed = np.asarray(grid.allowed_dirs)
    rc = np.asarray(grid.road_class)
    pos = np.asarray(dests.pos)
    valid = np.asarray(dests.valid)
    for d in [0, 1, int(np.nonzero(valid)[0][-1] if valid[:2].all() else 0)]:
        if d >= field.shape[0] or not valid[d]:
            continue
        oracle = dijkstra_oracle(small_cfg, allowed, rc, pos[d],
                                 is_road=np.asarray(grid.is_road))
        got = np.asarray(field[d])
        finite = np.isfinite(oracle)
        assert np.allclose(got[finite], oracle[finite], atol=1e-3), \
            f"dest {d}: max err {np.abs(got[finite]-oracle[finite]).max()}"
        assert (got[~finite] >= 1e8).all()


def test_cross_backend_field_vs_native_astar(small_cfg, small_city):
    """Cross-backend path-cost equivalence: the native C++ A* and the
    on-device cost field must agree on optimal static costs — the test
    whose absence let the reference's C++ backend drift (SURVEY §4(c))."""
    from trafficsimulation_tpu.native import astar as nat
    if not nat.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    grid, _, _, _, dests, _ = small_city
    H, W = grid.cell_type.shape
    # legal-flow-only field: the native A* below runs in strict mode
    # (no contraflow), so compare against the strict optimum
    field = compute_cost_fields(small_cfg, grid.allowed_dirs,
                                grid.road_class, dests.pos[:2],
                                dests.valid[:2])
    allowed = np.asarray(grid.allowed_dirs)
    rc = np.asarray(grid.road_class)
    is_road = np.asarray(grid.is_road)
    zeros = np.zeros((H, W), np.uint8)
    zerof = np.zeros((H, W), np.float32)

    d = 0
    dpos = int(dests.pos[d])
    gx, gy = dpos % W, dpos // W
    fmin = np.asarray(field[d]).min(axis=0)      # unknown-heading value
    enter = 1.0 + np.where(rc == 1, small_cfg.VEHICLE_ROAD_TYPES_PENALTY_R1,
                           np.where(rc == 2,
                                    small_cfg.VEHICLE_ROAD_TYPES_PENALTY_R2,
                                    np.where(rc == 3,
                                             small_cfg.
                                             VEHICLE_ROAD_TYPES_PENALTY_R3,
                                             0.0)))
    pen = {0: 0.0, 1: small_cfg.VEHICLE_ROAD_TYPES_PENALTY_R1,
           2: small_cfg.VEHICLE_ROAD_TYPES_PENALTY_R2,
           3: small_cfg.VEHICLE_ROAD_TYPES_PENALTY_R3}

    starts = np.argwhere(is_road & (np.asarray(field[d]).min(0) < 1e8))
    rng = np.random.default_rng(0)
    checked = 0
    for sy, sx in starts[rng.choice(len(starts), size=12, replace=False)]:
        if (sy, sx) == (gy, gx):
            continue
        path = nat.astar(small_cfg, (sx, sy), (gx, gy), zeros, zeros,
                         is_road.astype(np.uint8), rc, allowed)
        assert path, f"native A* found no path from ({sx},{sy})"
        # accumulate the path's cost under the shared model
        cost, prev_dir, px, py = 0.0, -1, sx, sy
        for (x, y) in path:
            d_idx = {(0, 1): 0, (1, 0): 1, (0, -1): 2, (-1, 0): 3}[
                (x - px, y - py)]
            cost += 1.0
            if prev_dir != -1 and d_idx != prev_dir:
                cost += small_cfg.VEHICLE_TURN_PENALTY
            cost += pen[int(rc[y, x])]
            prev_dir, px, py = d_idx, x, y
        # field value from the start with unknown heading
        fval = min(
            enter[sy + dy, sx + dx] + np.asarray(field[d])[m, sy + dy,
                                                           sx + dx]
            for m, (dy, dx) in enumerate(zip(C.DIR_DY, C.DIR_DX))
            if (allowed[sy, sx] & (1 << m))
            and 0 <= sy + dy < H and 0 <= sx + dx < W)
        # A* keys dist by cell only (like the reference), so its path may
        # be up to one full turn penalty worse than the exact
        # heading-aware optimum — never better.
        assert cost >= fval - 1e-3
        assert cost <= fval + small_cfg.VEHICLE_TURN_PENALTY + 1e-3, \
            f"({sx},{sy}): A* {cost} vs field {fval}"
        checked += 1
    assert checked >= 8


def test_descent_reaches_destination(small_cfg, small_city):
    grid, _, _, _, dests, field = small_city
    H, W = grid.cell_type.shape
    allowed_flat = grid.allowed_dirs.reshape(-1)
    is_road_flat = grid.is_road.reshape(-1)
    from trafficsimulation_tpu.ops.routing import road_type_penalty
    enter_flat = (1.0 + road_type_penalty(
        small_cfg, grid.road_class)).reshape(-1)
    zerof = jnp.zeros((H * W,), jnp.float32)
    falseh = jnp.zeros((H * W,), bool)

    d = 0
    dpos = int(dests.pos[d])
    # start from every road cell with a finite field value
    f0 = np.asarray(field[d]).min(axis=0).reshape(-1)
    starts = np.nonzero((f0 < 1e8) & np.asarray(is_road_flat))[0][:64]
    V = len(starts)
    assert V > 10
    pos = jnp.asarray(starts, jnp.int32)
    heading = jnp.full((V,), -1, jnp.int32)
    dest = jnp.full((V,), d, jnp.int32)
    # the field includes contraflow edges (reference ignore_flow model),
    # so walkers must be granted the matching allowance to descend
    # everywhere the field is finite
    nc = jnp.ones((V,), bool)
    for _ in range(4 * (H + W)):
        dr, nxt, cost = route_argmin(small_cfg, H, W, allowed_flat,
                                     enter_flat, is_road_flat, field, pos,
                                     heading, dest, zerof, falseh, nc)
        done = pos == dpos
        pos = jnp.where(done, pos, nxt)
        heading = jnp.where(done, heading, dr)
        if bool((pos == dpos).all()):
            break
    assert bool((pos == dpos).all()), \
        f"{int((pos != dpos).sum())} walkers failed to reach destination"
