"""Rain clouds as vectorized disc rasterization (reference `rain.py:1-185`).

Clouds move at unit speed toward a map corner; the rain plane is the
union of their discs; a cooldown of RAIN_COOLDOWN sim-seconds starts when
the last cloud exits; new clouds spawn just inside a random edge with
probability RAIN_SPAWN_CHANCE per tick while fewer than
RAIN_OCCURRENCES_MAX are active.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.state import RainState


def init_rain_state(cfg: Config) -> RainState:
    R = cfg.RAIN_OCCURRENCES_MAX
    z = jnp.zeros((R,), jnp.float32)
    return RainState(active=jnp.zeros((R,), bool), cx=z, cy=z, vx=z, vy=z,
                     radius=z, cooldown=jnp.int32(0))


def step_rain(cfg: Config, H: int, W: int, rain: RainState, key,
              force_spawn=None):
    """Advance clouds one tick.  Returns (rain', rain_map [H,W] bool)."""
    if not cfg.RAIN_ENABLED:
        return rain, jnp.zeros((H, W), bool)
    R = cfg.RAIN_OCCURRENCES_MAX
    k_spawn, k_edge, k_pos, k_corner, k_rad = jax.random.split(key, 5)

    # move clouds (unit velocity, `rain.py:60-63`)
    cx = rain.cx + rain.vx
    cy = rain.cy + rain.vy
    # off-map exit (`rain.py:72-84`)
    exited = rain.active & (
        (cx < -rain.radius) | (cx > W + rain.radius) |
        (cy < -rain.radius) | (cy > H + rain.radius))
    active = rain.active & ~exited
    # cooldown starts when the last cloud leaves (`on_rain_exit`)
    none_left = ~jnp.any(active)
    cooldown = jnp.where(
        jnp.any(exited) & none_left,
        cfg.RAIN_COOLDOWN // cfg.TIME_PER_STEP_IN_SECONDS,
        jnp.maximum(rain.cooldown - 1, 0))

    # spawn (`add_random_rain` `rain.py:103-148`)
    want = jax.random.uniform(k_spawn) < cfg.RAIN_SPAWN_CHANCE
    if force_spawn is not None:
        want = want | force_spawn
    can = (jnp.sum(active) < R) & (cooldown == 0) & want
    slot = jnp.argmin(active)     # first inactive slot
    edge = jax.random.randint(k_edge, (), 0, 4)    # 0 N,1 S,2 E,3 W
    off = float(cfg.RAIN_SPAWN_OFFSET)
    upos = jax.random.uniform(k_pos)
    x0 = jnp.where(edge == 0, upos * W,
                   jnp.where(edge == 1, upos * W,
                             jnp.where(edge == 2, W - off, off)))
    y0 = jnp.where(edge == 0, H - off,
                   jnp.where(edge == 1, off, upos * H))
    # aim at a corner on the far side
    flip = jax.random.bernoulli(k_corner)
    xt = jnp.where(edge == 0, jnp.where(flip, 0.0, float(W)),
                   jnp.where(edge == 1, jnp.where(flip, 0.0, float(W)),
                             jnp.where(edge == 2, 0.0, float(W))))
    yt = jnp.where(edge == 2, jnp.where(flip, float(H), 0.0),
                   jnp.where(edge == 3, jnp.where(flip, float(H), 0.0),
                             jnp.where(edge == 0, 0.0, float(H))))
    dx, dy = xt - x0, yt - y0
    ln = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1.0)
    radius = jax.random.randint(k_rad, (), cfg.RAIN_RADIUS_MIN,
                                cfg.RAIN_RADIUS_MAX + 1).astype(jnp.float32)

    do = can & ~active[slot]
    active = active.at[slot].set(jnp.where(do, True, active[slot]))
    cx = cx.at[slot].set(jnp.where(do, x0, cx[slot]))
    cy = cy.at[slot].set(jnp.where(do, y0, cy[slot]))
    vx = rain.vx.at[slot].set(jnp.where(do, dx / ln, rain.vx[slot]))
    vy = rain.vy.at[slot].set(jnp.where(do, dy / ln, rain.vy[slot]))
    rad = rain.radius.at[slot].set(jnp.where(do, radius, rain.radius[slot]))

    # rasterize union of discs (`rain.py:44-50, 64-70` offsets -> mask)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    icx = jnp.floor(cx).astype(jnp.float32)
    icy = jnp.floor(cy).astype(jnp.float32)
    d2 = (xs[None] - icx[:, None, None]) ** 2 + \
        (ys[None] - icy[:, None, None]) ** 2          # [R, H, W]
    covered = (d2 <= (rad ** 2)[:, None, None]) & active[:, None, None]
    rain_map = jnp.any(covered, axis=0)

    return RainState(active=active, cx=cx, cy=cy, vx=vx, vy=vy, radius=rad,
                     cooldown=cooldown), rain_map
