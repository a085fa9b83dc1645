"""City-block food/waste tanks (reference `city_block.py:60-150`).

Gradual mode: fractional per-tick rate with remainder carry applied in
whole units; burst mode: every FOOD_CONSUMPTION_TICKS /
WASTE_PRODUCTION_TICKS ticks consume/produce `inner_count` units.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..core.state import BlocksState, BlockStatic


def init_blocks_state(bs: BlockStatic) -> BlocksState:
    return BlocksState(
        food=jnp.where(bs.valid, bs.food_cap, 0.0),   # start full
        waste=jnp.zeros_like(bs.waste_cap),           # start empty
        food_rem=jnp.zeros_like(bs.food_cap),
        waste_rem=jnp.zeros_like(bs.food_cap))


def step_blocks(cfg: Config, bs: BlockStatic, st: BlocksState,
                tick) -> BlocksState:
    inner = bs.inner_count.astype(jnp.float32)
    if cfg.GRADUAL_CITY_BLOCK_RESOURCES:
        frate = inner / cfg.FOOD_CONSUMPTION_TICKS
        wrate = inner / cfg.WASTE_PRODUCTION_TICKS
        frem = st.food_rem + jnp.where(bs.needs_food, frate, 0.0)
        fwhole = jnp.floor(frem)
        food = jnp.maximum(st.food - fwhole, 0.0)
        frem = frem - fwhole
        wrem = st.waste_rem + jnp.where(bs.produces_waste, wrate, 0.0)
        wwhole = jnp.floor(wrem)
        waste = jnp.minimum(st.waste + wwhole, bs.waste_cap)
        wrem = wrem - wwhole
        return BlocksState(food=food, waste=waste, food_rem=frem,
                           waste_rem=wrem)
    fdue = (tick % cfg.FOOD_CONSUMPTION_TICKS) == 0
    wdue = (tick % cfg.WASTE_PRODUCTION_TICKS) == 0
    food = jnp.where(bs.needs_food & fdue,
                     jnp.maximum(st.food - inner, 0.0), st.food)
    waste = jnp.where(bs.produces_waste & wdue,
                      jnp.minimum(st.waste + inner, bs.waste_cap), st.waste)
    return st.replace(food=food, waste=waste)


def food_shortage(bs: BlockStatic, st: BlocksState) -> jnp.ndarray:
    return jnp.where(bs.valid & bs.needs_food, bs.food_cap - st.food, -1.0)


def waste_surplus(bs: BlockStatic, st: BlocksState) -> jnp.ndarray:
    return jnp.where(bs.valid & bs.produces_waste, st.waste, -1.0)
