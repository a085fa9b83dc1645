"""Top-level simulation: world init, fused tick, scan runner.

`TrafficSim` is the TPU-native counterpart of the reference `CityModel`
(`city_model.py:26-204, 1831-1860`): one `World` pytree in HBM, one
jitted `step_world` advancing lights, vehicles, demand, rain and block
resources, and `run(n)` rolling the whole thing inside `jax.lax.scan`.

Tick order (reference `CityModel.step` `city_model.py:1831-1860`, with
the batched-decide semantics of `PATHFINDING_BATCHING`):
  1. density map refresh          (`city_model.py:1853`)
  2. vehicle decide               (`run_parallel_decide` `:1855-1858`)
  3. light controllers + phase commit + host overrides
  4. vehicle movement (CA commit)
  5. arrivals / service FSM / despawns
  6. demand spawning + day rollover
  7. rain, block resources, metrics, clock
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import codes as C
from .config import Config
from .core.state import World, Vehicles, Metrics, Overrides
from .gen.generate import generate_city
from .ops import movement, routing
from .ops.density import density_map
from .lights import fsm
from .agents import demand as demand_mod
from .agents.blocks import (init_blocks_state, step_blocks, food_shortage,
                            waste_surplus)
from .agents.rain import init_rain_state, step_rain
from .agents.pedestrians import (init_pedestrians, ped_capacity,
                                 step_pedestrians)

KIND_INTERNAL, KIND_THROUGH, KIND_FOOD, KIND_WASTE = 0, 1, 2, 3


def init_vehicles(V: int) -> Vehicles:
    zi = jnp.zeros((V,), jnp.int32)
    zb = jnp.zeros((V,), bool)
    zf = jnp.zeros((V,), jnp.float32)
    return Vehicles(
        active=zb, pos=jnp.full((V,), -1, jnp.int32),
        heading=jnp.full((V,), -1, jnp.int32),
        dest=jnp.full((V,), -1, jnp.int32),
        base_speed=zi, current_speed=zi, stuck_ticks=zi, is_stuck=zb,
        stranded_ticks=zi, parked=zb, in_collision=zb, in_malfunction=zb,
        contraflow_ticks=zi, kind=jnp.zeros((V,), jnp.uint8),
        depart_time=zf, steps_traveled=zi,
        service_phase=jnp.zeros((V,), jnp.uint8), load=zf,
        service_timer=zi, service_block=jnp.full((V,), -1, jnp.int32))


def init_metrics() -> Metrics:
    z = jnp.int32(0)
    zf = jnp.float32(0.0)
    return Metrics(
        created_internal=z, created_through=z, created_service=z,
        completed_internal=z, completed_through=z, completed_service=z,
        errored_internal=z, errored_through=z,
        sum_duration_internal=zf, sum_duration_through=zf,
        sum_steps_internal=z, sum_steps_through=z,
        collisions_total=z, malfunctions_total=z,
        daily_created=z, daily_finished=z, last_daily_difference=z,
        day=z)


def init_world(cfg: Config, key) -> World:
    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    kgen, kday = jax.random.split(key)
    grid, ls, gs, bs, dests, field = generate_city(cfg, kgen)
    layout = trip_layout_cached(cfg)
    DF = field.shape[0]
    dem = demand_mod.generate_days(
        cfg, layout, kday, jnp.int32(0), cfg.DEMAND_PREGEN_DAYS,
        jnp.int32(-1), bs.valid, bs.btype, bs.dest, bs.entrance,
        dests.valid, dests.kind, dests.hw_pos, dests.hw_valid, DF)
    return World(
        grid=grid, lights_static=ls, groups_static=gs, blocks_static=bs,
        dests=dests, cost_field=field,
        veh_map=jnp.full((H, W), -1, jnp.int32),
        stop_map=jnp.zeros((H, W), bool),
        rain_map=jnp.zeros((H, W), bool),
        stuck_map=jnp.zeros((H, W), jnp.int32),
        density=jnp.zeros((H, W), jnp.float32),
        vehicles=init_vehicles(caps.max_vehicles),
        lights=fsm.init_lights_state(cfg, caps.max_groups, caps.max_lights,
                                     gs.valid),
        blocks=init_blocks_state(bs),
        rain=init_rain_state(cfg),
        demand=dem,
        metrics=init_metrics(),
        peds=init_pedestrians(ped_capacity(cfg)
                              if cfg.PEDESTRIANS_ENABLED else 8),
        ped_map=jnp.zeros((H, W), jnp.int32),
        ped_spawn_cells=jnp.nonzero(
            (grid.cell_type == C.SIDEWALK).reshape(-1),
            size=4096, fill_value=-1)[0].astype(jnp.int32),
        overrides=Overrides(
            light_force=jnp.full((caps.max_lights,), -1, jnp.int8),
            spawn_rain=jnp.bool_(False)),
        tick=jnp.int32(0),
        elapsed=jnp.float32(0.0),
        key=key,
        rl=_maybe_init_rl(cfg, caps.max_groups, key))


def _maybe_init_rl(cfg: Config, num_groups: int, key):
    if cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM in fsm.RL_ALGOS:
        from .rl.controllers import init_rl_state
        return init_rl_state(cfg, num_groups, key)
    return None


@functools.cache
def trip_layout_cached(cfg: Config):
    return demand_mod.trip_layout(cfg)


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------

def _despawn(vehicles: Vehicles, veh_map_flat, who):
    """Remove `who` from pool and map (`_despawn` `vehicle_base.py:777`)."""
    HW = veh_map_flat.shape[0] - 1
    old = jnp.where(who, jnp.clip(vehicles.pos, 0, HW - 1), HW)
    veh_map_flat = veh_map_flat.at[old].set(-1)
    return vehicles.replace(
        active=vehicles.active & ~who,
        pos=jnp.where(who, -1, vehicles.pos),
        parked=vehicles.parked & ~who,
        is_stuck=vehicles.is_stuck & ~who), veh_map_flat


def step_world(cfg: Config, world: World) -> World:
    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    HW = H * W
    V = caps.max_vehicles
    layout = trip_layout_cached(cfg)
    dt = float(cfg.TIME_PER_STEP_IN_SECONDS)
    grid = world.grid
    key, k_decide, k_move, k_rain, k_day, k_spawn = jax.random.split(
        world.key, 6)

    tick = world.tick
    elapsed = world.elapsed + dt

    inter_flat = grid.intersection.reshape(-1)
    enter = 1.0 + routing.road_type_penalty(cfg, grid.road_class)

    # ---- 1. density --------------------------------------------------------
    occupancy = world.veh_map >= 0
    density = density_map(occupancy, grid.is_road,
                          cfg.VEHICLE_AWARENESS_RANGE)

    # ---- 2. lights (Mesa's RandomActivation interleaves light and
    # vehicle steps; we commit lights first so decide reads the fresh
    # stop_map and move can reuse decide's stop flags) -----------------------
    rl_state = world.rl
    rl_request = None
    if cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM in fsm.RL_ALGOS:
        from .rl.controllers import rl_controller_step
        key, k_rl = jax.random.split(key)
        m0 = world.metrics
        avg_dur = 0.5 * (
            m0.sum_duration_internal
            / jnp.maximum(m0.completed_internal, 1)
            + m0.sum_duration_through
            / jnp.maximum(m0.completed_through, 1))
        avg_tpc = 0.5 * (
            m0.sum_duration_internal
            / jnp.maximum(m0.sum_steps_internal, 1)
            + m0.sum_duration_through
            / jnp.maximum(m0.sum_steps_through, 1))
        trip_penalty = 0.01 * avg_dur + 1.0 * avg_tpc
        rl_state, lights_rl, want, phase_req = rl_controller_step(
            cfg, rl_state, grid, world.groups_static, world.lights,
            occupancy, world.stuck_map, trip_penalty, k_rl)
        world = world.replace(lights=lights_rl)
        rl_request = (want, phase_req)
    red = fsm.group_reductions(grid, occupancy, caps.max_groups)
    lights = fsm.run_controllers(cfg, grid, world.groups_static,
                                 world.lights, occupancy,
                                 rl_phase_request=rl_request,
                                 reductions=red[:4])
    lights = fsm.execute_phase_change(cfg, world.lights_static,
                                      world.groups_static, lights,
                                      red[4])
    lights = fsm.apply_light_overrides(lights, world.overrides.light_force)
    stop_map = fsm.build_stop_map(grid, world.lights_static, lights)

    # ---- 2b. pedestrians (config #3 extension) ------------------------------
    peds, ped_map = world.peds, world.ped_map
    ped_block = None
    if cfg.PEDESTRIANS_ENABLED:
        key, k_ped = jax.random.split(key)
        peds, ped_block, ped_count = step_pedestrians(
            cfg, H, W, peds, grid.cell_type.reshape(-1),
            stop_map.reshape(-1), world.ped_spawn_cells, k_ped)
        ped_map = ped_count.reshape(H, W)

    # ---- 3. decide ---------------------------------------------------------
    vehicles, cells, dirs, valid, on_stop, max_steps, events = \
        movement.decide(
            cfg, H, W, grid.allowed_dirs, enter, grid.is_road, inter_flat,
            world.cost_field, world.dests.pos, world.vehicles,
            world.veh_map, stop_map, world.rain_map, density, k_decide,
            ped_block=ped_block)

    # ---- 4. move -----------------------------------------------------------
    vehicles, veh_map = movement.move(cfg, H, W, vehicles, world.veh_map,
                                      stop_map, cells, dirs, valid, on_stop,
                                      max_steps, k_move,
                                      ped_block=ped_block)
    vm_flat = jnp.concatenate([veh_map.reshape(-1),
                               jnp.full((1,), -1, jnp.int32)])

    # ---- 5. arrivals / service FSM / despawns ------------------------------
    m = world.metrics
    dest_pos_of = world.dests.pos[jnp.clip(vehicles.dest, 0,
                                           world.dests.pos.shape[0] - 1)]
    at_target = vehicles.active & (vehicles.dest >= 0) & \
        (vehicles.pos == dest_pos_of)

    # normal trips complete (`on_target_reached` `vehicle_base.py:755-775`)
    done = at_target & (vehicles.kind <= KIND_THROUGH)
    dur = elapsed - vehicles.depart_time
    m = m.replace(
        completed_internal=m.completed_internal + jnp.sum(
            done & (vehicles.kind == KIND_INTERNAL)),
        completed_through=m.completed_through + jnp.sum(
            done & (vehicles.kind == KIND_THROUGH)),
        sum_duration_internal=m.sum_duration_internal + jnp.sum(
            jnp.where(done & (vehicles.kind == KIND_INTERNAL), dur, 0.0)),
        sum_duration_through=m.sum_duration_through + jnp.sum(
            jnp.where(done & (vehicles.kind == KIND_THROUGH), dur, 0.0)),
        sum_steps_internal=m.sum_steps_internal + jnp.sum(
            jnp.where(done & (vehicles.kind == KIND_INTERNAL),
                      vehicles.steps_traveled, 0)),
        sum_steps_through=m.sum_steps_through + jnp.sum(
            jnp.where(done & (vehicles.kind == KIND_THROUGH),
                      vehicles.steps_traveled, 0)),
        collisions_total=m.collisions_total + events["new_collisions"],
        malfunctions_total=m.malfunctions_total + events["new_malfunctions"])
    vehicles, vm_flat = _despawn(vehicles, vm_flat, done)

    # service FSM (`vehicle_service.py:41-140`)
    bs, bst = world.blocks_static, world.blocks
    is_svc = vehicles.active & (vehicles.kind >= KIND_FOOD)
    sb = jnp.clip(vehicles.service_block, 0, bs.valid.shape[0] - 1)
    # arrive at block -> park + transfer + timer (`_start_service`)
    arrive_blk = is_svc & at_target & (vehicles.service_phase == 0)
    shortage = food_shortage(bs, bst)
    surplus = waste_surplus(bs, bst)
    give = jnp.where(arrive_blk & (vehicles.kind == KIND_FOOD),
                     jnp.minimum(vehicles.load,
                                 jnp.maximum(shortage[sb], 0.0)), 0.0)
    take = jnp.where(arrive_blk & (vehicles.kind == KIND_WASTE),
                     jnp.minimum(cfg.SERVICE_VEHICLE_MAX_LOAD_WASTE
                                 - vehicles.load,
                                 jnp.maximum(surplus[sb], 0.0)), 0.0)
    food = jnp.clip(bst.food.at[sb].add(give), 0.0, bs.food_cap)
    waste = jnp.clip(bst.waste.at[sb].add(-take), 0.0, bs.waste_cap)
    bst = bst.replace(food=food, waste=waste)
    vehicles = vehicles.replace(
        load=vehicles.load - give + take,
        parked=vehicles.parked | arrive_blk,
        service_phase=jnp.where(arrive_blk, 1, vehicles.service_phase),
        service_timer=jnp.where(arrive_blk, cfg.SERVICE_VEHICLE_LOAD_TIME,
                                vehicles.service_timer))

    # servicing countdown -> finish (`_finish_service`)
    servicing = is_svc & (vehicles.service_phase == 1) & ~arrive_blk
    timer = jnp.where(servicing, vehicles.service_timer - 1,
                      vehicles.service_timer)
    finish = servicing & (timer <= 0)
    more = jnp.where(vehicles.kind == KIND_FOOD, vehicles.load > 0,
                     vehicles.load < cfg.SERVICE_VEHICLE_MAX_LOAD_WASTE)
    # next neediest block (with a routing field).  Service vehicles head
    # for the block's service road cell when it has a field, else the
    # entrance (`get_service_road_cell` `city_block.py:152-202`).
    DF = world.cost_field.shape[0]
    svc_target = jnp.where((bs.service_dest >= 0) & (bs.service_dest < DF),
                           bs.service_dest, bs.dest)
    blk_ok = (svc_target >= 0) & (svc_target < DF)
    best_food = jnp.argmax(jnp.where(blk_ok, shortage, -1.0))
    best_waste = jnp.argmax(jnp.where(blk_ok, surplus, -1.0))
    has_food_blk = jnp.max(jnp.where(blk_ok, shortage, -1.0)) > 0
    has_waste_blk = jnp.max(jnp.where(blk_ok, surplus, -1.0)) > 0
    nxt_blk = jnp.where(vehicles.kind == KIND_FOOD, best_food, best_waste)
    has_blk = jnp.where(vehicles.kind == KIND_FOOD, has_food_blk,
                        has_waste_blk)
    go_again = finish & more & has_blk
    # nearest exit by Manhattan distance (`_finish_service` `:122-137`)
    exit_ok = world.dests.valid & (world.dests.kind == 1) & (
        jnp.arange(world.dests.valid.shape[0]) < DF)
    ex = vehicles.pos % W
    ey = vehicles.pos // W
    dx_ = jnp.abs(world.dests.pos[None, :] % W - ex[:, None])
    dy_ = jnp.abs(world.dests.pos[None, :] // W - ey[:, None])
    man = jnp.where(exit_ok[None, :], dx_ + dy_, 2**30)
    nearest_exit = jnp.argmin(man, axis=1).astype(jnp.int32)
    go_exit = finish & ~go_again
    vehicles = vehicles.replace(
        service_timer=timer,
        parked=vehicles.parked & ~finish,
        service_block=jnp.where(go_again, nxt_blk, vehicles.service_block),
        dest=jnp.where(go_again, svc_target[nxt_blk],
                       jnp.where(go_exit, nearest_exit, vehicles.dest)),
        service_phase=jnp.where(go_again, 0,
                                jnp.where(go_exit, 2,
                                          vehicles.service_phase)))

    # service exit arrival: counted as a through completion (service
    # vehicles carry population_type="through", `vehicle_service.py:36`)
    svc_done = is_svc & at_target & (vehicles.service_phase == 2)
    m = m.replace(
        completed_through=m.completed_through + jnp.sum(svc_done),
        completed_service=m.completed_service + jnp.sum(svc_done),
        sum_duration_through=m.sum_duration_through + jnp.sum(
            jnp.where(svc_done, dur, 0.0)),
        sum_steps_through=m.sum_steps_through + jnp.sum(
            jnp.where(svc_done, vehicles.steps_traveled, 0)))
    vehicles, vm_flat = _despawn(vehicles, vm_flat, svc_done)

    # stuck despawn (`_despawn_check` `vehicle_base.py:695-706`)
    if cfg.VEHICLE_STUCK_DESPAWN_ENABLED:
        thresh = jnp.where(
            inter_flat[jnp.clip(vehicles.pos, 0, HW - 1)],
            cfg.VEHICLE_STUCK_DESPAWN_THRESHOLD_INTERSECTION,
            cfg.VEHICLE_STUCK_DESPAWN_THRESHOLD)
        kill = vehicles.active & (vehicles.stuck_ticks >= thresh)
        m = m.replace(
            errored_internal=m.errored_internal + jnp.sum(
                kill & (vehicles.kind == KIND_INTERNAL)),
            errored_through=m.errored_through + jnp.sum(
                kill & (vehicles.kind != KIND_INTERNAL)))
        vehicles, vm_flat = _despawn(vehicles, vm_flat, kill)

    # ---- 6. demand spawning.  The trip table is pre-generated for
    # DEMAND_PREGEN_DAYS (in-step regeneration would run on every tick
    # under vmapped batches — lax.cond lowers to select); the host
    # wrapper extends the table between scan segments.
    del k_day, layout
    dem = world.demand

    S = caps.max_spawns_per_tick
    T = dem.depart_tick.shape[0]
    idxs = dem.cursor + jnp.arange(S)
    j = jnp.clip(idxs, 0, T - 1)
    due = (idxs < T) & dem.valid[j] & (dem.depart_tick[j] <= tick + 1)
    due = jnp.cumprod(due.astype(jnp.int32)).astype(bool)  # sorted prefix
    if not cfg.ENABLE_TRAFFIC:   # reference ENABLE_TRAFFIC flag
        due = due & False
    slots = jnp.nonzero(~vehicles.active, size=S, fill_value=-1)[0]
    slots = slots.astype(jnp.int32)
    can = due & (slots >= 0)
    org = jnp.clip(dem.origin[j], 0, HW - 1)
    occupied = vm_flat[org] >= 0
    # two same-tick spawns at one entrance: lowest batch index wins
    first_tab = jnp.full((HW + 1,), jnp.int32(2**30)).at[
        jnp.where(can & ~occupied, org, HW)].min(jnp.arange(S))
    place = can & ~occupied & (first_tab[org] == jnp.arange(S))
    dropped = can & ~place
    tkind = dem.kind[j]

    # service spawn targets: the neediest block right now
    shortage2 = food_shortage(bs, bst)
    surplus2 = waste_surplus(bs, bst)
    sp_food_blk = jnp.argmax(jnp.where(blk_ok, shortage2, -1.0))
    sp_waste_blk = jnp.argmax(jnp.where(blk_ok, surplus2, -1.0))
    sp_blk = jnp.where(tkind == KIND_FOOD, sp_food_blk, sp_waste_blk)
    tdest = jnp.where(tkind <= KIND_THROUGH, dem.dest[j],
                      svc_target[sp_blk])

    sl = jnp.where(place, slots, V)  # V = out of bounds -> dropped

    def put(arr, val):
        return arr.at[sl].set(jnp.broadcast_to(val, (S,)).astype(arr.dtype),
                              mode="drop")
    vehicles = vehicles.replace(
        active=put(vehicles.active, True),
        pos=put(vehicles.pos, org.astype(jnp.int32)),
        heading=put(vehicles.heading, -1),
        dest=put(vehicles.dest, tdest),
        base_speed=put(vehicles.base_speed, 0),
        current_speed=put(vehicles.current_speed, 0),
        stuck_ticks=put(vehicles.stuck_ticks, 0),
        is_stuck=put(vehicles.is_stuck, False),
        stranded_ticks=put(vehicles.stranded_ticks, 0),
        parked=put(vehicles.parked, False),
        in_collision=put(vehicles.in_collision, False),
        in_malfunction=put(vehicles.in_malfunction, False),
        contraflow_ticks=put(vehicles.contraflow_ticks, 0),
        kind=put(vehicles.kind, tkind),
        depart_time=put(vehicles.depart_time, elapsed),
        steps_traveled=put(vehicles.steps_traveled, 0),
        service_phase=put(vehicles.service_phase, jnp.zeros_like(tkind)),
        load=put(vehicles.load, jnp.where(
            tkind == KIND_FOOD, cfg.SERVICE_VEHICLE_MAX_LOAD_FOOD, 0.0)),
        service_timer=put(vehicles.service_timer, 0),
        service_block=put(vehicles.service_block,
                          jnp.where(tkind >= KIND_FOOD, sp_blk, -1)))
    vm_flat = vm_flat.at[jnp.where(place, org, HW + 1)].set(
        jnp.clip(sl, 0, V - 1), mode="drop")
    dem = dem.replace(cursor=dem.cursor + jnp.sum(due))
    m = m.replace(
        created_internal=m.created_internal + jnp.sum(
            can & (tkind == KIND_INTERNAL)),
        created_through=m.created_through + jnp.sum(
            can & (tkind == KIND_THROUGH)),
        created_service=m.created_service + jnp.sum(
            can & (tkind >= KIND_FOOD)),
        errored_internal=m.errored_internal + jnp.sum(
            dropped & (tkind == KIND_INTERNAL)),
        errored_through=m.errored_through + jnp.sum(
            dropped & (tkind != KIND_INTERNAL)))

    # daily counters (`dynamic_traffic_generator.py:161-179`)
    off = (cfg.SIMULATION_STARTING_TIME_OF_DAY_HOURS * 3600
           + cfg.SIMULATION_STARTING_TIME_OF_DAY_MINUTES * 60)
    new_day = ((off + elapsed) // 86400).astype(jnp.int32)
    rolled = new_day > m.day
    tick_created = jnp.sum(can & (tkind <= KIND_THROUGH))
    tick_finished = jnp.sum(done) + jnp.sum(svc_done)
    m = m.replace(
        last_daily_difference=jnp.where(
            rolled, m.daily_finished - m.daily_created,
            m.last_daily_difference),
        daily_created=jnp.where(rolled, tick_created,
                                m.daily_created + tick_created),
        daily_finished=jnp.where(rolled, tick_finished,
                                 m.daily_finished + tick_finished),
        day=new_day)

    # ---- 7. rain, blocks, clock --------------------------------------------
    rain, rain_map = step_rain(cfg, H, W, world.rain, k_rain,
                               force_spawn=world.overrides.spawn_rain)
    bst = step_blocks(cfg, bs, bst, tick)

    veh_map = vm_flat[:HW].reshape(H, W)
    stuck_map = jnp.zeros((HW,), jnp.int32).at[
        jnp.where(vehicles.active, jnp.clip(vehicles.pos, 0, HW - 1), HW - 1)
    ].max(jnp.where(vehicles.active, vehicles.stuck_ticks, 0)).reshape(H, W)

    return world.replace(
        veh_map=veh_map, stop_map=stop_map, rain_map=rain_map,
        stuck_map=stuck_map, density=density,
        vehicles=vehicles, lights=lights, blocks=bst, rain=rain,
        demand=dem, metrics=m, peds=peds, ped_map=ped_map,
        overrides=Overrides(
            light_force=jnp.full_like(world.overrides.light_force, -1),
            spawn_rain=jnp.bool_(False)),
        tick=tick + 1, elapsed=elapsed, key=key, rl=rl_state)


def run_chunk(cfg: Config, world: World, n: int) -> World:
    """Advance n ticks inside one lax.scan (fused device loop)."""
    def body(w, _):
        return step_world(cfg, w), None
    world, _ = jax.lax.scan(body, world, None, length=n)
    return world


class TrafficSim:
    """Host-side convenience wrapper (the `CityModel` stand-in for users)."""

    def __init__(self, cfg: Config = Config(), seed: int = 0):
        self.reset(cfg, seed)

    def reset(self, cfg: Config = None, seed: int = 0):
        """Rebuild the model (the reference's model-reset path,
        `dynamic_grid_server.py:9-24`)."""
        if cfg is not None:
            self.cfg = cfg
        self._init = jax.jit(functools.partial(init_world, self.cfg))
        self._step = jax.jit(functools.partial(step_world, self.cfg))
        self._chunks = {}
        if hasattr(self, "_render"):
            del self._render
        self.world = self._init(jax.random.PRNGKey(seed))
        return self.world

    def step(self, n: int = 1):
        self._maybe_extend_demand(n)
        if n == 1:
            self.world = self._step(self.world)
            return self.world
        if n not in self._chunks:
            self._chunks[n] = jax.jit(
                functools.partial(run_chunk, self.cfg, n=n))
        self.world = self._chunks[n](self.world)
        return self.world

    def _maybe_extend_demand(self, n: int):
        """Extend the pre-generated trip table when the cursor nears its
        end (day rollover handled host-side between scan segments —
        reference `_generate_day` at rollover,
        `dynamic_traffic_generator.py:161-179`)."""
        from .agents import demand as demand_mod
        dem = self.world.demand
        T = int(dem.depart_tick.shape[0])
        if int(dem.cursor) < T - 2 * self.cfg.capacities().max_spawns_per_tick:
            return
        w = self.world
        key, kd = jax.random.split(w.key)
        layout = trip_layout_cached(self.cfg)
        DF = w.cost_field.shape[0]
        new = demand_mod.generate_days(
            self.cfg, layout, kd, dem.day + 1, self.cfg.DEMAND_PREGEN_DAYS,
            w.tick, w.blocks_static.valid, w.blocks_static.btype,
            w.blocks_static.dest, w.blocks_static.entrance,
            w.dests.valid, w.dests.kind, w.dests.hw_pos, w.dests.hw_valid,
            DF)
        self.world = w.replace(demand=new, key=key)

    # -- reference-parity query API (`city_model.py:1980-2149`) ------------
    def get_traffic_lights(self):
        import numpy as np
        ls = self.world.lights_static
        return np.asarray(ls.pos)[np.asarray(ls.valid)]

    def num_active_vehicles(self) -> int:
        return int(self.world.vehicles.active.sum())

    def spawn_vehicle(self, origin_flat: int, dest_id: int,
                      kind: int = 0) -> bool:
        """Manual spawn (the `/create_vehicle` endpoint path,
        `vehicle_control.py:64-154`).  Returns False when no slot is free
        or the cell is occupied."""
        import numpy as np
        w = self.world
        vm = np.asarray(w.veh_map).reshape(-1)
        if vm[origin_flat] >= 0:
            return False
        active = np.asarray(w.vehicles.active)
        free = np.nonzero(~active)[0]
        if len(free) == 0:
            return False
        slot = int(free[0])
        sb = -1
        if kind >= 2:  # service vehicle: target the neediest block
            bs, bst = w.blocks_static, w.blocks
            DF = w.cost_field.shape[0]
            sd = np.asarray(bs.service_dest)
            ed = np.asarray(bs.dest)
            tgt = np.where((sd >= 0) & (sd < DF), sd, ed)
            valid = np.asarray(bs.valid) & (tgt >= 0) & (tgt < DF)
            if kind == 2:
                urg = np.asarray(bs.food_cap) - np.asarray(bst.food)
            else:
                urg = np.asarray(bst.waste)
            urg = np.where(valid, urg, -1)
            sb = int(np.argmax(urg))
            dest_id = int(tgt[sb])
        v = w.vehicles
        idx = jnp.asarray([slot])
        load = (self.cfg.SERVICE_VEHICLE_MAX_LOAD_FOOD if kind == 2 else 0.0)
        v = v.replace(
            active=v.active.at[idx].set(True),
            pos=v.pos.at[idx].set(origin_flat),
            heading=v.heading.at[idx].set(-1),
            dest=v.dest.at[idx].set(dest_id),
            base_speed=v.base_speed.at[idx].set(0),
            kind=v.kind.at[idx].set(kind),
            parked=v.parked.at[idx].set(False),
            depart_time=v.depart_time.at[idx].set(w.elapsed),
            steps_traveled=v.steps_traveled.at[idx].set(0),
            service_phase=v.service_phase.at[idx].set(0),
            load=v.load.at[idx].set(load),
            service_block=v.service_block.at[idx].set(sb))
        H, W = self.cfg.HEIGHT, self.cfg.WIDTH
        veh_map = w.veh_map.reshape(-1).at[origin_flat].set(slot)
        self.world = w.replace(vehicles=v, veh_map=veh_map.reshape(H, W))
        return True

    def render(self):
        """On-device RGB framebuffer [H, W, 3] u8."""
        from .ops.render import render_frame
        if not hasattr(self, "_render"):
            self._render = jax.jit(lambda w: render_frame(
                w.grid, w.stop_map, w.rain_map, w.veh_map, w.vehicles,
                pending_mask=jnp.zeros_like(w.stop_map)))
        return self._render(self.world)

    def stats(self) -> dict:
        """Dashboard statistics (reference `TrafficStatistics.render`
        `traffic_statistics.py:31-391` + DTA cached stats
        `dynamic_traffic_generator.py:525-649`)."""
        import numpy as np
        w = self.world
        m = w.metrics
        v = w.vehicles
        active = np.asarray(v.active)
        kind = np.asarray(v.kind)
        dt = self.cfg.TIME_PER_STEP_IN_SECONDS
        off = (self.cfg.SIMULATION_STARTING_TIME_OF_DAY_HOURS * 3600
               + self.cfg.SIMULATION_STARTING_TIME_OF_DAY_MINUTES * 60)
        total = off + float(w.elapsed)

        def avg(s, c):
            c = int(c)
            return float(s) / c if c else 0.0

        return {
            "tick": int(w.tick),
            "sim_day": int(total // 86400),
            "sim_time_of_day": "%02d:%02d:%02d" % (
                (total % 86400) // 3600, (total % 3600) // 60, total % 60),
            "seconds_per_tick": dt,
            "live_internal": int((active & (kind == 0)).sum()),
            "live_through": int((active & (kind == 1)).sum()),
            "live_service_food": int((active & (kind == 2)).sum()),
            "live_service_waste": int((active & (kind == 3)).sum()),
            "created_internal": int(m.created_internal),
            "created_through": int(m.created_through),
            "created_service": int(m.created_service),
            "completed_internal": int(m.completed_internal),
            "completed_through": int(m.completed_through),
            "errored_internal": int(m.errored_internal),
            "errored_through": int(m.errored_through),
            "avg_duration_internal": avg(m.sum_duration_internal,
                                         m.completed_internal),
            "avg_duration_through": avg(m.sum_duration_through,
                                        m.completed_through),
            "avg_time_per_cell_internal": avg(m.sum_duration_internal,
                                              m.sum_steps_internal),
            "avg_time_per_cell_through": avg(m.sum_duration_through,
                                             m.sum_steps_through),
            "collisions_total": int(m.collisions_total),
            "malfunctions_total": int(m.malfunctions_total),
            "daily_created": int(m.daily_created),
            "daily_finished": int(m.daily_finished),
            "last_daily_difference": int(m.last_daily_difference),
            "parked": int((active & np.asarray(v.parked)).sum()),
            "stuck": int((active & np.asarray(v.is_stuck)).sum()),
            "overtaking": int((active &
                               (np.asarray(v.contraflow_ticks) > 0)).sum()),
            "avg_stuck_duration": avg(
                np.asarray(v.stuck_ticks)[active].sum() * dt,
                active.sum()),
            "max_stuck_duration": int(
                np.asarray(v.stuck_ticks)[active].max() * dt
                if active.any() else 0),
            "raining": int(np.asarray(w.rain.active).sum()),
        }
