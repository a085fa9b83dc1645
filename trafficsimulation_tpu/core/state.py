"""World state: struct-of-arrays pytrees resident in HBM.

This collapses the reference's dual representation (CellAgent object graph
+ NumPy array mirrors, `city_model.py:109-115`, `cell.py:11-60`) into one
set of device arrays.  Every `[H, W]` plane gains a leading batch dim under
`jax.vmap`; all pools are fixed-capacity with validity masks (XLA needs
static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Grid:
    """Static lattice planes (reference array mirrors, `city_model.py:109-115`,
    `_build_simple_maps` `city_model.py:2151-2199`)."""
    cell_type: jnp.ndarray      # u8 [H, W]
    orig_type: jnp.ndarray      # u8 [H, W] type before ControlledRoad conversion
    allowed_dirs: jnp.ndarray   # u8 [H, W] bitmask N=1,E=2,S=4,W=8
    road_class: jnp.ndarray     # u8 [H, W] road_type_map parity: 0/1/2/3
    is_road: jnp.ndarray        # bool [H, W] road-like (drivable)
    intersection: jnp.ndarray   # bool [H, W]
    group_id: jnp.ndarray       # i32 [H, W] intersection light group or -1
    block_id: jnp.ndarray       # i32 [H, W] city block id or -1
    light_id: jnp.ndarray       # i32 [H, W] TrafficLight id or -1
    dest_id: jnp.ndarray        # i32 [H, W] routing destination id or -1
    queue_group: jnp.ndarray    # i32 [H, W] lane cell's light group or -1
    queue_bucket: jnp.ndarray   # i8 [H, W] 0 ns_in/1 ns_out/2 ew_in/3 ew_out


@struct.dataclass
class LightStatic:
    """Per-TrafficLight static tables (reference `CellAgent` light fields,
    `cell.py:22-48`, stop actuation `cell.py:241-251`).  Stop actuation is
    expressed as (controlled road -> light) assignment pairs instead of
    ragged `controlled_blocks` lists."""
    valid: jnp.ndarray         # bool [L]
    pos: jnp.ndarray           # i32 [L] flat cell index
    group: jnp.ndarray         # i32 [L] owning group id (-1)
    axis: jnp.ndarray          # i32 [L] 0=N-S, 1=E-W, -1 unclassified
    assign_road: jnp.ndarray   # i32 [A] controlled-road flat index (-1 pad)
    assign_light: jnp.ndarray  # i32 [A] light id
    assign_valid: jnp.ndarray  # bool [A]
    # axis-aligned RUN decomposition of each light's stop cells (own cell
    # + assigned roads): per tick the stop map becomes two diff-array
    # writes per run + a log-shift prefix pass instead of one scatter
    # element per cell (fsm.build_stop_map).  Indices address the padded
    # H-diff [H, W+1] / V-diff [H+1, W] buffers (H-section first).
    srun_lo: jnp.ndarray       # i32 [A]
    srun_hi: jnp.ndarray       # i32 [A]
    srun_light: jnp.ndarray    # i32 [A] owning light (-1 pad)
    # assignment pairs whose cell is owned by ANOTHER light's run (rare
    # multi-light cells keep exact OR-semantics via a scalar scatter)
    sextra_cell: jnp.ndarray   # i32 [A] flat cell (-1 pad)
    sextra_light: jnp.ndarray  # i32 [A]


@struct.dataclass
class GroupStatic:
    """Per-intersection-light-group static tables (reference
    `IntersectionLightGroup.initialize_cached_lane_coords`
    `intersection_light_group.py:118-171` and `populate_links` `:175-279`).
    Lane-coordinate lists live as (queue_group, queue_bucket) labels on the
    Grid; per-tick queues are segment-sums over those labels."""
    valid: jnp.ndarray        # bool [G]
    neighbor: jnp.ndarray     # i32 [G, 4] neighbor group per direction (-1)
    intermediates: jnp.ndarray  # i32 [G, M] passed-over groups (-1 pad)
    bbox: jnp.ndarray         # i32 [G, 4] (minx, maxx, miny, maxy)
    intersection_size: jnp.ndarray  # f32 [G] = |cells| / 16
    penalty_score: jnp.ndarray      # f32 [G] mean road-type penalty
    # compact queue list: the nonzero cells of (queue_group, queue_bucket),
    # so per-tick queue reductions gather Q elements instead of
    # scatter-adding the whole grid (TPU scatters are ~19 cycles/element)
    queue_cells: jnp.ndarray    # i32 [Q] flat cell index (clipped; pad ok)
    queue_qgroup: jnp.ndarray   # i32 [Q] owning group (-1 pad)
    queue_qbucket: jnp.ndarray  # i32 [Q] bucket 0..3 lanes, 4 intersection
    # axis-aligned RUN decomposition of the same labels: per-tick queue
    # counts become 2 prefix-sum gathers per run (~5x fewer scalar
    # elements than the per-cell gather; see fsm.group_reductions).
    # Indices address the padded prefix buffer [H*(W+1) + (H+1)*W].
    run_lo: jnp.ndarray         # i32 [R] prefix idx at run start
    run_hi: jnp.ndarray         # i32 [R] prefix idx one past run end
    run_seg: jnp.ndarray        # i32 [R] segment id group*5+bucket (-1 pad)


@struct.dataclass
class BlockStatic:
    """Per-city-block static tables (reference `CityBlock`,
    `city_block.py:14-211`)."""
    valid: jnp.ndarray        # bool [B]
    btype: jnp.ndarray        # u8 [B] zone cell-type code
    inner_count: jnp.ndarray  # i32 [B] number of inner cells
    entrance: jnp.ndarray     # i32 [B] flat index of BlockEntrance (-1)
    dest: jnp.ndarray         # i32 [B] routing destination id (-1)
    service_dest: jnp.ndarray  # i32 [B] service road cell dest id (-1)
    food_cap: jnp.ndarray     # f32 [B]
    waste_cap: jnp.ndarray    # f32 [B]
    needs_food: jnp.ndarray   # bool [B]
    produces_waste: jnp.ndarray  # bool [B]


@struct.dataclass
class DestStatic:
    """Routing destinations: block entrances + highway exits, plus the
    highway-entrance spawn points.  (Reference valid targets:
    `city_model.py:2102-2118`.)"""
    valid: jnp.ndarray   # bool [D]
    pos: jnp.ndarray     # i32 [D] flat cell index
    kind: jnp.ndarray    # u8 [D] 0 = block entrance, 1 = highway exit
    block: jnp.ndarray   # i32 [D] block id for entrances (-1)
    hw_pos: jnp.ndarray    # i32 [E] highway-entrance flat cells (-1 pad)
    hw_valid: jnp.ndarray  # bool [E]
    # plane-facing ROUTING id per dest (what vehicles/grid.dest_id
    # carry): identity under dense routing; the hierarchical
    # tile*LMAX+l / direct id under cfg.ROUTING_HIER (ops/hier.py).
    # None == identity (legacy dense worlds).
    rid: jnp.ndarray = None  # i32 [D] or None


@struct.dataclass
class LightsState:
    """Dynamic light-group FSM state (reference
    `intersection_light_group.py:44-74`)."""
    current_phase: jnp.ndarray    # i32 [G] 0=N-S green, 1=E-W green, -1 none
    pending_phase: jnp.ndarray    # i32 [G] -1 = none
    transition_timer: jnp.ndarray # i32 [G]
    clearance_timer: jnp.ndarray  # i32 [G]
    ft_phase: jnp.ndarray         # i32 [G] fixed-time current phase
    fixed_time_timer: jnp.ndarray # i32 [G]
    queue_timer: jnp.ndarray      # i32 [G]
    gap_timer: jnp.ndarray        # i32 [G]
    last_arrival: jnp.ndarray     # i32 [G]
    ns_pressure: jnp.ndarray      # f32 [G] (read by neighbor controllers)
    ew_pressure: jnp.ndarray      # f32 [G]
    rl_timer: jnp.ndarray         # i32 [G]
    light_stop: jnp.ndarray       # bool [L] per-light stop flag


@struct.dataclass
class Vehicles:
    """Vehicle pool (reference `VehicleAgent` state, `vehicle_base.py:29-86`;
    service extension `vehicle_service.py:13-157`)."""
    active: jnp.ndarray         # bool [V]
    pos: jnp.ndarray            # i32 [V] flat index (-1)
    heading: jnp.ndarray        # i32 [V] 0..3 (-1 unknown)
    dest: jnp.ndarray           # i32 [V] destination id (-1)
    base_speed: jnp.ndarray     # i32 [V] persistent cruising speed (0=unset)
    current_speed: jnp.ndarray  # i32 [V]
    stuck_ticks: jnp.ndarray    # i32 [V]
    is_stuck: jnp.ndarray       # bool [V]
    stranded_ticks: jnp.ndarray # i32 [V]
    parked: jnp.ndarray         # bool [V]
    in_collision: jnp.ndarray   # bool [V]
    in_malfunction: jnp.ndarray # bool [V]
    contraflow_ticks: jnp.ndarray  # i32 [V] remaining contraflow allowance
    contraflow_key: jnp.ndarray    # i32 [V] flow direction at excursion
                                # start (selects the per-direction merge
                                # wavefront byte; pd CFKEY bits)
    contraflow_steps: jnp.ndarray  # i32 [V] contraflow cells taken this
                                # excursion (pd CFSTEPS bits)
    detour: jnp.ndarray         # bool [V] contraflow excursion is a stuck
                                # detour (vs overtake) — the reference's
                                # `in_stuck_detour` gauge
                                # (`dynamic_traffic_generator.py:131`)
    kind: jnp.ndarray           # u8 [V] 0 internal,1 through,2 food,3 waste
    depart_time: jnp.ndarray    # f32 [V] sim seconds
    steps_traveled: jnp.ndarray # i32 [V]
    # service-vehicle FSM (unused for kinds 0/1)
    service_phase: jnp.ndarray  # u8 [V] 0 to_block, 1 servicing, 2 to_exit
    load: jnp.ndarray           # f32 [V]
    service_timer: jnp.ndarray  # i32 [V]
    service_block: jnp.ndarray  # i32 [V]


@struct.dataclass
class BlocksState:
    """Dynamic food/waste tanks (reference `city_block.py:114-145`)."""
    food: jnp.ndarray       # f32 [B]
    waste: jnp.ndarray      # f32 [B]
    food_rem: jnp.ndarray   # f32 [B] gradual-mode fractional carry
    waste_rem: jnp.ndarray  # f32 [B]


@struct.dataclass
class RainState:
    """Rain clouds (reference `rain.py:18-185`)."""
    active: jnp.ndarray   # bool [R]
    cx: jnp.ndarray       # f32 [R] center x
    cy: jnp.ndarray       # f32 [R]
    vx: jnp.ndarray       # f32 [R] unit velocity * speed
    vy: jnp.ndarray       # f32 [R]
    radius: jnp.ndarray   # f32 [R]
    cooldown: jnp.ndarray # i32 [] seconds until next spawn allowed


@struct.dataclass
class Demand:
    """Pre-generated day of trips, sorted by departure tick (reference
    `DynamicTrafficAgent._generate_day`, `dynamic_traffic_generator.py:307-396`)."""
    depart_tick: jnp.ndarray  # i32 [T] tick index within the day
    origin: jnp.ndarray       # i32 [T] flat cell index of spawn cell
    dest: jnp.ndarray         # i32 [T] destination id
    kind: jnp.ndarray         # u8 [T]
    valid: jnp.ndarray        # bool [T]
    cursor: jnp.ndarray       # i32 [] next un-spawned trip
    day: jnp.ndarray          # i32 [] current day index


@struct.dataclass
class Metrics:
    """Accumulators mirroring the reference stats hub
    (`dynamic_traffic_generator.py:525-649`)."""
    created_internal: jnp.ndarray
    created_through: jnp.ndarray
    created_service: jnp.ndarray
    completed_internal: jnp.ndarray
    completed_through: jnp.ndarray
    completed_service: jnp.ndarray
    errored_internal: jnp.ndarray
    errored_through: jnp.ndarray
    sum_duration_internal: jnp.ndarray   # f32 sim-seconds
    sum_duration_through: jnp.ndarray
    sum_steps_internal: jnp.ndarray
    sum_steps_through: jnp.ndarray
    collisions_total: jnp.ndarray
    malfunctions_total: jnp.ndarray
    # daily counters (reset at day rollover; the reference records
    # finished - spawned per day, `dynamic_traffic_generator.py:161-179`)
    daily_created: jnp.ndarray
    daily_finished: jnp.ndarray
    last_daily_difference: jnp.ndarray
    # rollover accumulators for the reference's `avg_daily_difference`
    # (mean of daily finished-created over completed days,
    # `dynamic_traffic_generator.py:605-611`)
    daily_diff_sum: jnp.ndarray
    days_completed: jnp.ndarray
    day: jnp.ndarray


@struct.dataclass
class Overrides:
    """Host-bridge override struct: the Tornado Go/Stop endpoints of the
    reference (`traffic_light_control.py:407-438`) become masks donated into
    the next scan segment.  force: -1 = no override, 0 = force go, 1 = force
    stop (per light)."""
    light_force: jnp.ndarray   # i8 [L]
    spawn_rain: jnp.ndarray    # bool []


@struct.dataclass
class World:
    """The complete simulation state for one (or a vmapped batch of) worlds."""
    # static after generation
    grid: Grid
    lights_static: LightStatic
    groups_static: GroupStatic
    blocks_static: BlockStatic
    dests: DestStatic
    cost_field: jnp.ndarray     # i32 [D, 4, H, W] PRE-ENCODED move-candidate
    #                             keys (cost<<2 | dir; engine.field_to_keys)
    nearest_exit: jnp.ndarray   # i32 [D] nearest highway-exit dest id as
    #                             seen from each destination cell
    # dynamic planes
    veh_map: jnp.ndarray        # i32 [H, W] vehicle index or -1
    stop_map: jnp.ndarray       # bool [H, W]
    rain_map: jnp.ndarray       # bool [H, W]
    stuck_map: jnp.ndarray      # i32 [H, W] stuck ticks of occupant
    density: jnp.ndarray        # f32 [H, W] local road occupancy fraction
    # dynamic pools
    vehicles: Vehicles
    lights: LightsState
    blocks: BlocksState
    rain: RainState
    demand: Demand
    metrics: Metrics
    overrides: Overrides
    # pedestrians (BASELINE config #3 extension): count planes, see
    # agents/pedestrians.py (walk/cross i32 [4, H, W])
    peds: object                # agents.pedestrians.Pedestrians
    ped_map: jnp.ndarray        # i32 [H, W] pedestrian count per cell
    # clock
    tick: jnp.ndarray           # i32 []
    elapsed: jnp.ndarray        # f32 [] sim-seconds since start
    key: jnp.ndarray            # PRNG key
    # RL controller train state (None for FSM algorithms)
    rl: object = None
    # hierarchical routing (cfg.ROUTING_HIER, ops/hier.py): packed
    # static windowed next-move planes [ceil(9*HIER_LMAX/4), H, W];
    # None under dense routing.  With ROUTING_HIER, `cost_field` holds
    # the DENSE rows only (region hubs first, then direct dests).
    local_sdir4: jnp.ndarray = None

    @property
    def occupancy(self) -> jnp.ndarray:
        return self.veh_map >= 0
