"""Plane-CA simulation engine: vehicles as packed grid planes.

This is the production tick.  Round 1 kept vehicles as a struct-of-arrays
pool ([V] tables) and paid ~15-19 cycles/element for every per-vehicle
gather/scatter — the measured bottleneck (NOTES.md).  Here the vehicle
state lives ON the lattice as packed u32 planes and every step of the
reference semantics (`vehicle_base.py:616-753`) becomes [H, W] vector
math on the VPU:

  * decide  = element-wise plane ops (faults, speed, halting),
  * routing = one u8 next-move plane selected per destination row from a
    fixed-point cost-field stack (no per-vehicle gathers),
  * movement = VEHICLE_MAX_SPEED sub-rounds of masked shifts with
    random-priority conflict resolution via shifted key planes — the CA
    two-phase commit of SURVEY §7.3(2) with zero scatter/gather,
  * arrivals/service/spawns touch only the (few, static) destination
    cells and the (small) per-tick spawn window.

Semantics match the reference's batched-decide mode
(`PATHFINDING_BATCHING`, `city_model.py:1811-1829, 1855-1858`): all
decisions read start-of-tick maps, movement re-validates live occupancy
per sub-round, conflicts resolve by deterministic random priority.

The struct-of-arrays `Vehicles` pool remains the public World API; the
lossless pack/unpack at scan boundaries is in `world_to_planes` /
`planes_to_vehicles` (slot identity is carried through the planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config
from ..core.state import Vehicles
from .routing import _shift_plane as nbr  # value at the d-neighbor
from . import routing
from . import pallas_engine

# ---------------------------------------------------------------------------
# Plane bit layouts
# ---------------------------------------------------------------------------
# pa (u32): vehicle core
PA_PRESENT = 1  # plain python ints: module may be imported anywhere
PA_KIND_SH = 1          # 2 bits: 0 internal, 1 through, 2 food, 3 waste
PA_HEAD_SH = 3          # 3 bits: heading + 1 (0 = unknown)
PA_BASE_SH = 6          # 4 bits: base cruising speed
PA_CUR_SH = 10          # 4 bits: current speed
PA_PARKED_SH = 14
PA_COL_SH = 15
PA_MAL_SH = 16
PA_STUCKF_SH = 17
PA_DEST_SH = 18         # 14 bits: destination id (16383 = none)
DEST_NONE = 16383

# pb (u32): timers
PB_STUCK_SH = 0         # 12 bits (saturating; thresholds are <= 3600)
PB_STRAND_SH = 12       # 12 bits
PB_CONTRA_SH = 24       # 8 bits

# pc (u32): trip bookkeeping
PC_DEPART_SH = 0        # 20 bits: departure tick
PC_STEPS_SH = 20        # 12 bits: steps traveled (saturating)

# pd (u32): service FSM + contraflow excursion bookkeeping
PD_PHASE_SH = 0         # 2 bits
PD_TIMER_SH = 2         # 8 bits
PD_BLOCK_SH = 10        # 14 bits (16383 = none)
PD_CFKEY_SH = 24        # 2 bits: flow direction at excursion start —
#                         selects the per-direction wavefront byte
PD_CFMODE_SH = 26       # 1 bit: 0 = overtake, 1 = stuck detour
PD_CFSTEPS_SH = 27      # 5 bits: contraflow cells taken this excursion
SVC_BLOCK_NONE = 16383

INF_U16 = 65535         # unreachable in the fixed-point cost field
BIG = 1 << 29
KBIG = 1 << 19          # unreachable cost in the pre-encoded key stack:
#                         reachable cost + any dynamic pen <= 65534 + 2^17
#                         < KBIG, so `best >= KBIG` is exact none-detection
KEY_INF = 0xFFFFFFFF

KIND_INTERNAL, KIND_THROUGH, KIND_FOOD, KIND_WASTE = 0, 1, 2, 3


def _u32(x):
    return x.astype(jnp.uint32)


def _bit(p, sh):
    return ((p >> sh) & 1).astype(bool)


def _fld(p, sh, bits):
    return ((p >> sh) & ((1 << bits) - 1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fixed-point cost fields
# ---------------------------------------------------------------------------

def costs_u16_to_keys(Q_u16: jnp.ndarray) -> jnp.ndarray:
    """u16 move-candidate costs [D, 4, H, W] (65535 = unreachable) ->
    the stored pre-encoded i32 key form (see `field_to_keys`)."""
    q = Q_u16.astype(jnp.int32)
    k = jnp.where(q >= INF_U16, jnp.int32(KBIG), q)
    m = jnp.arange(4, dtype=jnp.int32).reshape(1, 4, 1, 1)
    return (k << 2) | m


def field_to_keys(cfg: Config, F: jnp.ndarray,
                  road_class: jnp.ndarray) -> jnp.ndarray:
    """The stored form of the cost field: PRE-ENCODED i32 candidate KEYS

        K0[d, m, c] = (q << 2) | m,   q = 2*(F[d, m, c+delta_m] + 1
                                             + road_penalty(c+delta_m))
                      (KBIG << 2) | m  when the candidate is unreachable

    i.e. pre-shifted one step along each heading with the STATIC entry
    cost folded in AND the packed-key encoding (cost in bits 2.., move
    direction in bits 0-1, unreachable saturated at KBIG = 2^19) baked
    at world init.  The per-segment sdir build then does ONE add per
    candidate — `key = K0 + (dynamic_pen << 2)` — instead of the former
    4-op compare/select/shift/add chain; the encode is VPU-bound at
    D=640 (~180 ops per packed word measured as the largest tick stage),
    so candidate-op count is the build's cost.  Exactness: reachable
    keys are bit-identical to the in-kernel encoding ((q+pen)<<2 | m);
    unreachable keys become (KBIG+pen)<<2 | m >= KBIG<<2, which
    preserves none-detection (best >= KBIG), ranking below-any-reachable
    (reachable cost <= 65534 + 2^17 < KBIG) and straight-bit exclusion
    (bnd2 < KBIG<<2) exactly.

    Costs are u16 fixed-point (x2; all reference costs are multiples of
    0.5, `astar_numba.py:11-24`), saturating at 65534."""
    enter_stat = 1.0 + routing.road_type_penalty(cfg, road_class)
    rows = []
    for m in range(4):
        fn = routing._shift_plane(F[:, m], m, routing.INF)
        en = routing._shift_plane(enter_stat, m, routing.INF)
        Q = fn + en
        v = jnp.clip(jnp.round(Q * 2.0), 0, 65534).astype(jnp.int32)
        k = jnp.where(Q >= routing.INF, jnp.int32(KBIG), v)
        rows.append((k << 2) | m)
    return jnp.stack(rows, axis=1)


def keys_to_cost_u16(K0: jnp.ndarray) -> jnp.ndarray:
    """Decode the stored key stack back to u16 move-candidate costs
    (65535 = unreachable) — inspection/test helper."""
    q = K0 >> 2
    return jnp.where(q >= KBIG, jnp.uint16(INF_U16),
                     q.astype(jnp.uint16))


def _entry_costs(cfg: Config, allowed, is_road, soft2, hard):
    """Shared per-direction move tables: (legal, pen_m, can_mv).
    pen_m[m]: additive DYNAMIC entry cost of moving in direction m
    (i32, huge when blocked) — the static part lives pre-folded in the
    stored key stack (`field_to_keys`); can_mv[m]: the move lands on
    road and not on a hard cell (the wavefront's permission)."""
    cp2 = jnp.int32(round(2 * cfg.VEHICLE_CONTRAFLOW_PENALTY))
    legal = [(allowed & jnp.uint8(C.DIR_BITS[m])) != 0 for m in range(4)]
    pen_m, can_mv = [], []
    for m in range(4):
        en = nbr(soft2, m, jnp.int32(60000))
        hd = nbr(hard, m, True)
        rd = nbr(is_road, m, False)
        ok = (legal[m] | rd) & ~hd
        can_mv.append(ok)
        pen = en + jnp.where(legal[m], 0, cp2)
        pen_m.append(jnp.where(ok, jnp.minimum(pen, 60000),
                               jnp.int32(1 << 17)).astype(jnp.int32))
    return legal, pen_m, can_mv


def build_sdir(cfg: Config, K0: jnp.ndarray, allowed: jnp.ndarray,
               is_road: jnp.ndarray, soft2: jnp.ndarray,
               hard: jnp.ndarray, force_xla: bool = False,
               pack: bool = True) -> jnp.ndarray:
    """Per-destination next-move planes, PACKED 4 rows per i32 word
    ([ceil(D/4), H, W], see `pack_sdir4` for the byte layout): bits 0-2
    best move direction (7 = no move), bit 3 = best move is contraflow,
    bits 4-7 = heading h may continue straight instead (within
    TURN_PENALTY of best; straight bits only for *legal* moves).

    `K0`: the pre-ENCODED i32 candidate key stack (`field_to_keys`) —
    per candidate the build is ONE add (`K0 + (pen << 2)`), the min over
    keys carries the argmin in the low 2 bits, and unreachable keys sit
    at >= KBIG<<2 by construction.  `soft2`: i32 [H, W] = round(2 *
    dynamic soft costs) (occupied-vehicle + stop penalties) of the cell
    being entered; `hard`: impassable cells (stranded/parked occupants —
    the reference's strict phase-1 hard obstacles,
    `vehicle_base.py:280-291`).

    The overtake merge wavefronts live in a SEPARATE packed i32 [H, W]
    plane (`build_wavefront`)."""
    D = K0.shape[0]
    H, W = allowed.shape
    tp2 = jnp.int32(round(2 * cfg.VEHICLE_TURN_PENALTY)
                    if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0)
    legal, pen_m, _ = _entry_costs(cfg, allowed, is_road, soft2, hard)

    # kernel VMEM budget: one destination block of K0 (4 headings i32)
    # + pen/legal stacks + working planes; beyond ~24 MB per block fall
    # back to the XLA path (1024^2 grids)
    if cfg.USE_PALLAS_ENGINE and _on_tpu() and not force_xla and pack \
            and (4 * H * W * 4 + 8 * H * W * 4) < 24 * 1024 * 1024 \
            and D % 4 == 0:
        pen4 = jnp.stack(pen_m)
        legal4 = jnp.stack([l.astype(jnp.int32) for l in legal])
        return _sdir_op(cfg)(K0, pen4, legal4)

    pshift = [p << 2 for p in pen_m]
    hbit = [jnp.where(legal[h], jnp.int32(1 << (4 + h)), 0)
            for h in range(4)]

    def block(rows):
        """Encode a [DB, 4, H, W] block of candidate key rows
        (vectorized over destinations; a few fat ops instead of D tiny
        loop iterations).  Same packed-key math as the kernel's
        `pallas_engine._sdir_body` — equivalence-tested."""
        keys = [rows[:, m] + pshift[m][None] for m in range(4)]
        bk = jnp.minimum(jnp.minimum(keys[0], keys[1]),
                         jnp.minimum(keys[2], keys[3]))
        best = bk >> 2
        arg = (bk & 3).astype(jnp.uint8)
        none = best >= KBIG
        contra = ~(jnp.where(arg == 0, legal[0][None],
                   jnp.where(arg == 1, legal[1][None],
                   jnp.where(arg == 2, legal[2][None], legal[3][None]))))
        enc = arg | (contra.astype(jnp.uint8) << 3)
        bnd2 = (jnp.minimum(best + tp2, KBIG - 1) << 2) | 3
        for h in range(4):
            ok_h = keys[h] <= bnd2
            enc = enc | jnp.where(ok_h, hbit[h][None],
                                  0).astype(jnp.uint8)
        return jnp.where(none, jnp.uint8(7), enc)

    # block over destinations: vector-wide math, bounded transients
    # (a [DB, 4, H, W] slice copy stays ~8 MB so vmapped world batches
    # don't blow HBM)
    DB = min(D, max(8, 16 * max(1, 65536 // (H * W))))
    if D % DB != 0:
        DB = D  # uneven D: single block
    nblk = D // DB
    fin = pack_sdir4 if pack else (lambda s: s)
    if nblk <= 1:
        return fin(block(K0))

    def body(i, out):
        rows = jax.lax.dynamic_slice_in_dim(K0, i * DB, DB, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            out, block(rows), i * DB, axis=0)

    return fin(jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((D, H, W), jnp.uint8)))


@functools.lru_cache(maxsize=16)
def _sdir_op(cfg: Config):
    """The Pallas sdir build wrapped in a custom_vmap: a vmapped call
    with a SHARED candidate stack (shared-geometry batches,
    parallel/mesh.py) routes to the batched kernel that reads the stack
    from HBM once for the whole batch; everything else falls back to
    mapping the single-world kernel."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(Q_u16, pen4, legal4):
        return pallas_engine.build_sdir_pallas(cfg, Q_u16, pen4, legal4)

    @op.def_vmap
    def _rule(axis_size, in_batched, Q_u16, pen4, legal4):  # noqa: F811
        import os
        qb, pb, lb = in_batched
        if pb and not qb and not lb \
                and not os.environ.get("TSIM_SDIR_PLAIN_VMAP"):
            return pallas_engine.build_sdir_pallas_batched(
                cfg, Q_u16, pen4, legal4), True
        out = jax.vmap(
            functools.partial(pallas_engine.build_sdir_pallas, cfg),
            in_axes=tuple(0 if b else None for b in in_batched))(
            Q_u16, pen4, legal4)
        return out, True

    return op


def build_wavefront(cfg: Config, allowed: jnp.ndarray, is_road: jnp.ndarray,
                    enter2: jnp.ndarray, hard: jnp.ndarray) -> jnp.ndarray:
    """Per-direction overtake merge wavefronts, PACKED as one i32 [H, W]
    plane (byte d = wavefront for a vehicle whose blocked best move is
    direction d) — the array form of the reference's phase-3 contraflow
    splice (`vehicle_base.py:309-366`): direction-d "merge cells" are
    the free road cells one step PAST a hard blocker ALONG d (the
    reference's "first free cell on my path past the blocker" for paths
    flowing through the blocker in direction d); a bounded backward
    wavefront (<= VEHICLE_MAX_CONTRAFLOW_OVERTAKE_STEPS) labels each
    nearby cell with the descent direction toward the nearest such merge
    cell.  Byte layout: bits 0-2 = wavefront move direction (7 = none),
    bit 3 = that move is contraflow.

    Direction-indexing ties each vehicle to merge cells consistent with
    its OWN blocked move (selected by its stored excursion key), so a
    blocker on an unrelated street (e.g. the opposing lane) cannot
    attract the excursion backward — the failure mode of the former
    single shared plane (PARITY known-gap history).  Only vehicles
    holding a contraflow allowance follow it, so opposite-lane
    through-traffic is unaffected.

    One implementation (`pallas_engine.wavefront_core`), two executors:
    a VMEM-resident kernel on TPU (the XLA form materializes ~350 plane
    passes per routing segment), padded shifts elsewhere.  `enter2` is
    unused (the wavefront needs no dynamic costs) and kept for signature
    stability."""
    del enter2
    H, W = allowed.shape
    if cfg.USE_PALLAS_ENGINE and _on_tpu() \
            and pallas_engine.wavefront_vmem_fits(cfg, H, W):
        return pallas_engine.build_wavefront_pallas(cfg, allowed, is_road,
                                                    hard)
    return pallas_engine.wavefront_core(cfg, nbr, allowed, is_road, hard)


ND_NONE = 7        # no static move
WND_NONE = 7       # no wavefront move

# packed word whose every byte decodes to ND_NONE — the no-hit default
# of the 4-rows-per-word select
ND_NONE4 = 0x07070707


def pack_sdir4(sdir: jnp.ndarray) -> jnp.ndarray:
    """Pack 4 consecutive destination rows of the u8 sdir stack into one
    i32 plane (byte k of word g = row 4g+k, little-endian bitcast):
    the destination-row select then costs ONE compare+select per 4 rows
    plus a single per-cell byte extract — 4x fewer VPU ops, which is
    what the select loop is bound by at large D (D=640 measured
    VPU-bound, not HBM-bound, with the stack VMEM-resident).
    Returns i32 [ceil(D/4), H, W]; padding rows decode to ND_NONE."""
    D, H, W = sdir.shape
    D4 = (D + 3) // 4
    if D4 * 4 != D:
        sdir = jnp.concatenate(
            [sdir, jnp.full((D4 * 4 - D, H, W), ND_NONE, jnp.uint8)])
    return jax.lax.bitcast_convert_type(
        sdir.reshape(D4, 4, H, W).transpose(0, 2, 3, 1), jnp.int32)


def select_dest_rows(sdir4: jnp.ndarray, dest: jnp.ndarray) -> jnp.ndarray:
    """nd[y, x] = byte dest[y, x] of the packed stack (see `pack_sdir4`)
    as one masked reduction over the word axis.  Each cell's dest hits
    at most one word, so a masked sum reconstructs it; no-hit cells
    (dest = none or beyond D) decode to ND_NONE.  Returns i32."""
    D4 = sdir4.shape[0]
    ids = jnp.arange(D4, dtype=jnp.int32)[:, None, None]
    hit = (dest >> 2)[None] == ids
    w = jnp.where(hit, sdir4, 0).sum(axis=0)
    w = jnp.where(jnp.any(hit, axis=0), w, jnp.int32(ND_NONE4))
    sh = (dest & 3) * 8
    return (w >> sh) & 0xFF


def select_rows(sdir4: jnp.ndarray, dest: jnp.ndarray,
                use_pallas: bool = True) -> jnp.ndarray:
    """Backend dispatch for the destination-row select: the streaming
    Pallas kernel on TPU (HBM-bandwidth bound), the masked reduction
    elsewhere.  Both return the same i32 nd plane.  `use_pallas=False`
    forces the XLA form (the spatial-sharding path — the SPMD
    partitioner cannot partition a pallas_call)."""
    H, W = dest.shape
    # dest + i32 accumulator + one sdir block + ~8 B/cell of Mosaic
    # temporaries (a 1024^2 compile measures 19.98 MB scoped; the
    # kernel now ships CompilerParams(vmem_limit_bytes=64M), so gate on
    # that rather than the 16 MB default)
    if use_pallas and _on_tpu() and (20 * H * W) < 60 * 1024 * 1024:
        from . import pallas_engine as PE
        return PE.select_rows_pallas(sdir4, dest)
    return select_dest_rows(sdir4, dest)


def resolve_dir(nd: jnp.ndarray, head1: jnp.ndarray, allow=None, wnd=None,
                wkey=None):
    """Per-cell move direction from the sdir byte and heading (+1).
    Returns (dir [H,W] i32 with 7 = none, contra bool).

    `allow` + `wnd` + `wkey`: vehicles holding a contraflow allowance
    follow the overtake merge wavefront for THEIR excursion direction
    (byte `wkey` — the pd CFKEY bits stamped at grant time — of the
    packed `build_wavefront` word) when one exists at their cell — the
    reference's committed splice toward the first free cell on its own
    path past the blocker (`vehicle_base.py:309-366`); everyone else
    descends the static byte."""
    return pallas_engine._resolve(nd, head1, allow, wnd, wkey)


# ---------------------------------------------------------------------------
# SoA <-> planes conversion (lossless; once per scan segment)
# ---------------------------------------------------------------------------

def vehicles_to_planes(cfg: Config, v: Vehicles, H: int, W: int):
    """Pack the vehicle pool onto the lattice.  Returns the 6 planes
    (pa..pe u32, pl f32) and the [V] slot-used mask."""
    HW = H * W
    V = v.active.shape[0]
    pos = jnp.where(v.active, jnp.clip(v.pos, 0, HW - 1), HW)
    dt = float(cfg.TIME_PER_STEP_IN_SECONDS)

    dest = jnp.where(v.dest >= 0, jnp.minimum(v.dest, DEST_NONE - 1),
                     DEST_NONE)
    pa_v = (jnp.uint32(1)
            | (_u32(v.kind) << PA_KIND_SH)
            | (_u32(jnp.clip(v.heading + 1, 0, 7)) << PA_HEAD_SH)
            | (_u32(jnp.clip(v.base_speed, 0, 15)) << PA_BASE_SH)
            | (_u32(jnp.clip(v.current_speed, 0, 15)) << PA_CUR_SH)
            | (_u32(v.parked) << PA_PARKED_SH)
            | (_u32(v.in_collision) << PA_COL_SH)
            | (_u32(v.in_malfunction) << PA_MAL_SH)
            | (_u32(v.is_stuck) << PA_STUCKF_SH)
            | (_u32(dest) << PA_DEST_SH))
    pb_v = (_u32(jnp.clip(v.stuck_ticks, 0, 4095))
            | (_u32(jnp.clip(v.stranded_ticks, 0, 4095)) << PB_STRAND_SH)
            | (_u32(jnp.clip(v.contraflow_ticks, 0, 255)) << PB_CONTRA_SH))
    depart_tick = jnp.clip(jnp.round(v.depart_time / dt), 0,
                           (1 << 20) - 1).astype(jnp.int32)
    pc_v = (_u32(depart_tick)
            | (_u32(jnp.clip(v.steps_traveled, 0, 4095)) << PC_STEPS_SH))
    sb = jnp.where(v.service_block >= 0,
                   jnp.minimum(v.service_block, SVC_BLOCK_NONE - 1),
                   SVC_BLOCK_NONE)
    pd_v = (_u32(v.service_phase)
            | (_u32(jnp.clip(v.service_timer, 0, 255)) << PD_TIMER_SH)
            | (_u32(sb) << PD_BLOCK_SH)
            | (_u32(jnp.clip(v.contraflow_key, 0, 3)) << PD_CFKEY_SH)
            | (_u32(v.detour) << PD_CFMODE_SH)
            | (_u32(jnp.clip(v.contraflow_steps, 0, 31))
               << PD_CFSTEPS_SH))
    pe_v = _u32(jnp.arange(V))

    def scat(vals, dtype):
        z = jnp.zeros((HW + 1,), dtype)
        return z.at[pos].set(jnp.where(v.active, vals,
                                       jnp.zeros((), dtype)))[:HW]

    pa = scat(pa_v, jnp.uint32).reshape(H, W)
    pb = scat(pb_v, jnp.uint32).reshape(H, W)
    pc = scat(pc_v, jnp.uint32).reshape(H, W)
    pd = scat(pd_v, jnp.uint32).reshape(H, W)
    pe = scat(pe_v, jnp.uint32).reshape(H, W)
    pl = scat(v.load, jnp.float32).reshape(H, W)
    return (pa, pb, pc, pd, pe, pl), v.active


def planes_to_vehicles(cfg: Config, planes, V: int):
    """Unpack the lattice back into the SoA pool.  Inactive slots get
    pool defaults (matching `_despawn` semantics)."""
    pa, pb, pc, pd, pe, pl = planes
    H, W = pa.shape
    HW = H * W
    paf = pa.reshape(-1)
    present = (paf & 1) == 1
    dt = float(cfg.TIME_PER_STEP_IN_SECONDS)

    # non-present cells all write the scratch row V (sliced off below)
    slot = jnp.where(present, pe.reshape(-1).astype(jnp.int32), V)
    cell = jnp.arange(HW, dtype=jnp.int32)

    zi = jnp.zeros((V + 1,), jnp.int32)
    ni = jnp.full((V + 1,), -1, jnp.int32)
    zb = jnp.zeros((V + 1,), bool)
    zf = jnp.zeros((V + 1,), jnp.float32)

    def put(vals, z):
        return z.at[jnp.clip(slot, 0, V)].set(vals.astype(z.dtype))[:V]

    dest = _fld(paf, PA_DEST_SH, 14)
    sb = _fld(pd.reshape(-1), PD_BLOCK_SH, 14)
    return Vehicles(
        active=put(present, zb),
        pos=put(cell, ni),
        heading=put(_fld(paf, PA_HEAD_SH, 3) - 1, ni),
        dest=put(jnp.where(dest == DEST_NONE, -1, dest), ni),
        base_speed=put(_fld(paf, PA_BASE_SH, 4), zi),
        current_speed=put(_fld(paf, PA_CUR_SH, 4), zi),
        stuck_ticks=put(_fld(pb.reshape(-1), PB_STUCK_SH, 12), zi),
        is_stuck=put(_bit(paf, PA_STUCKF_SH), zb),
        stranded_ticks=put(_fld(pb.reshape(-1), PB_STRAND_SH, 12), zi),
        parked=put(_bit(paf, PA_PARKED_SH), zb),
        in_collision=put(_bit(paf, PA_COL_SH), zb),
        in_malfunction=put(_bit(paf, PA_MAL_SH), zb),
        contraflow_ticks=put(_fld(pb.reshape(-1), PB_CONTRA_SH, 8), zi),
        contraflow_key=put(_fld(pd.reshape(-1), PD_CFKEY_SH, 2), zi),
        contraflow_steps=put(_fld(pd.reshape(-1), PD_CFSTEPS_SH, 5), zi),
        detour=put(_bit(pd.reshape(-1), PD_CFMODE_SH), zb),
        kind=put(_fld(paf, PA_KIND_SH, 2), jnp.zeros((V + 1,), jnp.uint8)),
        depart_time=put(_fld(pc.reshape(-1), PC_DEPART_SH, 20).astype(
            jnp.float32) * dt, zf),
        steps_traveled=put(_fld(pc.reshape(-1), PC_STEPS_SH, 12), zi),
        service_phase=put(_fld(pd.reshape(-1), PD_PHASE_SH, 2),
                          jnp.zeros((V + 1,), jnp.uint8)),
        load=put(pl.reshape(-1), zf),
        service_timer=put(_fld(pd.reshape(-1), PD_TIMER_SH, 8), zi),
        service_block=put(jnp.where(sb == SVC_BLOCK_NONE, -1, sb), ni),
    )


def planes_to_maps(planes, V: int):
    """Derive veh_map (slot or -1) and stuck_map from the planes."""
    pa, pb, _, _, pe, _ = planes
    present = (pa & 1) == 1
    veh_map = jnp.where(present,
                        jnp.clip(pe.astype(jnp.int32), 0, V - 1), -1)
    stuck_map = jnp.where(present, _fld(pb, PB_STUCK_SH, 12), 0)
    return veh_map, stuck_map


# ---------------------------------------------------------------------------
# Engine state (scan carry) and the fused tick
# ---------------------------------------------------------------------------

from typing import Any  # noqa: E402
from flax import struct  # noqa: E402

from ..lights import fsm  # noqa: E402
from .density import density_map  # noqa: E402
from ..agents.blocks import (step_blocks, food_shortage,  # noqa: E402
                             waste_surplus)
from ..agents.rain import step_rain  # noqa: E402
from ..core.state import Overrides  # noqa: E402


@struct.dataclass
class EngineState:
    """Dynamic state advanced by `step_engine` (the scan carry).  Static
    world structure (grid, light/group/block/dest tables, cost fields)
    rides alongside as the enclosing `World`."""
    pa: jnp.ndarray   # u32 [H, W] vehicle core (see bit layout above)
    pb: jnp.ndarray   # u32 [H, W] timers
    pc: jnp.ndarray   # u32 [H, W] trip bookkeeping
    pd: jnp.ndarray   # u32 [H, W] service FSM
    pe: jnp.ndarray   # u32 [H, W] SoA slot id
    pl: jnp.ndarray   # f32 [H, W] service load
    slot_used: jnp.ndarray   # bool [V] pool slots in use
    stop_map: jnp.ndarray
    rain_map: jnp.ndarray
    density: jnp.ndarray
    ped_map: jnp.ndarray
    lights: Any
    blocks: Any
    rain: Any
    # demand TABLES are read-only inside a chunk and ride in the closed-
    # over World (scan-invariant, not copied through the carry); only the
    # consumption cursor is dynamic state
    dem_cursor: Any
    metrics: Any
    overrides: Any
    peds: Any
    tick: jnp.ndarray
    elapsed: jnp.ndarray
    key: jnp.ndarray
    rl: Any = None


def free_slots(slot_used: jnp.ndarray, n: int) -> jnp.ndarray:
    """First n free pool slot ids ascending, -1 beyond the free count —
    the output of `jnp.nonzero(~slot_used, size=n, fill_value=-1)`, but
    computed with one stable lax.sort instead of nonzero's V-element
    scatter (scalar-priced ~19 cycles/element over the PADDED pool on
    TPU; the sort stays vector)."""
    V = slot_used.shape[0]
    used = slot_used.astype(jnp.int32)
    _, idx = jax.lax.sort((used, jnp.arange(V, dtype=jnp.int32)),
                          num_keys=1, is_stable=True)
    n_free = V - jnp.sum(used)
    take = idx[:n] if n <= V else jnp.concatenate(
        [idx, jnp.full((n - V,), V, jnp.int32)])
    return jnp.where(jnp.arange(n) < n_free, take, -1)


def _sat_add1(field_i32, cap):
    return jnp.minimum(field_i32 + 1, cap)


def _hash32(x: jnp.ndarray) -> jnp.ndarray:
    """Murmur3-style finalizer over u32: a bijective avalanche mixer, so
    counter-based inputs yield well-distributed bits in ~6 VPU ops/cell
    (vs ~40 for a threefry draw)."""
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def tick_randoms(cfg: Config, key, H: int, W: int):
    """The tick's four random planes (malfunction roll, sideswipe roll,
    speed re-roll, conflict priority) from ONE scalar threefry draw +
    counter hashing.  Full threefry plane draws measured as the largest
    part of the tick's fixed floor (NOTES.md); the hash keeps the same
    24-bit uniform resolution as f32 `jax.random.uniform` (both quantize
    to multiples of 2^-24, so sub-2^-24 probabilities behave
    identically)."""
    seeds = jax.random.bits(key, (4,), jnp.uint32)
    iota = (jax.lax.broadcasted_iota(jnp.uint32, (H, W), 0) * jnp.uint32(W)
            + jax.lax.broadcasted_iota(jnp.uint32, (H, W), 1))
    b = [_hash32(iota + seeds[i]) for i in range(4)]
    unit = jnp.float32(1.0 / (1 << 24))
    r_mal = (b[0] >> 8).astype(jnp.float32) * unit
    r_side = (b[1] >> 8).astype(jnp.float32) * unit
    span = cfg.VEHICLE_MAX_SPEED - cfg.VEHICLE_MIN_SPEED + 1
    r_reroll = cfg.VEHICLE_MIN_SPEED + jnp.minimum(
        jnp.int32(span - 1),
        ((b[2] >> 8).astype(jnp.float32) * unit * span).astype(jnp.int32))
    return r_mal, r_side, r_reroll, b[3]


def routing_planes(cfg: Config, world, es: EngineState):
    """Build the per-destination next-move planes (`build_sdir`) plus
    the per-direction overtake wavefronts (`build_wavefront`) from the
    CURRENT dynamic state (density, stops, stranded vehicles).  Returns
    (sdir4 i32 [D/4, H, W], wnd i32 [H, W] packed, density).

    Called once per PATHFINDING_COOLDOWN ticks (`run_chunk`), not per
    tick: the reference replans a vehicle's path at most every
    `PATHFINDING_COOLDOWN`=5 ticks (`vehicle_base.py:147`,
    `config.py:409`), so dynamic-penalty staleness up to R-1 ticks is
    in-spec.  Collision safety never depends on this: movement re-checks
    live occupancy/stops per sub-round (`subround`'s bb byte)."""
    H, W = cfg.HEIGHT, cfg.WIDTH
    grid = world.grid
    pa = es.pa
    present = (pa & 1) == 1
    density = density_map(present, grid.is_road,
                          cfg.VEHICLE_AWARENESS_RANGE)
    col0 = _bit(pa, PA_COL_SH)
    mal0 = _bit(pa, PA_MAL_SH)
    parked = _bit(pa, PA_PARKED_SH)
    stranded_occ = present & (col0 | mal0 | parked)
    occ_moving = present & ~stranded_occ
    if cfg.VEHICLE_DYNAMIC_PENALTIES_ENABLED:
        vp = cfg.VEHICLE_OBSTACLE_PENALTY_VEHICLE * (
            1.0 + cfg.VEHICLE_DYNAMIC_PENALTY_SCALE * density)
    else:
        vp = jnp.full((H, W), cfg.VEHICLE_OBSTACLE_PENALTY_VEHICLE)
    soft = jnp.where(occ_moving, vp, 0.0) + jnp.where(
        es.stop_map, jnp.float32(cfg.VEHICLE_OBSTACLE_PENALTY_STOP), 0.0)
    # static entry costs live pre-folded in the stored field
    # (`field_to_keys`); only the dynamic soft part is built here
    soft2 = jnp.round(2.0 * soft).astype(jnp.int32)
    hard = stranded_occ
    if cfg.PEDESTRIANS_ENABLED:
        hard = hard | (es.ped_map > 0)
    sdir4 = build_sdir(cfg, world.cost_field, grid.allowed_dirs,
                       grid.is_road, soft2, hard)
    wnd = build_wavefront(cfg, grid.allowed_dirs, grid.is_road, soft2,
                          hard)
    return sdir4, wnd, density


def step_engine(cfg: Config, world, es: EngineState,
                sdir: jnp.ndarray = None,
                spawn_slots: jnp.ndarray = None,
                dense: tuple = None) -> EngineState:
    """One simulation tick on the plane representation.  Mirrors the
    reference tick order (`CityModel.step` `city_model.py:1831-1860`) —
    see module docstring for the semantics mapping.

    `sdir`: precomputed routing planes (see `routing_planes`); rebuilt
    from the current state when not supplied."""
    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    HW = H * W
    V = caps.max_vehicles
    dt = float(cfg.TIME_PER_STEP_IN_SECONDS)
    grid = world.grid
    dests = world.dests
    bs = world.blocks_static

    key, k_mal, k_side, k_speed, k_prio, k_rain = jax.random.split(
        es.key, 6)
    tick = es.tick
    elapsed = es.elapsed + dt

    pa, pb, pc, pd, pe, pl = es.pa, es.pb, es.pc, es.pd, es.pe, es.pl
    present = (pa & 1) == 1
    occupancy = present

    # ---- 1. density: refreshed with the routing planes (reference
    # updates it per tick, `city_model.py:1853`, but its only consumer
    # is the replan penalty, which refreshes per PATHFINDING_COOLDOWN
    # anyway — two 42-pass box filters per tick measured ~3% of it)

    # ---- 2. lights (commit first so decide reads the fresh stop map) ----
    stuck_map = jnp.where(present, _fld(pb, PB_STUCK_SH, 12), 0)
    rl_state = es.rl
    rl_request = None
    lights = es.lights
    if cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM in fsm.RL_ALGOS:
        from ..rl.controllers import rl_controller_step
        key, k_rl = jax.random.split(key)
        m0 = es.metrics
        avg_dur = 0.5 * (
            m0.sum_duration_internal / jnp.maximum(m0.completed_internal, 1)
            + m0.sum_duration_through / jnp.maximum(m0.completed_through, 1))
        avg_tpc = 0.5 * (
            m0.sum_duration_internal / jnp.maximum(m0.sum_steps_internal, 1)
            + m0.sum_duration_through / jnp.maximum(m0.sum_steps_through, 1))
        trip_penalty = 0.01 * avg_dur + 1.0 * avg_tpc
        rl_state, lights, want, phase_req = rl_controller_step(
            cfg, rl_state, grid, world.groups_static, lights,
            occupancy, stuck_map, trip_penalty, k_rl)
        rl_request = (want, phase_req)
    red = fsm.group_reductions(grid, occupancy, caps.max_groups,
                               gs=world.groups_static,
                               use_pallas=cfg.USE_PALLAS_ENGINE,
                               dense_m=None if dense is None else dense[0])
    lights = fsm.run_controllers(cfg, grid, world.groups_static, lights,
                                 occupancy, rl_phase_request=rl_request,
                                 reductions=red[:4])
    lights = fsm.execute_phase_change(cfg, world.lights_static,
                                      world.groups_static, lights, red[4])
    lights = fsm.apply_light_overrides(lights, es.overrides.light_force)
    stop_map = fsm.build_stop_map(grid, world.lights_static, lights,
                                  dense_a=None if dense is None
                                  else dense[1])

    # ---- 2b. pedestrians (config #3 extension) ---------------------------
    peds, ped_map = es.peds, es.ped_map
    ped_plane = None
    if cfg.PEDESTRIANS_ENABLED:
        from ..agents.pedestrians import step_pedestrians
        key, k_ped = jax.random.split(key)
        peds, ped_plane, ped_map = step_pedestrians(
            cfg, H, W, peds, grid.cell_type, stop_map, k_ped)

    # ---- 3+4. decide + movement (fused core; Pallas on TPU) ---------------
    # (`step_decide`/`step`/`_execute_movement` `vehicle_base.py:616-753`
    # — see ops/pallas_engine.decide_move_core, the single implementation
    # shared by the XLA path and the VMEM-resident TPU kernel)
    if sdir is None:
        sdir = routing_planes(cfg, world, es)
    sdir4, wnd, density = sdir
    D = 4 * sdir4.shape[0]
    ped_bit = (ped_plane if ped_plane is not None
               else jnp.zeros((H, W), bool))
    randoms = tick_randoms(cfg, k_mal, H, W)
    del k_side, k_speed, k_prio  # folded into the one hashed draw
    planes_in = (pa, pb, pc, pd, pe, pl)
    tile = (pallas_engine.pick_tile(cfg, D)
            if cfg.USE_PALLAS_ENGINE and _on_tpu()
            and not cfg.ROUTING_HIER else None)
    if cfg.ROUTING_HIER:
        # hierarchical select: exact windowed byte in the destination's
        # 3x3 tile window, dense hub/direct row elsewhere (ops/hier.py).
        from . import hier as hier_mod
        out = pallas_engine.decide_move_core(
            cfg, nbr,
            lambda dest: hier_mod.hier_select(
                cfg, sdir4, world.local_sdir4, dest,
                use_pallas=cfg.USE_PALLAS_ENGINE),
            wnd,
            *planes_in, stop_map, es.rain_map, ped_bit,
            grid.intersection, grid.dest_id, *randoms)
    elif _use_pallas(cfg, D):
        out = pallas_engine.decide_move_pallas(
            cfg, sdir4, wnd, planes_in, stop_map, es.rain_map, ped_bit,
            grid.intersection, grid.dest_id, randoms)
    elif tile is not None:
        out = pallas_engine.decide_move_tiled(
            cfg, sdir4, wnd, planes_in, stop_map, es.rain_map, ped_bit,
            grid.intersection, grid.dest_id, randoms,
            th=tile[0], tw=tile[1])
    else:
        out = pallas_engine.decide_move_core(
            cfg, nbr,
            lambda dest: select_rows(sdir4, dest,
                                     use_pallas=cfg.USE_PALLAS_ENGINE),
            wnd,
            *planes_in, stop_map, es.rain_map, ped_bit,
            grid.intersection, grid.dest_id, *randoms)
    pa, pb, pc, pd, pe, pl, flags = out
    # one fused reduction for both event counters (bit-packed: new
    # malfunctions in the low half, new collisions above; counts < 2^16)
    packed = jnp.sum((flags & pallas_engine.FLAG_NEW_MAL)
                     + ((flags & pallas_engine.FLAG_NEW_COL) >> 1) * 65536)
    events = (packed & 0xFFFF, packed >> 16)
    return _post_move(cfg, world, es, (pa, pb, pc, pd, pe, pl),
                      lights, stop_map, density, peds, ped_map,
                      tick, elapsed, key, k_rain, rl_state, events,
                      spawn_slots=spawn_slots)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas(cfg: Config, D: int) -> bool:
    """Whether to run decide+movement as the fused TPU kernel: flag on,
    ambient backend is TPU, and the working set fits VMEM."""
    if not cfg.USE_PALLAS_ENGINE:
        return False
    return _on_tpu() and pallas_engine.vmem_fits(cfg, D)


# Profiling gates for honest stage attribution (tools/profile_stages.py,
# /tmp harnesses): section names added here are compiled OUT of
# _post_move.  Empty in production; never set by library code.
_POST_SKIP = frozenset()


def _post_move(cfg: Config, world, es: EngineState, planes, lights,
               stop_map, density, peds, ped_map, tick, elapsed, key,
               k_rain, rl_state, events,
               spawn_slots: jnp.ndarray = None) -> EngineState:
    """Arrivals, service FSM, despawns, demand spawning, daily counters,
    rain and block resources (reference `CityModel.step` tail +
    `on_target_reached` `vehicle_base.py:755-775` +
    `ServiceVehicleAgent` `vehicle_service.py:41-140`)."""
    caps = cfg.capacities()
    H, W = cfg.HEIGHT, cfg.WIDTH
    HW = H * W
    V = caps.max_vehicles
    dt = float(cfg.TIME_PER_STEP_IN_SECONDS)
    grid = world.grid
    dests = world.dests
    bs = world.blocks_static
    bst = es.blocks
    m = es.metrics
    slot_used = es.slot_used

    pa, pb, pc, pd, pe, pl = planes
    present = (pa & 1) == 1
    kind = _fld(pa, PA_KIND_SH, 2)

    # ---- arrivals in PLANE space, service FSM in destination space --------
    # Arrival masks and metrics are pure plane math fused into one
    # stacked [9, H, W] reduction (vector bandwidth).  Dest-space
    # gathers/scatters remain only where per-destination STATE must be
    # read-modify-written (the service FSM) or slot ids extracted —
    # scalar gather/scatter elements price ~15-19 cycles each and the
    # former 6-plane row stack was most of post_move's cost.
    Dall = dests.pos.shape[0]
    B = bs.valid.shape[0]
    dpos = jnp.clip(dests.pos, 0, HW - 1)
    dest14_p = _fld(pa, PA_DEST_SH, 14)
    at_dest_p = present & (grid.dest_id >= 0) & (dest14_p == grid.dest_id)
    phase_p = _fld(pd, PD_PHASE_SH, 2)
    dur_p = elapsed - _fld(pc, PC_DEPART_SH, 20).astype(jnp.float32) * dt
    steps_p = _fld(pc, PC_STEPS_SH, 12).astype(jnp.float32)
    done_i_p = at_dest_p & (kind == KIND_INTERNAL)
    done_t_p = at_dest_p & (kind == KIND_THROUGH)
    # service exit arrival: phase 2 at a highway-exit cell (kind-1 dests
    # ARE HighwayExit cells; counted as a through completion — service
    # vehicles carry population_type="through", `vehicle_service.py:36`)
    svc_done_p = at_dest_p & (kind >= KIND_FOOD) & (phase_p == 2) & \
        (grid.cell_type == C.HIGHWAY_EXIT)

    if "arrstack" in _POST_SKIP:
        arr = jnp.zeros((9,), jnp.float32) + done_i_p[:1, :1].sum() \
            + dur_p[:1, :1].sum() + steps_p[:1, :1].sum() \
            + svc_done_p[:1, :1].sum()
    else:
        arr = jnp.stack([
            done_i_p.astype(jnp.float32), done_t_p.astype(jnp.float32),
            jnp.where(done_i_p, dur_p, 0.0),
            jnp.where(done_t_p, dur_p, 0.0),
            jnp.where(done_i_p, steps_p, 0.0),
            jnp.where(done_t_p, steps_p, 0.0),
            svc_done_p.astype(jnp.float32),
            jnp.where(svc_done_p, dur_p, 0.0),
            jnp.where(svc_done_p, steps_p, 0.0)]).sum(axis=(1, 2))
    n_svc_done = arr[6].astype(jnp.int32)
    m = m.replace(
        completed_internal=m.completed_internal + arr[0].astype(jnp.int32),
        completed_through=m.completed_through + arr[1].astype(jnp.int32)
        + n_svc_done,
        completed_service=m.completed_service + n_svc_done,
        sum_duration_internal=m.sum_duration_internal + arr[2],
        sum_duration_through=m.sum_duration_through + arr[3] + arr[7],
        sum_steps_internal=m.sum_steps_internal + arr[4].astype(jnp.int32),
        sum_steps_through=m.sum_steps_through
        + (arr[5] + arr[8]).astype(jnp.int32),
        malfunctions_total=m.malfunctions_total + events[0],
        collisions_total=m.collisions_total + events[1])

    # ---- service FSM (dest space: per-destination read-modify-write) ------
    paf = pa.reshape(-1)
    if "destio" in _POST_SKIP:
        zD = jnp.zeros((Dall,), jnp.uint32) + paf[:1].sum() \
            + pd.reshape(-1)[:1].sum() + pe.reshape(-1)[:1].sum()
        pa_d, pd_d, pe_d = zD, zD, zD
        pl_d = jnp.zeros((Dall,), jnp.float32) + pl.reshape(-1)[:1].sum()
    else:
        pa_d = paf[dpos]
        pd_d = pd.reshape(-1)[dpos]
        pe_d = pe.reshape(-1)[dpos]
        pl_d = pl.reshape(-1)[dpos]
    # the plane dest field carries ROUTING ids: identity in dense mode,
    # dests.rid under ROUTING_HIER (ops/hier.py)
    rid_d = jnp.arange(Dall) if dests.rid is None else dests.rid
    is_here = dests.valid & ((pa_d & 1) == 1) & \
        (_fld(pa_d, PA_DEST_SH, 14) == rid_d)
    kind_d = _fld(pa_d, PA_KIND_SH, 2)
    is_svc = is_here & (kind_d >= KIND_FOOD)
    if "service" in _POST_SKIP:
        is_svc = is_svc & False
    phase_d = _fld(pd_d, PD_PHASE_SH, 2)
    sb_raw = _fld(pd_d, PD_BLOCK_SH, 14)
    sb = jnp.clip(jnp.where(sb_raw == SVC_BLOCK_NONE, 0, sb_raw), 0, B - 1)

    # arrive at block -> park + transfer + timer (`_start_service`)
    arrive_blk = is_svc & (phase_d == 0)
    shortage = food_shortage(bs, bst)
    surplus = waste_surplus(bs, bst)
    give = jnp.where(arrive_blk & (kind_d == KIND_FOOD),
                     jnp.minimum(pl_d, jnp.maximum(shortage[sb], 0.0)), 0.0)
    take = jnp.where(arrive_blk & (kind_d == KIND_WASTE),
                     jnp.minimum(cfg.SERVICE_VEHICLE_MAX_LOAD_WASTE - pl_d,
                                 jnp.maximum(surplus[sb], 0.0)), 0.0)
    food = jnp.clip(bst.food.at[sb].add(give), 0.0, bs.food_cap)
    waste = jnp.clip(bst.waste.at[sb].add(-take), 0.0, bs.waste_cap)
    bst = bst.replace(food=food, waste=waste)
    pl_d = pl_d - give + take
    parked_d = _bit(pa_d, PA_PARKED_SH) | arrive_blk
    phase_d = jnp.where(arrive_blk, 1, phase_d)
    timer_d = jnp.where(arrive_blk, cfg.SERVICE_VEHICLE_LOAD_TIME,
                        _fld(pd_d, PD_TIMER_SH, 8))

    # servicing countdown -> finish (`_finish_service`)
    servicing = is_svc & (phase_d == 1) & ~arrive_blk
    timer_d = jnp.where(servicing, timer_d - 1, timer_d)
    finish = servicing & (timer_d <= 0)
    more = jnp.where(kind_d == KIND_FOOD, pl_d > 0,
                     pl_d < cfg.SERVICE_VEHICLE_MAX_LOAD_WASTE)
    # routable-id ceiling: with ROUTING_HIER every assigned rid routes
    # (block tables hold rid VALUES there), so only >= 0 matters; dense
    # mode keeps the field-row cap
    DF = ((1 << 14) if cfg.ROUTING_HIER
          else world.cost_field.shape[0])
    svc_target = jnp.where((bs.service_dest >= 0) & (bs.service_dest < DF),
                           bs.service_dest, bs.dest)
    blk_ok = (svc_target >= 0) & (svc_target < DF)
    best_food = jnp.argmax(jnp.where(blk_ok, shortage, -1.0))
    best_waste = jnp.argmax(jnp.where(blk_ok, surplus, -1.0))
    has_food_blk = jnp.max(jnp.where(blk_ok, shortage, -1.0)) > 0
    has_waste_blk = jnp.max(jnp.where(blk_ok, surplus, -1.0)) > 0
    nxt_blk = jnp.where(kind_d == KIND_FOOD, best_food, best_waste)
    has_blk = jnp.where(kind_d == KIND_FOOD, has_food_blk, has_waste_blk)
    go_again = finish & more & has_blk
    go_exit = finish & ~go_again
    # nearest exit by Manhattan distance from this dest cell (static
    # table, `_finish_service` `vehicle_service.py:122-137`)
    new_dest = jnp.where(go_again, svc_target[nxt_blk],
                         jnp.where(go_exit, world.nearest_exit,
                                   _fld(pa_d, PA_DEST_SH, 14)))
    new_sb = jnp.where(go_again, nxt_blk,
                       jnp.where(sb_raw == SVC_BLOCK_NONE, SVC_BLOCK_NONE,
                                 sb_raw))
    phase_d = jnp.where(go_again, 0, jnp.where(go_exit, 2, phase_d))
    parked_d = parked_d & ~finish

    # updated service state (applied below in ONE combined scatter per
    # plane together with despawns and spawns — each extra scatter/where
    # over the full planes is an unfusable read+write pass, and the
    # former 3 service scatters + 6 despawn wheres + 6 spawn scatters
    # were most of post_move's unattributed cost)
    tpos = jnp.where(is_svc, dpos, HW)
    pa_d_new = (pa_d & ~jnp.uint32((1 << PA_PARKED_SH)
                                   | (DEST_NONE << PA_DEST_SH))) \
        | (_u32(parked_d) << PA_PARKED_SH) \
        | (_u32(jnp.clip(new_dest, 0, DEST_NONE)) << PA_DEST_SH)
    pd_d_new = (_u32(phase_d)
                | (_u32(jnp.clip(timer_d, 0, 255)) << PD_TIMER_SH)
                | (_u32(new_sb) << PD_BLOCK_SH))

    # ---- despawns (slot bookkeeping via the dest gather) ------------------
    despawn = done_i_p | done_t_p | svc_done_p

    stuck_kill = cfg.VEHICLE_STUCK_DESPAWN_ENABLED
    if stuck_kill:
        stuck_v = _fld(pb, PB_STUCK_SH, 12)
        thr = jnp.where(grid.intersection,
                        cfg.VEHICLE_STUCK_DESPAWN_THRESHOLD_INTERSECTION,
                        cfg.VEHICLE_STUCK_DESPAWN_THRESHOLD)
        kill = present & (stuck_v >= thr) & ~despawn
        m = m.replace(
            errored_internal=m.errored_internal + jnp.sum(
                kill & (kind == KIND_INTERNAL)),
            errored_through=m.errored_through + jnp.sum(
                kill & (kind != KIND_INTERNAL)))
        despawn = despawn | kill
        # freeing these slots needs a full-grid scatter; only paid when
        # the (default-off) flag is enabled
        slotk = jnp.where(despawn.reshape(-1), pe.reshape(-1).astype(
            jnp.int32), V)
        slot_used = slot_used.at[slotk].set(False, mode="drop")
        despawn_d = despawn.reshape(-1)[dpos]
    else:
        # arrivals only happen at destination cells: free those slots
        # with a Dall-sized scatter (pe rows already gathered)
        despawn_d = is_here & (
            (kind_d <= KIND_THROUGH)
            | ((kind_d >= KIND_FOOD) & (phase_d == 2) & (dests.kind == 1)))
        slot_f = pe_d.astype(jnp.int32)
        slot_used = slot_used.at[
            jnp.where(despawn_d, jnp.clip(slot_f, 0, V - 1), V)].set(
            False, mode="drop")

    if stuck_kill:
        # kills can happen ANYWHERE on the grid: plane-wide clears
        z32 = jnp.uint32(0)
        pa = jnp.where(despawn, z32, pa)
        pb = jnp.where(despawn, z32, pb)
        pc = jnp.where(despawn, z32, pc)
        pd = jnp.where(despawn, z32, pd)
        pe = jnp.where(despawn, z32, pe)
        pl = jnp.where(despawn, jnp.float32(0), pl)
    paf = pa.reshape(-1)

    # ---- demand spawning (trip table pre-generated; see agents/demand) ----
    skip_spawn = "spawn" in _POST_SKIP
    key, k_spawn = jax.random.split(key)
    del k_spawn  # spawn targets are deterministic given the table
    dem = world.demand          # static tables (scan-invariant)
    cursor = es.dem_cursor
    S = caps.max_spawns_per_tick
    T = dem.depart_tick.shape[0]
    idxs = cursor + jnp.arange(S)
    j = jnp.clip(idxs, 0, T - 1)
    due = (idxs < T) & dem.valid[j] & (dem.depart_tick[j] <= tick + 1)
    due = jnp.cumprod(due.astype(jnp.int32)).astype(bool)  # sorted prefix
    if not cfg.ENABLE_TRAFFIC or skip_spawn:
        due = due & False
    if spawn_slots is None:
        # single-tick path: find S free pool slots now.  run_chunk
        # precomputes a whole segment's slot list instead (one free-slot
        # compaction per PATHFINDING_COOLDOWN ticks, not per tick).
        spawn_slots = free_slots(slot_used, S)
    slots = spawn_slots
    can = due & (slots >= 0)
    org = jnp.clip(dem.origin[j], 0, HW - 1)
    # a cell whose occupant despawned THIS tick is free for spawning
    # (the despawn clear is folded into the combined scatter below)
    occupied = ((paf[org] & 1) == 1) & ~despawn.reshape(-1)[org]
    # two same-tick spawns at one entrance: lowest batch index wins
    # (an [S, S] compare beats a [HW]-sized scatter table at S = 64)
    sidx = jnp.arange(S)
    earlier_same = (org[None, :] == org[:, None]) \
        & (sidx[None, :] < sidx[:, None]) \
        & (can & ~occupied)[None, :]
    place = can & ~occupied & ~jnp.any(earlier_same, axis=1)
    # a due trip fails when its origin is occupied OR the vehicle pool
    # is exhausted (slots < 0) — both surface as errored, never silent
    dropped = (can & ~place) | (due & (slots < 0))
    tkind = dem.kind[j].astype(jnp.int32)

    # service spawn targets: the neediest block right now
    shortage2 = food_shortage(bs, bst)
    surplus2 = waste_surplus(bs, bst)
    sp_food_blk = jnp.argmax(jnp.where(blk_ok, shortage2, -1.0))
    sp_waste_blk = jnp.argmax(jnp.where(blk_ok, surplus2, -1.0))
    sp_blk = jnp.where(tkind == KIND_FOOD, sp_food_blk, sp_waste_blk)
    tdest = jnp.where(tkind <= KIND_THROUGH, dem.dest[j], svc_target[sp_blk])
    tdest = jnp.where(tdest < 0, DEST_NONE,
                      jnp.minimum(tdest, DEST_NONE - 1))

    scell = jnp.where(place, org, HW)
    spawn_pa = (jnp.uint32(1) | (_u32(tkind) << PA_KIND_SH)
                | (_u32(tdest) << PA_DEST_SH))
    spawn_pc = jnp.broadcast_to(
        _u32(jnp.clip((tick + 1), 0, (1 << 20) - 1)), (S,))
    spawn_pd = _u32(jnp.where(tkind >= KIND_FOOD, sp_blk, SVC_BLOCK_NONE)
                    << PD_BLOCK_SH)
    spawn_pl = jnp.where(tkind == KIND_FOOD,
                         jnp.float32(cfg.SERVICE_VEHICLE_MAX_LOAD_FOOD), 0.0)
    zS = jnp.zeros((S,), jnp.uint32)

    # ---- ONE combined scatter per plane: service RMW rows + despawn
    # clears (dest cells) + spawns.  Index sets are disjoint by
    # construction: a spawn requires its cell free of any (surviving OR
    # despawning) occupant, and a despawning/service row whose cell a
    # spawn claims is masked to the drop index; at[].set with duplicate
    # indices would be unordered.
    sp_mask = jnp.zeros((HW + 1,), bool).at[scell].set(
        place, mode="drop")[:HW]
    claimed = sp_mask[dpos]
    if "destio" in _POST_SKIP:
        row = jnp.full((Dall,), HW)
    else:
        row = jnp.where((is_svc | despawn_d) & ~claimed, dpos, HW)
    zrow = jnp.where(despawn_d & ~claimed, dpos, HW)  # zero-only planes
    idx = jnp.concatenate([row, scell])
    idxz = jnp.concatenate([zrow, scell])
    zD = jnp.zeros((Dall,), jnp.uint32)

    def put(plane, ix, vals, reshape_back=True):
        out = plane.reshape(-1).at[ix].set(vals, mode="drop")
        return out.reshape(H, W) if reshape_back else out

    dz = despawn_d
    pa = put(pa, idx, jnp.concatenate([jnp.where(dz, 0, pa_d_new),
                                       spawn_pa]))
    pd = put(pd, idx, jnp.concatenate([jnp.where(dz, 0, pd_d_new),
                                       spawn_pd]))
    pl = put(pl, idx, jnp.concatenate([jnp.where(dz, 0.0, pl_d),
                                       spawn_pl]))
    pb = put(pb, idxz, jnp.concatenate([zD, zS]))
    pc = put(pc, idxz, jnp.concatenate([zD, spawn_pc]))
    pe = put(pe, idxz, jnp.concatenate(
        [zD, _u32(jnp.clip(slots, 0, V - 1))]))
    slot_used = slot_used.at[jnp.where(place, slots, V)].set(
        True, mode="drop")
    cursor = cursor + jnp.sum(due)
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
    tick_finished = (arr[0] + arr[1]).astype(jnp.int32) + n_svc_done
    m = m.replace(
        last_daily_difference=jnp.where(
            rolled, m.daily_finished - m.daily_created,
            m.last_daily_difference),
        daily_diff_sum=jnp.where(
            rolled, m.daily_diff_sum + m.daily_finished - m.daily_created,
            m.daily_diff_sum),
        days_completed=jnp.where(rolled, m.days_completed + 1,
                                 m.days_completed),
        daily_created=jnp.where(rolled, tick_created,
                                m.daily_created + tick_created),
        daily_finished=jnp.where(rolled, tick_finished,
                                 m.daily_finished + tick_finished),
        day=new_day)

    # ---- rain, blocks ------------------------------------------------------
    if "rainblocks" in _POST_SKIP:
        rain, rain_map = es.rain, es.rain_map
    else:
        rain, rain_map = step_rain(cfg, H, W, es.rain, k_rain,
                                   force_spawn=es.overrides.spawn_rain)
        bst = step_blocks(cfg, bs, bst, tick)

    return es.replace(
        pa=pa, pb=pb, pc=pc, pd=pd, pe=pe, pl=pl,
        slot_used=slot_used,
        stop_map=stop_map, rain_map=rain_map, density=density,
        ped_map=ped_map,
        lights=lights, blocks=bst, rain=rain, dem_cursor=cursor,
        metrics=m,
        overrides=Overrides(
            light_force=jnp.full_like(es.overrides.light_force, -1),
            spawn_rain=jnp.bool_(False)),
        peds=peds,
        tick=tick + 1, elapsed=elapsed, key=key, rl=rl_state)
