"""Fused decide+movement: one backend-agnostic core, two executors.

`decide_move_core` is the single implementation of the vehicle tick's
hot half — fault rolls, speed, contraflow ladder, the K CA movement
sub-rounds with conflict resolution, and the post-move stuck/cruise
bookkeeping (reference `step_decide`/`step`/`_execute_movement`
`vehicle_base.py:616-753`).  It is parameterized over

  * `shift(plane, d, fill)` — value at the d-neighbor, and
  * `select(dest_i32) -> nd u16` — the per-cell sdir row lookup,

so the same math runs two ways:

  * XLA path (`ops/engine.py`): shift = padded `.at[]` shifts, select =
    the masked D-reduction (`select_dest_rows`).
  * Pallas path (`decide_move_pallas`): the ENTIRE section runs as one
    TPU kernel with every plane and the full sdir stack resident in
    VMEM — at 256x256 the tick's working set (~10 MB at D=64) fits
    on-chip, so the ~150 plane ops between HBM round-trips collapse to
    VPU passes.  Shift = `pltpu.roll` + edge fill, select = a static
    loop over VMEM sdir rows.

The random draws are INPUTS (computed with jax.random outside), so both
executors are bit-identical given the same PRNG keys — tested in
tests/test_pallas_engine.py with the interpreter executor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import codes as C
from ..config import Config

# bit layout constants shared with ops.engine (imported there; duplicated
# import here would be circular — engine imports this module)
PA_KIND_SH = 1
PA_HEAD_SH = 3
PA_BASE_SH = 6
PA_CUR_SH = 10
PA_PARKED_SH = 14
PA_COL_SH = 15
PA_MAL_SH = 16
PA_STUCKF_SH = 17
PA_DEST_SH = 18
PB_STUCK_SH = 0
PB_STRAND_SH = 12
PB_CONTRA_SH = 24
PC_DEPART_SH = 0
PC_STEPS_SH = 20
PD_PHASE_SH = 0
PD_TIMER_SH = 2
PD_BLOCK_SH = 10
PD_CFKEY_SH = 24
PD_CFMODE_SH = 26
PD_CFSTEPS_SH = 27
KEY_INF = 0xFFFFFFFF
KIND_INTERNAL, KIND_THROUGH, KIND_FOOD, KIND_WASTE = 0, 1, 2, 3

FLAG_NEW_MAL = 1
FLAG_NEW_COL = 2
FLAG_MOVED = 4

# tick_tail_core stat slots (f32 sums; integer-valued ones are exact in
# f32 — counts stay far below 2^24 per tick)
N_STATS = 16
(ST_DONE_I, ST_DONE_T, ST_DUR_I, ST_DUR_T, ST_STEPS_I, ST_STEPS_T,
 ST_DONE_SVC, ST_DUR_SVC, ST_STEPS_SVC, ST_NEW_MAL, ST_NEW_COL,
 ST_KILL_I, ST_KILL_T) = range(13)


def _u32(x):
    return x.astype(jnp.uint32)


def _bit(p, sh):
    return ((p >> sh) & 1).astype(bool)


def _fld(p, sh, bits):
    return ((p >> sh) & ((1 << bits) - 1)).astype(jnp.int32)


def _wnd_byte(wnd4, key):
    """Per-cell wavefront byte for excursion-key direction `key` (byte
    key of the packed word, engine.build_wavefront).  Dynamic per-cell
    shift amounts lower fine on Mosaic (NOTES.md)."""
    return (wnd4 >> (key * 8)) & 0xFF


def _resolve(nd, head1, allow=None, wnd=None, wkey=None):
    """resolve_dir (see ops.engine.resolve_dir).  Bool selects are
    written as logical ops: Mosaic lacks i8->i1 select/trunc lowerings.
    `wnd`: the PACKED per-direction wavefront word plane; `wkey`: the
    vehicle's stored excursion direction (pd CFKEY bits) selecting its
    byte."""
    ndi = nd.astype(jnp.int32)
    h = jnp.maximum(head1 - 1, 0)
    sok = ((ndi >> (4 + h)) & 1) == 1
    sok = sok & (head1 > 0)
    d = jnp.where(sok, h, ndi & 7)
    contra = ~sok & ((ndi & 8) != 0)
    if allow is not None:
        wi = _wnd_byte(wnd, wkey)
        wdir = wi & 7
        use_w = allow & (wdir < 7)
        d = jnp.where(use_w, wdir, d)
        contra = (use_w & ((wi & 8) != 0)) | (~use_w & contra)
    return d, contra


def decide_move_core(cfg: Config, shift, select, wnd,
                     pa, pb, pc, pd, pe, pl,
                     stop_map, rain_map, ped_block, intersection, dest_id,
                     r_mal, r_side, r_reroll, r_prio,
                     unroll: bool = True):
    """See module docstring.  All mask inputs are bool [H, W]; r_mal /
    r_side are uniform [0,1) f32, r_reroll is randint
    [VEHICLE_MIN_SPEED, VEHICLE_MAX_SPEED], r_prio is u32 random bits.

    `unroll`: emit the K movement sub-rounds as straight-line code (the
    XLA path — thin where-chains fuse best unrolled, NOTES.md) or as a
    `lax.fori_loop` (the Pallas path — a rolled loop keeps Mosaic's
    scoped-vmem live set to ONE sub-round's planes instead of five,
    which is what lets the fused kernel fit VMEM at 256x256).

    Returns (pa, pb, pc, pd, pe, pl, flags u8) — flags bits:
    1 new malfunction, 2 new collision, 4 moved this tick."""
    H, W = pa.shape
    present = (pa & 1) == 1

    # ---- decide (`step_decide` `vehicle_base.py:616-663`) -----------------
    col0 = _bit(pa, PA_COL_SH)
    mal0 = _bit(pa, PA_MAL_SH)
    parked = _bit(pa, PA_PARKED_SH)
    stuckf = _bit(pa, PA_STUCKF_SH)
    head1 = _fld(pa, PA_HEAD_SH, 3)
    cur0 = _fld(pa, PA_CUR_SH, 4)

    # stranded ticking (`_tick_stranded` `vehicle_base.py:552-566`)
    stranded0 = col0 | mal0
    st = _fld(pb, PB_STRAND_SH, 12)
    st = jnp.where(present & stranded0, st - 1, st)
    recovered = present & stranded0 & (st <= 0)
    col = col0 & ~recovered
    mal = mal0 & ~recovered
    st = jnp.where(recovered, 0, st)
    still_stranded = present & (col | mal)

    # malfunction roll (intended semantics of `vehicle_base.py:608-610`)
    if cfg.VEHICLE_MALFUNCTION_ACTIVE:
        roll = r_mal < cfg.VEHICLE_MALFUNCTION_CHANCE
        new_mal = present & ~still_stranded & ~parked & roll
        mal = mal | new_mal
        st = jnp.where(new_mal, cfg.VEHICLE_MALFUNCTION_DURATION, st)
        still_stranded = still_stranded | new_mal
    else:
        new_mal = jnp.zeros((H, W), bool)

    # sideswipe roll (`_check_sideswipe_collision` `vehicle_base.py:567-605`)
    new_col = jnp.zeros((H, W), bool)
    if cfg.VEHICLE_SIDESWIPE_COLLISION_ACTIVE:
        moving_nb = present & (cur0 > 0) & ~stuckf & ~parked & ~col0 & ~mal0
        hk = jnp.maximum(head1 - 1, 0)
        opp1 = ((hk + 2) % 4) + 1
        side_hit = jnp.zeros((H, W), bool)
        for m in range(4):
            nb_mov = shift(moving_nb, m, False)
            nb_head = shift(head1, m, 0)
            rel = (m - hk) % 4
            perp = (rel == 1) | (rel == 3)
            side_hit = side_hit | (nb_mov & (nb_head == opp1) & perp)
        moving = present & (cur0 > 0) & ~stuckf & ~parked & ~still_stranded
        roll = r_side < cfg.VEHICLE_SIDESWIPE_COLLISION_CHANCE
        new_col = moving & (head1 > 0) & side_hit & roll
        col = col | new_col
        st = jnp.where(new_col, cfg.VEHICLE_SIDESWIPE_COLLISION_DURATION, st)
        still_stranded = still_stranded | new_col

    # red light / parked: full stop (`vehicle_base.py:639-643`)
    halted = still_stranded | (present & stop_map) | parked

    # speed (`_compute_speed` `vehicle_base.py:94-107`)
    base = _fld(pa, PA_BASE_SH, 4)
    base = jnp.where(present & (base == 0), r_reroll, base)
    speed = base
    if cfg.RAIN_ENABLED:
        speed = jnp.where(rain_map,
                          jnp.maximum(1, speed - cfg.RAIN_SPEED_REDUCTION),
                          speed)
    speed = jnp.where(halted, 0, speed)
    base = jnp.where(halted, 0, base)

    dest14 = _fld(pa, PA_DEST_SH, 14)
    nd0 = select(dest14)
    dir0, contra0 = _resolve(nd0, head1, None)
    at_dest0 = present & (dest_id >= 0) & (dest14 == dest_id)

    # contraflow ladder (`vehicle_base.py:309-419`)
    ct = jnp.maximum(_fld(pb, PB_CONTRA_SH, 8) - 1, 0)
    CF_CLEAR = ~jnp.uint32(0xFF << PD_CFKEY_SH)
    # overtake merge-back completion (`vehicle_base.py:219-277`): the
    # wavefront byte for MY excursion direction no longer offers a move
    wkey0 = _fld(pd, PD_CFKEY_SH, 2)
    wdir0 = _wnd_byte(wnd.astype(jnp.int32), wkey0) & 7
    merged = present & (ct > 0) & ~_bit(pd, PD_CFMODE_SH) & \
        (wdir0 == 7) & (dir0 < 7) & ~contra0
    ct = jnp.where(merged, 0, ct)
    pd = jnp.where(merged, pd & CF_CLEAR, pd)
    allow_pre = present & ~halted & (ct > 0)
    blocked = present & ~halted & ~at_dest0 & \
        ((dir0 == 7) | (contra0 & ~allow_pre))
    overtake = cfg.VEHICLE_CONTRAFLOW_OVERTAKE_ACTIVE & blocked
    stuck_v = _fld(pb, PB_STUCK_SH, 12)
    thresh = jnp.where(intersection,
                       cfg.VEHICLE_STUCK_CONTRAFLOW_THRESHOLD_INTERSECTION,
                       cfg.VEHICLE_STUCK_CONTRAFLOW_THRESHOLD)
    stuck_detour = cfg.VEHICLE_STUCK_CONTRAFLOW_ENABLED & \
        (stuck_v >= thresh) & present
    newly = present & ~halted & (overtake | stuck_detour) & (ct == 0)
    ct = jnp.where(newly,
                   jnp.where(stuck_detour,
                             cfg.VEHICLE_CONTRAFLOW_STUCK_DETOUR_DURATION,
                             cfg.VEHICLE_CONTRAFLOW_OVERTAKE_DURATION), ct)
    # excursion key = the flow direction the vehicle was traveling when
    # it got blocked (the reference's "my path past MY blocker",
    # `vehicle_base.py:309-366`): heading if known, else the static best
    key_new = jnp.where(head1 > 0, head1 - 1,
                        jnp.where(dir0 < 4, dir0, 0)).astype(jnp.int32)
    pd = jnp.where(newly,
                   (pd & CF_CLEAR)
                   | (_u32(key_new) << PD_CFKEY_SH)
                   | (_u32(stuck_detour) << PD_CFMODE_SH), pd)
    wkey_dec = _fld(pd, PD_CFKEY_SH, 2)   # key the first sub-round sees

    # write decided per-vehicle state back into the planes
    CLEAR_A = ~jnp.uint32((15 << PA_BASE_SH) | (15 << PA_CUR_SH)
                          | (1 << PA_COL_SH) | (1 << PA_MAL_SH))
    pa = (pa & CLEAR_A) \
        | (_u32(base) << PA_BASE_SH) \
        | (_u32(jnp.where(present, speed, cur0)) << PA_CUR_SH) \
        | (_u32(col) << PA_COL_SH) | (_u32(mal) << PA_MAL_SH)
    pb = (_u32(jnp.clip(stuck_v, 0, 4095))
          | (_u32(jnp.clip(st, 0, 4095)) << PB_STRAND_SH)
          | (_u32(jnp.clip(ct, 0, 255)) << PB_CONTRA_SH))

    # ---- move: K CA sub-rounds of masked shifts ----------------------------
    # (`_execute_movement` `vehicle_base.py:733-753` + conflict commit)
    occ0 = present
    # conflict keys live in nonneg i32 so min lowers to minsi (Mosaic has
    # no unsigned vector min); 28 random bits of priority remain
    prio = (r_prio >> 4).astype(jnp.int32) & jnp.int32(0x0FFFFFF8)
    steps_left = jnp.where(present, speed, 0).astype(jnp.int32)
    moved = jnp.zeros((H, W), jnp.int32)   # 0/1; i32 so Mosaic selects it
    halt_latch = halted.astype(jnp.int32)  # i32 carry: Mosaic-clean

    def subround(state):
        pa, pb, pc, pd, pe, pl, steps_left, moved, halt_latch = state
        present_c = (pa & 1) == 1
        dest_c = _fld(pa, PA_DEST_SH, 14)
        nd = select(dest_c)
        h1 = _fld(pa, PA_HEAD_SH, 3)
        at_dest_c = present_c & (dest_id >= 0) & (dest_c == dest_id)
        csteps = _fld(pd, PD_CFSTEPS_SH, 5)
        climit = jnp.where(_bit(pd, PD_CFMODE_SH),
                           cfg.VEHICLE_MAX_CONTRAFLOW_STUCK_DETOUR_STEPS,
                           cfg.VEHICLE_MAX_CONTRAFLOW_OVERTAKE_STEPS)
        allow = (_fld(pb, PB_CONTRA_SH, 8) > 0) & (csteps < climit)
        dir_, contra = _resolve(nd, h1, allow, wnd,
                                _fld(pd, PD_CFKEY_SH, 2))
        can_dir = (dir_ < 7) & (~contra | allow)
        want = present_c & (halt_latch == 0) & (steps_left > 0) & ~at_dest_c

        bb = (stop_map.astype(jnp.int32)
              | (present_c.astype(jnp.int32) << 1)
              | (occ0.astype(jnp.int32) << 2)
              | (ped_block.astype(jnp.int32) << 3))
        blocked_t = jnp.zeros((H, W), bool)
        for m in range(4):
            tb = shift(bb, m, jnp.int32(0xF))
            blocked_t = blocked_t | ((dir_ == m) & (tb != 0))
        can = want & can_dir & ~blocked_t

        # conflict resolution: lowest key wins the target cell
        kinf = jnp.int32(0x7FFFFFFF)
        inkeys = []
        for m in range(4):
            src_key = jnp.where(can & (dir_ == m), prio | jnp.int32(m),
                                kinf)
            inkeys.append(shift(src_key, C.opposite(m), kinf))
        minkey = jnp.minimum(jnp.minimum(inkeys[0], inkeys[1]),
                             jnp.minimum(inkeys[2], inkeys[3]))
        arrive_m = [(inkeys[m] == minkey) & (inkeys[m] != kinf)
                    for m in range(4)]
        won = jnp.zeros((H, W), bool)
        for m in range(4):
            won = won | (can & (dir_ == m) & shift(arrive_m[m], m, False))

        def move_plane(P, zero, fm=None, can=can, dir_=dir_,
                       arrive_m=arrive_m, won=won):
            out = jnp.where(won, zero, P)
            for m in range(4):
                src = jnp.where(can & (dir_ == m),
                                fm(P, m) if fm is not None else P, zero)
                inc = shift(src, C.opposite(m), zero)
                out = jnp.where(arrive_m[m], inc, out)
            return out

        z32 = jnp.uint32(0)
        HEAD_CLR = ~jnp.uint32(7 << PA_HEAD_SH)
        pa = move_plane(pa, z32,
                        lambda P, m: (P & HEAD_CLR)
                        | (jnp.uint32(m + 1) << PA_HEAD_SH))
        pb = move_plane(pb, z32)
        pc = move_plane(pc, z32,
                        lambda P, m: (_u32(jnp.minimum(
                            _fld(P, PC_STEPS_SH, 12) + 1, 4095))
                            << PC_STEPS_SH)
                        | (P & jnp.uint32((1 << PC_STEPS_SH) - 1)))
        # contraflow moves consume the excursion step budget
        CFS_CLR = ~jnp.uint32(31 << PD_CFSTEPS_SH)
        pd = move_plane(pd, z32,
                        lambda P, m, contra=contra: jnp.where(
                            contra,
                            (P & CFS_CLR) | (_u32(jnp.minimum(
                                _fld(P, PD_CFSTEPS_SH, 5) + 1, 31))
                                << PD_CFSTEPS_SH), P))
        pe = move_plane(pe, z32)
        pl = move_plane(pl, jnp.float32(0))
        steps_left = move_plane(steps_left, jnp.int32(0),
                                lambda P, m: P - 1)
        moved = move_plane(moved, jnp.int32(0),
                           lambda P, m: jnp.ones_like(P))
        halt_latch = halt_latch | (want & ~won).astype(jnp.int32)
        return (pa, pb, pc, pd, pe, pl, steps_left, moved, halt_latch)

    state = (pa, pb, pc, pd, pe, pl, steps_left, moved, halt_latch)
    if unroll:
        for _s in range(cfg.VEHICLE_MAX_SPEED):
            state = subround(state)
    else:
        state = jax.lax.fori_loop(0, cfg.VEHICLE_MAX_SPEED,
                                  lambda _i, s: subround(s), state)
    pa, pb, pc, pd, pe, pl, steps_left, moved, halt_latch = state

    moved = moved != 0
    present = (pa & 1) == 1

    # full stop resets the cruising speed (`step_decide`
    # `vehicle_base.py:656-659`): the first move was impossible given
    # start-of-tick state (not merely lost to a conflict)
    bb0 = stop_map | occ0 | ped_block
    dir0r, contra0r = _resolve(nd0, head1, present & (ct > 0), wnd,
                               wkey_dec)
    tgt_blocked0 = jnp.zeros((H, W), bool)
    for m in range(4):
        tgt_blocked0 = tgt_blocked0 | ((dir0r == m)
                                       & shift(bb0, m, True))
    allow0 = present & (_fld(pb, PB_CONTRA_SH, 8) > 0)
    fb0 = at_dest0 | (dir0r == 7) | (contra0r & ~allow0) | tgt_blocked0
    base_reset = present & ~moved & fb0
    pa = jnp.where(base_reset, pa & ~jnp.uint32(15 << PA_BASE_SH), pa)

    # stuck bookkeeping (`tick_stuck` `vehicle_base.py:687-693`)
    at_stop_f = present & stop_map
    stuck_v = _fld(pb, PB_STUCK_SH, 12)
    stuck_inc = present & ~moved & ~at_stop_f
    stuck_v = jnp.where(present & moved, 0,
                        jnp.where(stuck_inc,
                                  jnp.minimum(stuck_v + 1, 4095), stuck_v))
    stuckf = _bit(pa, PA_STUCKF_SH)
    stuckf = ~(present & moved) & \
        ((stuck_v > cfg.VEHICLE_STUCK_RECOMPUTE_THRESHOLD) | stuckf)
    pa = (pa & ~jnp.uint32(1 << PA_STUCKF_SH)) | (_u32(stuckf)
                                                  << PA_STUCKF_SH)
    pb = (pb & ~jnp.uint32(4095)) | _u32(jnp.clip(stuck_v, 0, 4095))

    flags = (new_mal.astype(jnp.int32) * FLAG_NEW_MAL
             | new_col.astype(jnp.int32) * FLAG_NEW_COL
             | moved.astype(jnp.int32) * FLAG_MOVED)
    return pa, pb, pc, pd, pe, pl, flags


# ---------------------------------------------------------------------------
# Fused per-direction overtake wavefront build
# ---------------------------------------------------------------------------


def wavefront_core(cfg: Config, shift, allowed, is_road, hard):
    """engine.build_wavefront's math with a pluggable shift — shared by
    the XLA path (padded shifts) and the VMEM-resident kernel (rolls).
    `allowed` i32 bitmask, `is_road`/`hard` bool.  Returns the packed
    i32 word plane (byte d = wavefront for blocked direction d)."""
    K_OVT = cfg.VEHICLE_MAX_CONTRAFLOW_OVERTAKE_STEPS
    BIGW = jnp.int32(127)
    legal = [(allowed & C.DIR_BITS[m]) != 0 for m in range(4)]
    # packed i32 legality word: bit m = legal[m].  The per-cell probe
    # below replaces a bool select_n chain (i8->i1 trunci — Mosaic
    # rejects sub-32-bit select/trunc; NOTES.md lowering constraints)
    legal_w = (legal[0].astype(jnp.int32)
               | (legal[1].astype(jnp.int32) << 1)
               | (legal[2].astype(jnp.int32) << 2)
               | (legal[3].astype(jnp.int32) << 3))
    can_mv = []
    for m in range(4):
        hd = shift(hard, m, True)
        rd = shift(is_road, m, False)
        can_mv.append((legal[m] | rd) & ~hd)
    road_free = is_road & ~hard

    def relax(Wv):
        for _ in range(K_OVT):
            nv = Wv
            for m in range(4):
                c = jnp.where(can_mv[m], shift(Wv, m, BIGW), BIGW) + 1
                nv = jnp.minimum(nv, c)
            Wv = jnp.minimum(nv, BIGW)
        return Wv

    out = None
    for d in range(4):
        src = shift(hard & legal[d], C.opposite(d), False) & road_free
        Wv = relax(jnp.where(src, 0, BIGW))
        wbest = jnp.full_like(Wv, BIGW)
        warg = jnp.full_like(Wv, 7)
        for m in range(4):
            c = jnp.where(can_mv[m], shift(Wv, m, BIGW), BIGW)
            upd = c < wbest
            wbest = jnp.where(upd, c, wbest)
            warg = jnp.where(upd, jnp.int32(m), warg)
        wvalid = (Wv <= K_OVT) & (wbest < Wv)
        # contraflow flag: the chosen move direction is NOT legal flow
        # here (dynamic vector shift; bits >= 4 of legal_w are zero, so
        # warg == 7 probes 0 -> "contra", masked off by ~wvalid anyway)
        wcontra_i = 1 - ((legal_w >> warg) & 1)
        byte = jnp.where(wvalid, warg | (wcontra_i << 3), jnp.int32(7))
        out = byte if out is None else out | (byte << (8 * d))
    return out


def _wavefront_kernel(cfg, allowed_ref, road_ref, hard_ref, out_ref):
    out_ref[:] = wavefront_core(cfg, _shift_roll, allowed_ref[:],
                                road_ref[:] != 0, hard_ref[:] != 0)


def build_wavefront_pallas(cfg: Config, allowed, is_road, hard,
                           interpret: bool = False):
    """One VMEM-resident kernel for the whole per-direction wavefront
    build: the XLA form is ~350 materialized plane passes per routing
    segment (4 direction stacks x K relax iterations x 4 shifted
    candidates); in-kernel they are VPU rolls over a ~3 MB working set.
    Bit-identical to `wavefront_core` under padded shifts (tested in
    interpret mode)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = allowed.shape
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_wavefront_kernel, cfg),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[spec] * 3, out_specs=spec, interpret=interpret, **kw,
    )(allowed.astype(jnp.int32), is_road.astype(jnp.int32),
      hard.astype(jnp.int32))


def wavefront_vmem_fits(cfg: Config, H: int, W: int) -> bool:
    """Whole-grid wavefront kernel viability: ~16 live i32 planes."""
    return 20 * H * W * 4 < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Fused inclusive prefix sums (light-queue reductions run these per tick)
# ---------------------------------------------------------------------------


def _prefix_kernel(occ_ref, outh_ref, outv_ref):
    from jax.experimental.pallas import tpu as pltpu
    x = occ_ref[:]
    H, W = x.shape
    h = x
    s = 1
    while s < W:
        r = pltpu.roll(h, s, 1)
        keep = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) >= s
        h = h + jnp.where(keep, r, 0)
        s *= 2
    outh_ref[:] = h
    v = x
    s = 1
    while s < H:
        r = pltpu.roll(v, s, 0)
        keep = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) >= s
        v = v + jnp.where(keep, r, 0)
        s *= 2
    outv_ref[:] = v


def prefix_planes_pallas(occ: jnp.ndarray, interpret: bool = False):
    """Row- and column-INCLUSIVE prefix sums of an i32 plane in one
    VMEM-resident kernel (the XLA log-shift doubling materializes ~16
    padded plane passes per tick).  Returns (incH, incV), both [H, W]:
    incH[y, j] = sum(occ[y, :j+1]), incV[k, x] = sum(occ[:k+1, x])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = occ.shape
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024)
    return pl.pallas_call(
        _prefix_kernel,
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[spec], out_specs=(spec, spec),
        interpret=interpret, **kw,
    )(occ.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Streaming destination-row select
# ---------------------------------------------------------------------------

ND_NONE4 = 0x07070707   # packed word whose every byte is ND_NONE


def _select_kernel(DB4, nsteps, dest_ref, sdir4_ref, out_ref):
    import jax.experimental.pallas as pl
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.full(out_ref.shape, jnp.int32(ND_NONE4))

    dest = dest_ref[:]
    hi = dest >> 2
    w = out_ref[:]
    for k in range(DB4):
        w = jnp.where(hi == (i * DB4 + k), sdir4_ref[k], w)
    last = i == nsteps - 1

    @pl.when(last)
    def _():
        sh = (dest & 3) * 8
        out_ref[:] = (w >> sh) & 0xFF

    @pl.when(~last)
    def _():
        out_ref[:] = w


def select_rows_pallas(sdir4: jnp.ndarray,
                       dest: jnp.ndarray) -> jnp.ndarray:
    """nd[y, x] = byte dest[y, x] of the PACKED stack (engine.pack_sdir4:
    4 destination rows per i32 word) as a streaming kernel: each grid
    step loads a fat block of words into VMEM and overwrites the
    matching cells of the VMEM-resident accumulator; the final step
    extracts the byte.  One compare+select per FOUR destination rows —
    the select loop is VPU-bound once resident, so the packing is a
    ~4x op-count cut (decisive at D~640, full-routability scale).
    HBM traffic stays one read of the stack.  Semantically identical to
    `ops.engine.select_dest_rows`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D4, H, W = sdir4.shape
    # DB4 words per step, <= ~4 MB of VMEM for the block
    DB4 = max(1, min(D4, (4 * 1024 * 1024) // (H * W * 4)))
    while D4 % DB4 != 0:
        DB4 -= 1
    n = D4 // DB4
    return pl.pallas_call(
        functools.partial(_select_kernel, DB4, n),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DB4, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        # dest + block + accumulator + Mosaic temporaries measure
        # ~20 MB scoped at 1024^2 — past the conservative 16 MB default
        # but nowhere near the 128 MB physical VMEM (the hier select at
        # flagship scale runs exactly there)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(dest, sdir4)


# ---------------------------------------------------------------------------
# Tiled fused decide+move (grids too big for the whole-grid kernel)
# ---------------------------------------------------------------------------

# Contamination depth of one tick: each movement sub-round's outcome
# depends on cells <= 2 away (conflict keys are shifted twice), the
# decide phase adds <= 2 (sideswipe + start-of-tick target check):
# 5 rounds x 2 + 2 = 12.  16 leaves margin and keeps lane alignment.
TILE_HALO = 16


def decide_move_tiled(cfg: Config, sdir4, wnd, planes, stop_map, rain_map,
                      ped_block, intersection, dest_id, randoms,
                      th: int, tw: int, interpret: bool = False):
    """Fused decide+movement over window tiles.

    The whole-grid kernel needs ~120 live [H, W] i32 planes of Mosaic
    stack — too big beyond ~128x128.  Here the grid is cut into
    [th, tw] tiles extended by a TILE_HALO ring; each grid step runs
    `decide_move_core` on one window (all rolls stay in VMEM) and writes
    back only the interior.  The halo ring absorbs the window-edge
    contamination, so results are bit-identical to the whole-grid core
    (multi-seed equivalence in tests/test_pallas_engine.py).  Windows
    are materialized by XLA (plain pads + static slices — vector
    copies), trading ~35% extra HBM traffic for not hand-rolling
    overlapping DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pa, pb, pc, pd, pe, pl_ = planes
    H, W = pa.shape
    D4 = sdir4.shape[0]
    P = TILE_HALO
    nty, ntx = H // th, W // tw
    T = nty * ntx
    r_mal, r_side, r_reroll, r_prio = randoms
    i32 = jnp.int32

    def windows(x, fill, dtype=None):
        xp = jnp.pad(x if dtype is None else x.astype(dtype),
                     ((P, P), (P, P)), constant_values=fill)
        ws = [xp[ty * th:ty * th + th + 2 * P,
                 tx * tw:tx * tw + tw + 2 * P]
              for ty in range(nty) for tx in range(ntx)]
        return jnp.stack(ws)

    # pad semantics: outside the grid nothing exists and movement there
    # is blocked (present=0, stop=1, no roads/destinations)
    w_in = (
        jnp.stack([jnp.pad(sdir4, ((0, 0), (P, P), (P, P)),
                           constant_values=ND_NONE4)[
            :, ty * th:ty * th + th + 2 * P,
            tx * tw:tx * tw + tw + 2 * P]
            for ty in range(nty) for tx in range(ntx)]),
        windows(wnd, ND_NONE4, None),   # packed wavefront: every byte 7
        windows(pa, 0), windows(pb, 0), windows(pc, 0),
        windows(pd, 0), windows(pe, 0), windows(pl_, 0.0),
        windows(stop_map, 1, i32), windows(rain_map, 0, i32),
        windows(ped_block, 0, i32), windows(intersection, 0, i32),
        windows(dest_id, -1),
        windows(r_mal, 1.0), windows(r_side, 1.0),
        windows(r_reroll, 1), windows(r_prio, 0),
    )

    def kernel(sd_ref, wnd_ref, pa_ref, pb_ref, pc_ref, pd_ref, pe_ref,
               pl_ref, stop_ref, rain_ref, ped_ref, int_ref, dest_ref,
               rm_ref, rs_ref, rr_ref, rp_ref,
               opa, opb, opc, opd, ope, opl, oflags):
        def select(dest):
            hi = dest >> 2
            w = jnp.full(dest.shape, jnp.int32(ND_NONE4))
            for g in range(D4):
                w = jnp.where(hi == g, sd_ref[0, g], w)
            sh = (dest & 3) * 8
            return (w >> sh) & 0xFF

        out = decide_move_core(
            cfg, _shift_roll, select, wnd_ref[0],
            pa_ref[0], pb_ref[0], pc_ref[0], pd_ref[0], pe_ref[0],
            pl_ref[0],
            stop_ref[0] != 0, rain_ref[0] != 0, ped_ref[0] != 0,
            int_ref[0] != 0, dest_ref[0],
            rm_ref[0], rs_ref[0], rr_ref[0], rp_ref[0],
            unroll=False)
        for o, v in zip((opa, opb, opc, opd, ope, opl, oflags), out):
            o[0] = v[P:P + th, P:P + tw]

    spec_w = lambda: pl.BlockSpec((1, th + 2 * P, tw + 2 * P),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    spec_sd = pl.BlockSpec((1, D4, th + 2 * P, tw + 2 * P),
                           lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    outs = tuple(jax.ShapeDtypeStruct((T, th, tw), dt) for dt in
                 (jnp.uint32,) * 5 + (jnp.float32, jnp.int32))
    res = pl.pallas_call(
        kernel, grid=(T,),
        in_specs=[spec_sd] + [spec_w() for _ in range(16)],
        out_specs=tuple(spec_o for _ in range(7)),
        out_shape=outs, interpret=interpret,
    )(*w_in)

    def assemble(t):
        return t.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3).reshape(
            H, W)
    return tuple(assemble(t) for t in res)


def pick_tile(cfg: Config, D: int):
    """Largest [th, tw] tile whose window fits the Mosaic scoped-vmem
    budget, or None.  Measured: the core's scoped stack is ~1060 bytes
    per window cell (a 160x96 window compiles to 16.18 MB), so at
    256x256 no tile with a useful halo ratio fits — the XLA path also
    MEASURES faster there (13.0 vs 14.8 ms per 16-world tick; the
    window materialization + 2x compute redundancy of small tiles eats
    the fusion win).  The tiled kernel stays as groundwork: it becomes
    profitable if the core's live-value count is cut ~4x."""
    H, W = cfg.HEIGHT, cfg.WIDTH
    P = TILE_HALO
    for th, tw in ((128, 128), (128, 64), (64, 64)):
        if H % th or W % tw:
            continue
        win = (th + 2 * P) * (tw + 2 * P)
        need = 1060 * win + D * win
        # require a sane halo ratio too: redundant window compute must
        # stay under ~60%
        if need < 15 * 1024 * 1024 and win < 1.6 * th * tw:
            return th, tw
    return None


# ---------------------------------------------------------------------------
# Streaming sdir (static next-move byte) builder
# ---------------------------------------------------------------------------

def _sdir_body(DB, tp2, qread, pen, legal, owrite):
    """Shared encode body of the sdir kernels: `qread(d, m)` yields the
    PRE-ENCODED candidate key row (i32, `engine.field_to_keys`:
    (cost << 2) | m with unreachable at (KBIG << 2) | m), `owrite(g,
    word)` stores the packed word for destination block g.

    PACKED-KEY form (the build is VPU-bound at large D — candidate-op
    count IS the cost): with the encoding baked into the stored stack,
    each candidate is ONE add (`K0 + (pen << 2)`; the former
    compare/select/shift/add chain moved to world init).  The min over
    keys carries the argmin for free with the same m-ascending tie
    order as a compare tree; the chosen move's legality comes from ONE
    per-cell probe of a packed legal word (dynamic vector shifts lower
    fine on Mosaic); straight-continuation tests compare keys directly
    against (bound << 2 | 3).  Unreachable candidates sit at
    (KBIG + pen) << 2 | m >= KBIG << 2: real candidates stay < KBIG
    (u16 cost + <= 2^17 blocked penalty < 2^19), so ranking,
    none-detection and straight bits match the `ops.engine.build_sdir`
    XLA reference exactly (equivalence-tested)."""
    KBIG = jnp.int32(1 << 19)
    # per-call precomputes, shared across all destination rows
    lp = (legal[0].astype(jnp.int32) | (legal[1].astype(jnp.int32) << 1)
          | (legal[2].astype(jnp.int32) << 2)
          | (legal[3].astype(jnp.int32) << 3))
    hbit = [jnp.where(legal[h], jnp.int32(1 << (4 + h)), 0)
            for h in range(4)]
    # pen << 2 keeps the key's low direction bits clear:
    # K0 + (pen << 2) == ((cost + pen) << 2) | m
    pshift = [pen[m] << 2 for m in range(4)]
    one = jnp.int32(1)
    for g in range(DB // 4):
        word = None
        for k in range(4):
            keys = [qread(4 * g + k, m) + pshift[m] for m in range(4)]
            bk = jnp.minimum(jnp.minimum(keys[0], keys[1]),
                             jnp.minimum(keys[2], keys[3]))
            best = bk >> 2
            mstar = bk & 3
            contra = ((lp >> mstar) & one) ^ one
            enc = mstar | (contra << 3)
            bnd2 = (jnp.minimum(best + tp2, KBIG - 1) << 2) | 3
            for h in range(4):
                enc = enc | jnp.where(keys[h] <= bnd2, hbit[h], 0)
            enc = jnp.where(best >= KBIG, jnp.int32(7), enc)
            word = enc if word is None else word | (enc << (8 * k))
        owrite(g, word)


def _sdir_kernel(DB, tp2, Q_ref, pen_ref, legal_ref, out_ref):
    def ow(g, word):
        out_ref[g] = word

    _sdir_body(DB, tp2,
               lambda d, m: Q_ref[d, m],
               [pen_ref[m] for m in range(4)],
               [legal_ref[m] != 0 for m in range(4)], ow)


def _sdir_kernel_batched(DB, tp2, Q_ref, pen_ref, legal_ref,
                         out_ref):
    # pen_ref [1, 4, H, W] (this grid step's world); out_ref [1, DB/4, ..]
    def ow(g, word):
        out_ref[0, g] = word

    _sdir_body(DB, tp2,
               lambda d, m: Q_ref[d, m],
               [pen_ref[0, m] for m in range(4)],
               [legal_ref[m] != 0 for m in range(4)], ow)


def _sdir_db(D, H, W):
    """Fat destination blocks: the build is per-grid-step DMA/launch
    overhead bound (~7 us/step; 160 steps x 16 worlds measured as the
    whole build cost at 2 MB blocks).  Budget sized for the i32 key
    stack (engine.field_to_keys): ~16 MB of K0 block per step keeps the
    step's DMA well above the launch overhead."""
    DB = max(4, min(D, (16 * 1024 * 1024) // (4 * H * W * 4) // 4 * 4))
    while D % DB != 0:
        DB -= 4
    return DB


def build_sdir_pallas(cfg: Config, K0, pen4, legal4,
                      interpret: bool = False) -> jnp.ndarray:
    """TPU kernel form of `ops.engine.build_sdir`: streams the
    pre-encoded [D, 4, H, W] i32 candidate KEY stack
    (`engine.field_to_keys`) through VMEM in destination blocks and
    encodes next-move bytes entirely on-chip, writing the PACKED
    [D/4, H, W] i32 form directly (pack_sdir4 layout) — HBM traffic is
    one read of K0 plus one write of the packed stack; no separate
    narrowing or packing pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = K0.shape[0]
    H, W = K0.shape[2], K0.shape[3]
    tp2 = int(round(2 * cfg.VEHICLE_TURN_PENALTY)
              if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0)
    DB = _sdir_db(D, H, W)
    kw = {}
    if not interpret:
        # double-buffered 16 MB key blocks exceed the 16 MB scoped
        # default (v5e: 128 MB physical VMEM)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_sdir_kernel, DB, tp2),
        grid=(D // DB,),
        in_specs=[
            pl.BlockSpec((DB, 4, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((DB // 4, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D // 4, H, W), jnp.int32),
        interpret=interpret, **kw,
    )(K0, pen4, legal4)


def build_sdir_pallas_batched(cfg: Config, K0, pen4b, legal4,
                              interpret: bool = False) -> jnp.ndarray:
    """Batched sdir build over a SHARED candidate stack: grid =
    (dest-block, world) with the world axis iterating fastest, so the Q
    block's index is unchanged across consecutive steps and Mosaic's
    pipelining elides the repeated multi-MB DMA — the stack is read from
    HBM once per SEGMENT for the whole batch instead of once per world
    (i32 keys: 10.7 GB -> 670 MB at B=16, D=640, 256x256).  Wired into
    `engine.build_sdir` via a custom_vmap rule, so vmapped
    shared-geometry rollouts (parallel/mesh.run_batch_shared) hit it
    without callers changing.

    `pen4b`: [B, 4, H, W] per-world dynamic entry costs.
    Returns [B, D/4, H, W] i32 (pack_sdir4 layout per world)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = K0.shape[0]
    B = pen4b.shape[0]
    H, W = K0.shape[2], K0.shape[3]
    tp2 = int(round(2 * cfg.VEHICLE_TURN_PENALTY)
              if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0)
    DB = _sdir_db(D, H, W)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_sdir_kernel_batched, DB, tp2),
        grid=(D // DB, B),
        in_specs=[
            pl.BlockSpec((DB, 4, H, W), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, H, W), lambda i, b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H, W), lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DB // 4, H, W),
                               lambda i, b: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D // 4, H, W), jnp.int32),
        interpret=interpret, **kw,
    )(K0, pen4b, legal4)


# ---------------------------------------------------------------------------
# Pallas executor
# ---------------------------------------------------------------------------

def _shift_roll(x, d, fill):
    """Value at the d-neighbor via circular roll + edge fill (Mosaic-
    friendly; same semantics as ops.routing._shift_plane).

    Mosaic's tpu.dynamic_rotate only supports 32-bit lanes, so bool/u8/
    u16 planes are widened to i32 around the roll (a VPU cast, still
    VMEM-resident)."""
    from jax.experimental.pallas import tpu as pltpu
    H, W = x.shape[-2], x.shape[-1]
    orig_dtype = None
    if x.dtype.itemsize < 4:
        orig_dtype = x.dtype
        x = x.astype(jnp.int32)
    # pltpu.roll requires a non-negative shift: -1 == size-1
    if d == C.N_IDX:        # out[y] = x[y+1]
        r = pltpu.roll(x, H - 1, x.ndim - 2)
        edge = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                        x.ndim - 2) == H - 1
    elif d == C.S_IDX:      # out[y] = x[y-1]
        r = pltpu.roll(x, 1, x.ndim - 2)
        edge = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                        x.ndim - 2) == 0
    elif d == C.E_IDX:      # out[x] = x[x+1]
        r = pltpu.roll(x, W - 1, x.ndim - 1)
        edge = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                        x.ndim - 1) == W - 1
    else:                   # W
        r = pltpu.roll(x, 1, x.ndim - 1)
        edge = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                        x.ndim - 1) == 0
    out = jnp.where(edge, jnp.asarray(fill, x.dtype), r)
    if orig_dtype is not None:
        out = out.astype(orig_dtype)
    return out


def _kernel(cfg, D4, sdir4_ref, wnd_ref, pa_ref, pb_ref, pc_ref, pd_ref,
            pe_ref, pl_ref, stop_ref, rain_ref, ped_ref, inter_ref,
            dest_ref, rmal_ref, rside_ref, rrer_ref, rprio_ref,
            opa, opb, opc, opd, ope, opl, oflags):
    def select(dest):
        # packed stack: one compare+select per 4 destination rows, then
        # a per-cell byte extract (see engine.pack_sdir4)
        hi = dest >> 2
        w = jnp.full(dest.shape, jnp.int32(ND_NONE4))
        for g in range(D4):
            w = jnp.where(hi == g, sdir4_ref[g], w)
        sh = (dest & 3) * 8
        return (w >> sh) & 0xFF

    out = decide_move_core(
        cfg, _shift_roll, select, wnd_ref[:],
        pa_ref[:], pb_ref[:], pc_ref[:], pd_ref[:], pe_ref[:], pl_ref[:],
        stop_ref[:] != 0, rain_ref[:] != 0, ped_ref[:] != 0,
        inter_ref[:] != 0, dest_ref[:],
        rmal_ref[:], rside_ref[:], rrer_ref[:], rprio_ref[:],
        unroll=False)
    pa, pb, pc, pd, pe, pl, flags = out
    opa[:] = pa
    opb[:] = pb
    opc[:] = pc
    opd[:] = pd
    ope[:] = pe
    opl[:] = pl
    oflags[:] = flags


def vmem_fits(cfg: Config, D: int) -> bool:
    """Whole-grid kernel viability: sdir + planes + Mosaic's scoped
    stack must fit in physical VMEM (v5e: 128 MB; the conservative
    16 MB scoped default is raised via CompilerParams.vmem_limit_bytes).
    With the movement sub-rounds ROLLED into a fori_loop the scoped
    stack measures 17.3 MB at 256x256 D=64 (~66 live planes — the
    unrolled form was 35.6 MB), and the fused kernel beats the XLA path
    by ~36% under a 16-world vmap (1.67 vs 2.59 ms-of-16, bench notes).
    Budget: sdir (D planes u8) + ~96 i32 planes of stack + io."""
    H, W = cfg.HEIGHT, cfg.WIDTH
    hw = H * W
    need = D * hw * 1 + 96 * hw * 4
    return need < 100 * 1024 * 1024


def decide_move_pallas(cfg: Config, sdir4, wnd, planes, stop_map, rain_map,
                       ped_block, intersection, dest_id, randoms,
                       interpret: bool = False):
    """Run `decide_move_core` as one VMEM-resident TPU kernel.
    `sdir4`: the PACKED stack (engine.pack_sdir4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pa, pb, pc, pd, pe, pl_ = planes
    H, W = pa.shape
    D4 = sdir4.shape[0]
    r_mal, r_side, r_reroll, r_prio = randoms

    i32 = lambda x: x.astype(jnp.int32)   # 32-bit masks: Mosaic-clean
    outs = (
        jax.ShapeDtypeStruct((H, W), jnp.uint32),
        jax.ShapeDtypeStruct((H, W), jnp.uint32),
        jax.ShapeDtypeStruct((H, W), jnp.uint32),
        jax.ShapeDtypeStruct((H, W), jnp.uint32),
        jax.ShapeDtypeStruct((H, W), jnp.uint32),
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((H, W), jnp.int32),
    )
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 17
    kw = {}
    if not interpret:
        # the rolled-movement kernel's scoped stack measures ~17 MB at
        # 256x256; raise the conservative 16 MB default (v5e has 128 MB
        # of physical VMEM — the inputs/outputs + stack stay well under)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, cfg, D4),
        out_shape=outs,
        in_specs=[spec] * n_in,
        out_specs=(spec,) * 7,
        interpret=interpret, **kw,
    )(sdir4, wnd.astype(jnp.int32), pa, pb, pc, pd, pe, pl_,
      i32(stop_map), i32(rain_map), i32(ped_block), i32(intersection),
      dest_id, r_mal, r_side, r_reroll, r_prio)
