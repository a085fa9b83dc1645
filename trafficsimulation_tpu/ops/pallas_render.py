"""Pallas TPU kernel for the RGB framebuffer pass.

The renderer is pure per-cell work: palette lookup + state recolors +
vehicle overlay.  As a Pallas kernel it fuses the whole pass in VMEM,
tiled over row blocks — one read of the state planes, one write of the
frame, no intermediate HBM traffic (BASELINE config #5's on-device
rendering path at 1024x1024).

Color selection is branch-free: the palette and override colors are
combined with `jnp.where` chains on the VPU; channels are produced as
three [rows, W] planes (planar output [3, H, W]) to keep the last
dimension lane-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import codes as C


def _kernel(cell_ref, stop_ref, rain_ref, vstate_ref, out_ref):
    cell = cell_ref[:].astype(jnp.int32)
    stop = stop_ref[:] != 0
    rain = rain_ref[:] != 0
    vstate = vstate_ref[:].astype(jnp.int32)   # 0 none, 1.. vehicle classes

    is_light = cell == C.TRAFFIC_LIGHT
    is_ctrl = cell == C.CONTROLLED_ROAD
    import numpy as _np
    palette = _np.asarray(C.PALETTE, _np.float32)

    for ch in range(3):
        # branch-free palette: a select chain over the 18 cell types
        # (pallas TPU has no 1D gather; this is pure VPU work)
        base = jnp.zeros(cell.shape, jnp.float32)
        for code in range(C.NUM_CELL_TYPES):
            base = jnp.where(cell == code,
                             jnp.float32(palette[code, ch]), base)
        base = jnp.where(is_light & stop,
                         jnp.float32(C.COLOR_TRAFFIC_LIGHT_STOP[ch]), base)
        base = jnp.where(is_ctrl & stop,
                         jnp.float32(C.COLOR_CONTROLLED_ROAD_STOP[ch]),
                         base)
        # rain desaturation toward the luma (approximate: mix with grey)
        grey = 0.5 * base + 0.5 * 128.0
        base = jnp.where(rain, grey, base)
        # vehicle overlay by class
        base = jnp.where(vstate == 1, jnp.float32(C.COLOR_VEHICLE[ch]), base)
        base = jnp.where(vstate == 2,
                         jnp.float32(C.COLOR_SERVICE_VEHICLE[ch]), base)
        base = jnp.where(vstate == 3,
                         jnp.float32(C.COLOR_VEHICLE_PARKED[ch]), base)
        base = jnp.where(vstate == 4,
                         jnp.float32(C.COLOR_VEHICLE_MALFUNCTION[ch]), base)
        base = jnp.where(vstate == 5,
                         jnp.float32(C.COLOR_VEHICLE_COLLISION[ch]), base)
        out_ref[ch, :, :] = base.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rows",))
def render_pallas(grid_cell_type, stop_map, rain_map, veh_map, vehicles,
                  rows: int = 8):
    """Planar u8 frame [3, H, W] via one fused Pallas pass."""
    H, W = grid_cell_type.shape
    V = vehicles.active.shape[0]

    # vehicle class plane (scatter outside the kernel; tiny vs the frame)
    cls = jnp.where(vehicles.in_collision, 5,
                    jnp.where(vehicles.in_malfunction, 4,
                              jnp.where(vehicles.parked, 3,
                                        jnp.where(vehicles.kind >= 2, 2,
                                                  1)))).astype(jnp.uint8)
    vpos = jnp.where(vehicles.active,
                     jnp.clip(vehicles.pos, 0, H * W - 1), H * W)
    vstate = jnp.zeros((H * W + 1,), jnp.uint8).at[vpos].max(
        jnp.where(vehicles.active, cls, 0))[:H * W].reshape(H, W)

    grid_dim = H // rows if H % rows == 0 else -(-H // rows)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.uint8),
        grid=(grid_dim,),
        in_specs=[
            pl.BlockSpec((rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, rows, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )(grid_cell_type, stop_map.astype(jnp.uint8),
      rain_map.astype(jnp.uint8), vstate)
