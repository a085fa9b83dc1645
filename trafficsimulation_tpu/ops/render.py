"""On-device RGB framebuffer rendering.

Replaces the reference's CanvasGrid / VisPy portrayal path
(`agent_portrayal.py:18-52`, `cell.py:256-344`,
`vispy_visualization.py:26-101`) with a palette-lookup + scatter pass that
emits `[H, W, 3] u8` directly on the TPU — BASELINE config #5's
"on-device RGB framebuffer rendering".

State recolors follow `cell.py:274-299`: stopped lights turn red,
stopped controlled roads salmon, rained cells desaturate
(`general.py:27-57`), pending-phase intersections darkkhaki; vehicles
paint their occupied cell (circle -> cell at lattice resolution) black /
aliceblue (parked) / red (collision) / yellow (malfunction) /
darkolivegreen (service), per `vehicle_base.py:817-865`.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import codes as C


def render_frame(grid, stop_map, rain_map, veh_map, vehicles,
                 pending_mask=None, level: int = 2,
                 dummy_overlay: bool = False) -> jnp.ndarray:
    """Returns u8 [H, W, 3].  `level` follows the reference's
    AGENT_PORTRAYAL_LEVEL (`cell.py:259-344`): 0 = static palette only,
    >=1 adds dynamic recolors and vehicle overlays.

    `dummy_overlay` (cfg.USE_DUMMY_AGENTS): the reference's DummyAgent
    (`dummy.py:9-28`) exists to make vehicle/cell inconsistencies
    VISIBLE — here any cell where the occupancy map and the vehicle pool
    disagree (veh_map points at an inactive/mispositioned slot) is
    painted magenta.  A consistent world shows nothing."""
    H, W = grid.cell_type.shape
    palette = jnp.asarray(C.PALETTE)
    fb = palette[grid.cell_type.astype(jnp.int32)]          # [H, W, 3]
    if level == 0:
        return fb

    # stop recolors
    is_light = grid.cell_type == C.TRAFFIC_LIGHT
    is_ctrl = grid.cell_type == C.CONTROLLED_ROAD
    fb = jnp.where((is_light & stop_map)[..., None],
                   jnp.asarray(C.COLOR_TRAFFIC_LIGHT_STOP), fb)
    fb = jnp.where((is_ctrl & stop_map)[..., None],
                   jnp.asarray(C.COLOR_CONTROLLED_ROAD_STOP), fb)

    # pending-phase intersections (ZONE_COLORS["IntersectionPending"])
    if pending_mask is not None:
        pend_color = jnp.array([189, 183, 107], jnp.uint8)
        fb = jnp.where((grid.intersection & pending_mask)[..., None],
                       pend_color, fb)

    # rain desaturation (`general.py:27-57` toward grey)
    grey = jnp.sum(fb.astype(jnp.float32) *
                   jnp.array([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
    desat = (0.5 * fb.astype(jnp.float32) + 0.5 * grey).astype(jnp.uint8)
    fb = jnp.where(rain_map[..., None], desat, fb)

    # vehicles
    v = vehicles
    occupied = veh_map >= 0
    vi = jnp.clip(veh_map, 0, v.active.shape[0] - 1)
    color = jnp.broadcast_to(jnp.asarray(C.COLOR_VEHICLE),
                             (v.active.shape[0], 3))
    color = jnp.where((v.kind >= 2)[:, None],
                      jnp.asarray(C.COLOR_SERVICE_VEHICLE), color)
    color = jnp.where(v.parked[:, None],
                      jnp.asarray(C.COLOR_VEHICLE_PARKED), color)
    color = jnp.where(v.in_malfunction[:, None],
                      jnp.asarray(C.COLOR_VEHICLE_MALFUNCTION), color)
    color = jnp.where(v.in_collision[:, None],
                      jnp.asarray(C.COLOR_VEHICLE_COLLISION), color)
    fb = jnp.where(occupied[..., None], color[vi], fb)

    if dummy_overlay:
        HW = H * W
        cellpos = jnp.arange(HW, dtype=jnp.int32).reshape(H, W)
        mismatch = occupied & (~v.active[vi] | (v.pos[vi] != cellpos))
        fb = jnp.where(mismatch[..., None],
                       jnp.array([255, 0, 255], jnp.uint8), fb)
    return fb
