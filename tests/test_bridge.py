"""Host-bridge override semantics (reference
`traffic_light_control.py:254-402`): the opposites endpoint acts on the
group's own axis lights (`opposite_pairs`,
`intersection_light_group.py:243-279`), and forced lights flow through
`Overrides.light_force` into the next tick's stop state."""

import functools
import types

import jax
import numpy as np

from trafficsimulation_tpu.bridge.server import BridgeState
from trafficsimulation_tpu.sim import step_world


def _bridge(world):
    return BridgeState(types.SimpleNamespace(world=world))


def _group_with_axis_lights(world):
    ls = world.lights_static
    valid = np.asarray(ls.valid)
    group = np.asarray(ls.group)
    axis = np.asarray(ls.axis)
    for g in np.unique(group[valid & (group >= 0)]):
        a0 = valid & (group == g) & (axis == 0)
        if a0.any():
            return int(g)
    return None


def test_opposites_acts_on_axis_lights_only(small_cfg, small_world):
    g = _group_with_axis_lights(small_world)
    if g is None:
        import pytest
        pytest.skip("no group with axis-0 lights in fixture world")
    bridge = _bridge(small_world)
    ids0 = bridge.axis_lights(g, 0)
    grp = bridge.group_lights(g)
    assert len(ids0) > 0
    assert set(ids0) <= set(grp)
    ids1 = bridge.axis_lights(g, 1)
    assert not (set(ids0) & set(ids1))

    # force the N-S axis stopped; flush; one tick applies it
    bridge.force_lights(ids0, stop=True)
    bridge.flush_into_world()
    w = bridge.sim.world
    assert (np.asarray(w.overrides.light_force)[ids0] == 1).all()
    w2 = jax.jit(functools.partial(step_world, small_cfg))(w)
    stop = np.asarray(w2.lights.light_stop)
    assert stop[ids0].all(), "axis lights not stopped after override"
    # overrides are one-shot: cleared after application
    assert (np.asarray(w2.overrides.light_force) == -1).all()


def test_force_go_clears_stop(small_cfg, small_world):
    g = _group_with_axis_lights(small_world)
    if g is None:
        import pytest
        pytest.skip("no group with axis-0 lights in fixture world")
    bridge = _bridge(small_world)
    ids = bridge.group_lights(g)
    bridge.force_lights(ids, stop=False)
    bridge.flush_into_world()
    w2 = jax.jit(functools.partial(step_world, small_cfg))(
        bridge.sim.world)
    assert not np.asarray(w2.lights.light_stop)[ids].any()


def test_ui_page_references_only_real_routes():
    """The served control page (reference's Mesa UI cards,
    `mesa_server.py:31-58`) may only call endpoints the bridge actually
    registers."""
    import os
    import re
    from trafficsimulation_tpu.bridge import server as S

    src = open(S.__file__).read()
    patterns = re.findall(r"\(r\"(/[^\"]*)\"", src)
    routes = set(patterns)

    def registered(path):
        return any(re.fullmatch(p, path) for p in patterns)
    html = open(os.path.join(os.path.dirname(S.__file__),
                             "ui.html")).read()
    called = set(re.findall(r"(?:post|fetch)\('(/[a-zA-Z_.]+)", html))
    assert called, "UI page calls no endpoints?"
    missing = {c for c in called if not registered(c)}
    assert not missing, f"UI references unregistered endpoints: {missing}"
    # the operable surface the VERDICT asked for is all present
    for must in ("/", "/frame.png", "/metrics", "/params", "/reset",
                 "/set_all_traffic_lights_stop", "/create_vehicle",
                 "/spawn_rain", "/step"):
        assert registered(must), must
