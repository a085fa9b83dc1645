"""Checkpoint / resume of the full simulation state.

The reference has NO state serialization — no model snapshots, no RL
weight saving (SURVEY §5 "Checkpoint/resume: None").  Here the entire
`World` pytree (lattice, vehicle pool, light FSM state, demand table,
metrics, RL parameters/optimizer state) round-trips through Orbax, so a
run — including mid-training RL controllers — can resume bit-exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except ImportError:                    # pragma: no cover
    HAVE_ORBAX = False

from .config import Config


def save(path: str, world, cfg: Config):
    """Persist world + config under `path` (created if needed)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({k: v for k, v in dataclasses.asdict(cfg).items()
                   if not isinstance(v, (tuple, list, dict))}, f, indent=1)
    if HAVE_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.join(path, "world"), world, force=True)
    else:  # numpy fallback
        flat, treedef = jax.tree_util.tree_flatten(world)
        np.savez(os.path.join(path, "world.npz"),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def restore(path: str, template):
    """Restore a world saved with :func:`save`.  `template` is a World
    with matching shapes (e.g. a freshly initialized one)."""
    path = os.path.abspath(path)
    if HAVE_ORBAX and os.path.isdir(os.path.join(path, "world")):
        ckpt = ocp.PyTreeCheckpointer()
        return ckpt.restore(os.path.join(path, "world"), item=template)
    data = np.load(os.path.join(path, "world.npz"))
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
