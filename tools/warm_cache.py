#!/usr/bin/env python
"""Pre-compile the test-suite's heavyweight executables into the
persistent XLA compilation cache (/tmp/tsim_jax_cache), so a following
`pytest tests/` run is compile-free.

The suite's wall time is dominated by a handful of big compiles
(generation pipeline, step/chunk at the session fixture config); xdist
workers would otherwise each compile them independently (the persistent
cache only dedupes COMPLETED compiles).  Run this once per source
change:

    python tools/warm_cache.py && python -m pytest tests/ -q
"""

import functools
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from trafficsimulation_tpu.utils import xla_cache_dir
jax.config.update("jax_compilation_cache_dir", xla_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    t0 = time.time()
    from conftest import SMALL
    from trafficsimulation_tpu.gen.generate import generate_city
    from trafficsimulation_tpu.sim import init_world, step_world, run_chunk

    key = jax.random.PRNGKey(0)
    print("compiling generate_city ...", flush=True)
    jax.block_until_ready(jax.jit(functools.partial(
        generate_city, SMALL))(key))
    print(f"  {time.time()-t0:.0f}s", flush=True)
    print("compiling init_world + step_world + run_chunk(8) ...",
          flush=True)
    world = jax.jit(functools.partial(init_world, SMALL))(key)
    jax.block_until_ready(jax.jit(functools.partial(
        step_world, SMALL))(world))
    jax.block_until_ready(jax.jit(functools.partial(
        run_chunk, SMALL, n=8))(world))
    print(f"warm in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
