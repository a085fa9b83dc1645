"""Test harness: CPU backend with 8 virtual devices so multi-chip sharding
logic is testable without TPU hardware (SURVEY §4 implication (d))."""

import os

# Force the CPU backend (the ambient environment may point JAX at a TPU
# plugin and may have imported jax already via sitecustomize, so the env
# var alone is not enough — set the config knob too).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
# persistent XLA compilation cache: the generation-pipeline compile
# dominates cold suite time (VERDICT r1 weak #3); cache it across runs
# like bench.py does.
from trafficsimulation_tpu.utils import xla_cache_dir
jax.config.update("jax_compilation_cache_dir", xla_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import pytest  # noqa: E402

from trafficsimulation_tpu.config import Config  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (compile-heavy; the full tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test, skipped by default; run with --runslow")


def pytest_collection_modifyitems(config, items):
    """Two test tiers (VERDICT r3 weak #6/#9): the default tier skips
    `slow`-marked compile-heavy tests so a cold 1-core run finishes in
    minutes; `--runslow` (or TSIM_RUNSLOW=1) runs everything."""
    if config.getoption("--runslow") or os.environ.get("TSIM_RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_xdist_auto_num_workers(config):
    """`-n auto` → min(2, cores): each worker duplicates the session
    fixtures' XLA compiles, so 2 is the sweet spot on big machines and
    1 (plain sequential) the only sane choice on small ones."""
    return min(2, os.cpu_count() or 1)


# 64x64 with scaled-down frame: compiles far faster than 100x100 while
# still generating multiple bands/groups/blocks (same shape class as
# __graft_entry__._small_cfg).
SMALL = Config(WIDTH=64, HEIGHT=64, WALL_THICKNESS=6,
               SIDEWALK_RING_WIDTH=2, MAX_FIELD_DESTS=32, MAX_VEHICLES=256,
               INTERNAL_POPULATION_TRAFFIC_PER_DAY=2000,
               PASSING_POPULATION_TRAFFIC_PER_DAY=500)


@pytest.fixture(scope="session")
def small_cfg():
    return SMALL


@pytest.fixture(scope="session")
def gen_fn(small_cfg):
    """Session-cached jitted generator (compiles once)."""
    import functools
    from trafficsimulation_tpu.gen.generate import generate_city
    return jax.jit(functools.partial(generate_city, small_cfg))


@pytest.fixture(scope="session")
def small_city(gen_fn):
    return jax.block_until_ready(gen_fn(jax.random.PRNGKey(0)))


@pytest.fixture(scope="session")
def small_world(small_cfg):
    import functools
    from trafficsimulation_tpu.sim import init_world
    return jax.jit(functools.partial(init_world, small_cfg))(
        jax.random.PRNGKey(0))
