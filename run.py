"""Launcher: start the simulation + host bridge (reference `run.py:1-5`,
pointing at the real server module — the reference's stale
`Simulation.server` import is a documented bug not replicated)."""

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.sim import TrafficSim
from trafficsimulation_tpu.bridge.server import launch

if __name__ == "__main__":
    sim = TrafficSim(Config())
    launch(sim)
