"""trafficsimulation-tpu: a TPU-native urban traffic simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Mesa
reference simulator (kurisu-n/TrafficSimulation).  See README.md for the
architecture and PARITY.md for the component inventory.

Public API::

    from trafficsimulation_tpu import Config, TrafficSim
    sim = TrafficSim(Config(WIDTH=256, HEIGHT=256), seed=0)
    sim.step(1000)
    sim.stats()
"""

from .config import Config, Defaults  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing TrafficSim pulls in jax-heavy modules
    if name == "TrafficSim":
        from .sim import TrafficSim
        return TrafficSim
    raise AttributeError(name)
