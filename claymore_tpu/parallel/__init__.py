"""Multi-device parallelism: spatial decomposition + multi-host init."""

from .multi import HaloComm, MultiChipEngine
from . import distributed

__all__ = ["HaloComm", "MultiChipEngine", "distributed"]
