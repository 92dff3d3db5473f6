"""claymore_tpu — a TPU-native Material Point Method framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
multi-GPU MPM simulator (penn-graphics-research/claymore): sparse-grid
explicit MPM with fused G2P2G transfers, four constitutive models, collision
objects, JSON scenes, and multi-chip spatial domain decomposition over a
``jax.sharding.Mesh`` with ICI halo exchange.
"""

from .config import SimConfig
from .core.engine import MPMEngine
from .core.types import Partition, ParticleModel, SimState, TileMap
from .models.materials import (
    MATERIALS,
    FixedCorotated,
    JFluid,
    Material,
    NACC,
    Sand,
)
from .models.boundary import (
    Box,
    HalfSpace,
    RigidMotion,
    SignedDistanceCollider,
    Sphere,
)

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "MPMEngine",
    "Partition",
    "ParticleModel",
    "SimState",
    "TileMap",
    "MATERIALS",
    "Material",
    "FixedCorotated",
    "JFluid",
    "Sand",
    "NACC",
    "Box",
    "HalfSpace",
    "RigidMotion",
    "SignedDistanceCollider",
    "Sphere",
]


def load_scene(path: str, **kw):
    """Claymore-compatible JSON scene -> (engine, state) bundle."""
    from .io.scene import load_scene as _ls

    return _ls(path, **kw)
