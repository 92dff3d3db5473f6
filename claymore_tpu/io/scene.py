"""JSON scene loading — claymore-compatible schema.

Parses the reference's scene format (reference parse_scene,
Projects/GMPM/gmpm.cu:60-166 and Projects/GMPM/scenes/scene.json):

    {
      "simulation": {"gpuid": 0, "default_dt": 1e-4, "fps": 24, "frames": 60},
      "models": [
        {"constitutive": "fixed_corotated" | "jfluid" | "sand" | "nacc",
         "file": "model.sdf",            # or "box" / "sphere" primitives
         "offset": [x,y,z], "span": [x,y,z], "velocity": [x,y,z],
         "rho": ..., "volume": ...,
         ... material parameters (youngs_modulus, poisson_ratio,
             bulk_modulus, gamma, viscosity, beta, xi) ...}
      ]
    }

Extensions beyond the reference (all optional, documented here):
    "grid":      {"domain_bits": 8, "block_bits": 2, "max_active_blocks": N,
                  "gravity": [0,-9.8,0], "cfl": 0.5, "bound_blocks": 2}
    "device":    {"n_devices": 4, "halo_margin": 1}  -> MultiChipEngine
    "colliders": [{"type": "halfspace"|"sphere"|"box"|"sdf", "kind":
                   "sticky"|"slip"|"separate", "friction": f, ...}]
    models[i]["shape"]: {"type": "box"|"sphere", ...} instead of "file"
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from ..config import SimConfig
from ..core.engine import MPMEngine
from ..models import boundary as bnd
from ..models.materials import from_scene as material_from_scene
from . import sdf as sdf_io
from .sampler import sample_sphere, sample_uniform_box_world


class Scene:
    def __init__(self, cfg: SimConfig, engine, state, frames: int,
                 materials, positions):
        self.cfg = cfg
        self.engine = engine
        self.state = state
        self.frames = frames
        self.materials = materials
        self.positions = positions


def _build_collider(spec: Dict[str, Any], cfg: SimConfig):
    kind = spec.get("kind", "sticky")
    friction = spec.get("friction", 0.0)
    motion = bnd.RigidMotion(
        trans=tuple(spec.get("trans", (0.0, 0.0, 0.0))),
        trans_vel=tuple(spec.get("trans_vel", (0.0, 0.0, 0.0))),
        omega=tuple(spec.get("omega", (0.0, 0.0, 0.0))),
        scale=spec.get("scale", 1.0),
        dsdt=spec.get("dsdt", 0.0),
    )
    t = spec["type"]
    if t == "halfspace":
        return bnd.HalfSpace(spec["origin"], spec["normal"], kind, friction, motion)
    if t == "sphere":
        return bnd.Sphere(spec["center"], spec["radius"], kind, friction, motion)
    if t == "box":
        return bnd.Box(spec["lo"], spec["hi"], kind, friction, motion)
    if t == "sdf":
        values, _origin, sdf_dx = sdf_io.read_sdf_file(spec["file"])
        return bnd.SignedDistanceCollider(values, sdf_dx, kind, friction, motion)
    if t == "sdf_file":
        # claymore collider asset format: {prefix}_sdf.bin + 3 gradient files
        # (reference boundary_condition.cuh:297-320)
        return bnd.SignedDistanceCollider.from_claymore_files(
            spec["prefix"], spec["resolution"],
            spec.get("dx", cfg.dx), kind, friction, motion,
            bound_cells=spec.get("bound_cells", 8),
        )
    raise ValueError(f"unknown collider type {t}")


def _model_positions(model: Dict[str, Any], cfg: SimConfig,
                     base_dir: str) -> np.ndarray:
    offset = model.get("offset", (0.0, 0.0, 0.0))
    span = model.get("span", (1.0, 1.0, 1.0))
    if "file" in model:
        path = model["file"]
        if not os.path.isabs(path):
            path = os.path.join(base_dir, path)
        if path.endswith(".sdf"):
            return sdf_io.read_sdf(path, cfg.ppc, cfg.dx, offset, span,
                                   mode=model.get("sampling", "uniform"))
        if path.endswith(".npy"):
            return np.asarray(np.load(path), np.float32)
        if path.endswith(".bin"):
            # reference raw float32 xyz dumps (gmpm.cu:28-36)
            raw = np.fromfile(path, np.float32)
            return raw.reshape(-1, 3)
        raise ValueError(f"unsupported model file {path}")
    shape = model.get("shape", {"type": "box"})
    lo = np.asarray(offset, np.float64)
    hi = lo + np.asarray(span, np.float64)
    if shape.get("type", "box") == "box":
        return sample_uniform_box_world(cfg.dx, lo, hi, cfg.ppc)
    if shape["type"] == "sphere":
        center = (lo + hi) / 2
        radius = float(min(hi - lo) / 2)
        return sample_sphere(cfg.dx, center, radius, cfg.ppc)
    raise ValueError(f"unknown shape {shape}")


def load_scene(path: str, tile_chunk: int = 32) -> Scene:
    """Parse a scene file and build a ready-to-run engine + initial state."""
    with open(path) as f:
        doc = json.load(f)
    base_dir = os.path.dirname(os.path.abspath(path))

    sim = doc.get("simulation", {})
    grid = doc.get("grid", {})
    cfg = SimConfig(
        domain_bits=grid.get("domain_bits", 8),
        block_bits=grid.get("block_bits", 2),
        max_active_blocks=grid.get("max_active_blocks", 8192),
        gravity=tuple(grid.get("gravity", (0.0, -9.8, 0.0))),
        cfl=grid.get("cfl", 0.5),
        bound_blocks=grid.get("bound_blocks", 2),
        default_dt=sim.get("default_dt", 1e-4),
        fps=sim.get("fps", 24),
    )
    frames = sim.get("frames", 60)

    materials, positions, velocities = [], [], []
    for model in doc.get("models", []):
        constitutive = model["constitutive"]
        materials.append(
            material_from_scene(constitutive, cfg.default_volume(), model)
        )
        positions.append(_model_positions(model, cfg, base_dir))
        velocities.append(tuple(model.get("velocity", (0.0, 0.0, 0.0))))

    colliders = [
        _build_collider(c, cfg) for c in doc.get("colliders", [])
    ]

    import jax

    device = doc.get("device", {})
    use_pallas = device.get("use_pallas", jax.default_backend() == "tpu")
    mesh_shape = device.get("mesh_shape")  # e.g. [2, 2] for the 2-D box split
    if device.get("n_devices", 1) > 1 or mesh_shape:
        from ..parallel.multi import MultiChipEngine

        engine = MultiChipEngine(
            cfg, materials,
            n_devices=device.get("n_devices"),
            mesh_shape=mesh_shape,
            halo_margin=device.get("halo_margin"),
            migration_capacity=device.get("migration_capacity", 2048),
            halo_capacity=device.get("halo_capacity"),
            colliders=colliders, tile_chunk=tile_chunk,
            use_pallas=use_pallas,
        )
    else:
        engine = MPMEngine(cfg, materials, colliders=colliders,
                           tile_chunk=tile_chunk, use_pallas=use_pallas)
    state = engine.init_state(positions, velocities)
    return Scene(cfg, engine, state, frames, materials, positions)
