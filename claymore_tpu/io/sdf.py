"""Signed-distance-field ingest and particle seeding.

Replaces the reference's SDF pipeline (reference read_sdf,
Library/MnSystem/IO/ParticleIO.hpp:32-97 + SampleGenerator LoadSDF /
GenerateUniformSamples, Library/MnSystem/IO/PoissonDisk/SampleGenerator.h):
load a ``.sdf`` level set (the SDFGen ASCII format the reference's
Externals/SDFGen produces), sample particles inside the zero level set, and
scale them into the simulation domain box [offset, offset + span].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def read_sdf_file(path: str) -> Tuple[np.ndarray, np.ndarray, float]:
    """Read an SDFGen ``.sdf`` file: 'ni nj nk\\n ox oy oz\\n dx\\n' followed
    by ni*nj*nk values in k-fastest order.  Returns (values [ni,nj,nk],
    origin [3], dx)."""
    with open(path, "r") as f:
        dims = np.array(f.readline().split(), np.int64)
        origin = np.array(f.readline().split(), np.float64)
        dx = float(f.readline())
        vals = np.fromstring(f.read(), sep=" ", dtype=np.float64)  # noqa: NPY201
    ni, nj, nk = dims
    assert vals.size == ni * nj * nk, (vals.size, dims)
    # SDFGen writes i-fastest (x innermost)
    return vals.reshape(nk, nj, ni).transpose(2, 1, 0), origin, dx


def _trilinear(values: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Trilinear sample at fractional grid coords x [n, 3]."""
    dims = np.array(values.shape)
    c0 = np.clip(np.floor(x).astype(np.int64), 0, dims - 2)
    f = x - c0
    out = np.zeros(x.shape[0])
    for i in (0, 1):
        wx = (1 - f[:, 0]) if i == 0 else f[:, 0]
        for j in (0, 1):
            wy = (1 - f[:, 1]) if j == 0 else f[:, 1]
            for k in (0, 1):
                wz = (1 - f[:, 2]) if k == 0 else f[:, 2]
                out += wx * wy * wz * values[c0[:, 0] + i, c0[:, 1] + j, c0[:, 2] + k]
    return out


def sample_sdf(
    values: np.ndarray,
    sdf_dx: float,
    ppc: float,
    domain_dx: float,
    offset,
    span,
    mode: str = "uniform",
    seed: int = 0,
) -> np.ndarray:
    """Seed particles inside the zero level set and map them into the world
    box [offset, offset + span] (reference read_sdf semantics,
    ParticleIO.hpp:32-97: the level-set bounding box is scaled to fit the
    requested span).

    mode 'uniform': regular ppc-density lattice (reference
    GenerateUniformSamples); 'poisson': over-generate ~2x jittered
    candidates, then weighted sample elimination down to the target count —
    blue-noise spacing, matching the reference's read_sdf ->
    GeneratePoissonSamples path (ParticleIO.hpp:32-97, vendored
    cySampleElim); the native C++ hash-grid implementation is used when
    available (claymore_tpu/native/src/runtime.cpp)."""
    offset = np.asarray(offset, np.float64)
    span = np.asarray(span, np.float64)
    dims = np.array(values.shape, np.float64)
    extent = dims * sdf_dx

    # particle spacing in world space for the requested density
    h = domain_dx / ppc ** (1.0 / 3.0)
    # world -> sdf scale: level set box fills the span
    scale = span / extent
    h_sdf = h / np.min(scale.clip(min=1e-12))

    def lattice(spacing, jitter):
        spans = [np.arange(spacing / 2, extent[d], spacing) for d in range(3)]
        if any(len(s) == 0 for s in spans):
            return np.zeros((0, 3), np.float64)
        gx, gy, gz = np.meshgrid(*spans, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        if jitter:
            rng = np.random.default_rng(seed)
            pts = pts + rng.uniform(-0.45, 0.45, pts.shape) * spacing
        return pts

    if mode == "poisson":
        from .sampler import poisson_disk_sample

        over = 2.0  # candidate over-generation factor
        pts = lattice(h_sdf / over ** (1.0 / 3.0), jitter=True)
        sd = _trilinear(values, pts / sdf_dx)
        candidates = pts[sd <= 0.0]
        target = int(round(candidates.shape[0] / over))
        inside = poisson_disk_sample(
            candidates.astype(np.float32), target, seed=seed
        )
    else:
        pts = lattice(h_sdf, jitter=False)
        sd = _trilinear(values, pts / sdf_dx)
        inside = pts[sd <= 0.0]

    world = offset + inside / extent * span
    return world.astype(np.float32)


def read_sdf(
    path: str, ppc: float, domain_dx: float, offset, span, mode: str = "uniform"
) -> np.ndarray:
    """File -> world-space particle cloud (reference read_sdf overloads)."""
    values, _origin, sdf_dx = read_sdf_file(path)
    return sample_sdf(values, sdf_dx, ppc, domain_dx, offset, span, mode)


def write_sdf_file(path: str, values: np.ndarray, origin, dx: float) -> None:
    """Inverse of read_sdf_file (for tests and asset generation)."""
    ni, nj, nk = values.shape
    with open(path, "w") as f:
        f.write(f"{ni} {nj} {nk}\n")
        f.write(f"{origin[0]} {origin[1]} {origin[2]}\n")
        f.write(f"{dx}\n")
        flat = values.transpose(2, 1, 0).reshape(-1)
        np.savetxt(f, flat, fmt="%.8g")
