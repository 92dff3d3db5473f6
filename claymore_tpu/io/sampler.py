"""Geometry sampling: particle seeding.

CPU-side equivalents of the reference's samplers
(reference: Library/MnBase/Geometry/GeometrySampler.h:10-37 uniform box;
Library/MnSystem/IO/PoissonDisk/SampleGenerator.h Poisson-disk via weighted
sample elimination).  Sampling happens once at scene load, so plain numpy is
the right tool; a native C++ fast path lives in claymore_tpu/native.
"""

from __future__ import annotations

import numpy as np


def sample_uniform_box(dx: float, lo_cell, hi_cell) -> np.ndarray:
    """8 particles per cell at +-0.25 dx offsets inside the cell range
    [lo_cell, hi_cell) given in *cell* coordinates
    (reference sample_uniform_box, GeometrySampler.h:10-37)."""
    lo = np.asarray(lo_cell, np.int64)
    hi = np.asarray(hi_cell, np.int64)
    spans = [np.arange(lo[d], hi[d]) for d in range(3)]
    cx, cy, cz = np.meshgrid(*spans, indexing="ij")
    centers = (np.stack([cx, cy, cz], axis=-1).reshape(-1, 3) + 0.5) * dx
    offs = np.array(
        [[sx, sy, sz] for sx in (-0.25, 0.25) for sy in (-0.25, 0.25) for sz in (-0.25, 0.25)],
        np.float32,
    ) * dx
    pts = (centers[:, None, :] + offs[None]).reshape(-1, 3)
    return pts.astype(np.float32)


def sample_uniform_box_world(dx: float, lo, hi, ppc: float = 8.0) -> np.ndarray:
    """Uniformly fill a world-space AABB at ``ppc`` particles per cell."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    per_axis = ppc ** (1.0 / 3.0)
    h = dx / per_axis
    spans = [np.arange(lo[d] + h / 2, hi[d], h) for d in range(3)]
    if any(len(s) == 0 for s in spans):
        return np.zeros((0, 3), np.float32)
    gx, gy, gz = np.meshgrid(*spans, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


def sample_sphere(dx: float, center, radius: float, ppc: float = 8.0) -> np.ndarray:
    """Uniform lattice clipped to a sphere (the reference benchmarks' elastic
    sphere scenes)."""
    center = np.asarray(center, np.float64)
    lo = center - radius
    hi = center + radius
    pts = sample_uniform_box_world(dx, lo, hi, ppc)
    keep = np.sum((pts - center) ** 2, axis=-1) <= radius * radius
    return pts[keep]


def poisson_disk_sample(
    points: np.ndarray, target_count: int, seed: int = 0
) -> np.ndarray:
    """Weighted sample elimination: down-select a candidate cloud to
    blue-noise spacing (reference SampleGenerator / vendored cySampleElim.h).
    Uses the native C++ hash-grid + max-heap implementation when available;
    falls back to jittered stratified thinning."""
    n = points.shape[0]
    if target_count >= n:
        return points
    from .. import native

    kept = native.sample_elimination_native(points, target_count)
    if kept is not None:
        return points[kept]
    rng = np.random.default_rng(seed)
    # stratify by a coarse grid, keep proportional counts per cell
    lo = points.min(axis=0)
    hi = points.max(axis=0) + 1e-9
    cells = max(1, int(round((target_count / 2.0) ** (1.0 / 3.0))))
    idx = np.floor((points - lo) / (hi - lo) * cells).astype(np.int64)
    key = (idx[:, 0] * cells + idx[:, 1]) * cells + idx[:, 2]
    order = np.argsort(key, kind="stable")
    stride = n / target_count
    picks = order[(np.arange(target_count) * stride + rng.uniform(0, stride, target_count)).astype(np.int64) % n]
    return points[picks]
