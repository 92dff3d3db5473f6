"""Grid velocity update.

TPU-native equivalent of the reference's ``update_grid_velocity_query_max``
kernel (reference: Projects/GMPM/mgmpm_kernels.cuh:326-420; MGSP collision
variant Projects/MGSP/mgmpm_kernels.cuh:247-421): momentum -> velocity,
per-axis sticky domain slab, gravity, optional collision objects, and the
global max-|v|^2 reduction (the warp-shuffle + atomic_max tree becomes one
``jnp.max``).

Operates on the oct-packed pool ``f32[O+1, 16, 128]`` (core/octpool.py):
rows (c, cx), lanes (z8, cy, cz) — everything here is elementwise, so the
layout only shows up in how per-cell coordinates are derived from
(oct key, row, lane) iotas.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import SimConfig
from .types import Partition
from .octpool import oct_coord


def _cell_coords(cfg: SimConfig, partition: Partition):
    """Per-(row-group, lane) integer cell coords of every pool cell.

    Returns (cx, cy, cz) broadcastable against the [O+1, 4, 128] per-channel
    view: cx [1, 4, 1]; cy, cz [1, 1, 128]; and block coords bx, by [O+1],
    bz [O+1, 1, 128] (global z-block index resolving the lane's z8).
    """
    o = partition.keys.shape[0]
    bx, by, bzo = oct_coord(
        cfg, jnp.minimum(partition.keys, cfg.num_oct_keys - 1))
    # null row -> coord 0 (masked out by has_mass anyway)
    bx = jnp.concatenate([bx, jnp.zeros((1,), bx.dtype)])
    by = jnp.concatenate([by, jnp.zeros((1,), by.dtype)])
    bzo = jnp.concatenate([bzo, jnp.zeros((1,), bzo.dtype)])
    lane = jnp.arange(128, dtype=jnp.int32)
    z8 = lane >> 4
    cy = (lane >> 2) & 3
    cz = lane & 3
    cx = jnp.arange(4, dtype=jnp.int32)[None, :, None]
    bz = bzo[:, None, None] * 8 + z8[None, None, :]
    return cx, cy[None, None, :], cz[None, None, :], bx, by, bz


def cell_positions(cfg: SimConfig, partition: Partition) -> jnp.ndarray:
    """World-space position of every pool cell: f32[O+1, 3, 4, 128]."""
    cx, cy, cz, bx, by, bz = _cell_coords(cfg, partition)
    bs = cfg.block_size
    x = (bx[:, None, None] * bs + cx).astype(jnp.float32)
    y = (by[:, None, None] * bs + cy).astype(jnp.float32)
    z = (bz * bs + cz).astype(jnp.float32)
    shape = (bx.shape[0], 4, 128)
    return jnp.stack(
        [jnp.broadcast_to(a, shape) for a in (x, y, z)], axis=1
    ) * cfg.dx


def grid_update(
    cfg: SimConfig,
    pool: jnp.ndarray,
    partition: Partition,
    dt: jnp.ndarray,
    colliders: Sequence = (),
    collider_time: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, mom) pool -> (m, v) pool and max |v|^2.

    Returns (pool_v, max_vel_sqr), both in the oct layout.
    """
    o1 = pool.shape[0]
    m = pool[:, 0:4]                                      # [O+1, 4, 128]
    mom = pool[:, 4:16].reshape(o1, 3, 4, 128)
    has_mass = m > 0.0
    minv = jnp.where(has_mass, 1.0 / jnp.where(has_mass, m, 1.0), 0.0)
    v = mom * minv[:, None]

    # sticky slab: zero the axis component for blocks within ``bound_blocks``
    # of a domain face (reference is_in_bound bitmask, mgmpm_kernels.cuh:339)
    _, _, _, bx, by, bz = _cell_coords(cfg, partition)
    g = cfg.grid_size
    b = cfg.bound_blocks

    def near(c):
        return (c < b) | (c >= g - b)

    v = v.at[:, 0].set(jnp.where(near(bx)[:, None, None], 0.0, v[:, 0]))
    v = v.at[:, 1].set(jnp.where(near(by)[:, None, None], 0.0, v[:, 1]))
    v = v.at[:, 2].set(jnp.where(near(bz), 0.0, v[:, 2]))

    gvec = jnp.asarray(cfg.gravity, v.dtype)
    v = v + gvec[None, :, None, None] * dt

    if colliders:
        xc = cell_positions(cfg, partition)               # [O+1, 3, 4, 128]
        t = collider_time if collider_time is not None else jnp.float32(0.0)
        xf = xc.reshape(o1, 3, 512)
        vf = v.reshape(o1, 3, 512)
        for col in colliders:
            vf = col.resolve(xf, vf, t)
        v = vf.reshape(o1, 3, 4, 128)

    v = jnp.where(has_mass[:, None], v, 0.0)

    vel_sqr = jnp.sum(v * v, axis=1)                      # [O+1, 4, 128]
    vel_sqr = jnp.where(jnp.isnan(vel_sqr), jnp.inf, vel_sqr)
    max_vel_sqr = jnp.max(jnp.where(has_mass, vel_sqr, 0.0))

    pool_v = jnp.concatenate([m, v.reshape(o1, 12, 128)], axis=1)
    return pool_v, max_vel_sqr


def compute_dt(
    cfg: SimConfig,
    max_vel_sqr: jnp.ndarray,
    cur_time: jnp.ndarray,
    next_time: jnp.ndarray,
) -> jnp.ndarray:
    """CFL-limited step size (reference compute_dt, utility_funcs.hpp:36-49).

    A non-finite max velocity (NaN mapped to inf by grid_update) poisons dt
    to NaN so ``t`` leaves every on-device frame loop in one more substep and
    the divergence surfaces on host — the TPU-native version of the
    reference's NaN bailout (gmpm_simulator.cuh:355-358), which reads max_vel
    back each substep and exits the sim loop.
    """
    max_vel = jnp.sqrt(max_vel_sqr)
    dt = jnp.asarray(cfg.default_dt, jnp.float32)
    dt = jnp.where(
        max_vel > 0.0, jnp.minimum(dt, cfg.dx * cfg.cfl / jnp.maximum(max_vel, 1e-30)), dt
    )
    dt = jnp.minimum(dt, jnp.maximum(next_time - cur_time, 0.0))
    dt = jnp.where(jnp.isfinite(max_vel), dt, jnp.nan)
    return dt
