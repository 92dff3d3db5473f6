"""Grid velocity update.

TPU-native equivalent of the reference's ``update_grid_velocity_query_max``
kernel (reference: Projects/GMPM/mgmpm_kernels.cuh:326-420; MGSP collision
variant Projects/MGSP/mgmpm_kernels.cuh:247-421): momentum -> velocity,
per-axis sticky domain slab, gravity, optional collision objects, and the
global max-|v|^2 reduction (the warp-shuffle + atomic_max tree becomes one
``jnp.max``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import SimConfig
from .types import Partition
from .partition import unflatten_key


def cell_positions(cfg: SimConfig, partition: Partition) -> jnp.ndarray:
    """World-space position of every pool cell: f32[max_blocks+1, 3, bv]."""
    bs = cfg.block_size
    bcoord = unflatten_key(
        cfg, jnp.minimum(partition.keys, cfg.grid_size ** 3 - 1)
    ).T                                                   # [B, 3]
    bcoord = jnp.concatenate([bcoord, jnp.zeros((1, 3), bcoord.dtype)], axis=0)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(bs)] * 3), indexing="ij"), axis=0
    ).reshape(3, cfg.block_volume)                        # [3, bv]
    cell = bcoord[:, :, None] * bs + offs[None]
    return cell.astype(jnp.float32) * cfg.dx


def grid_update(
    cfg: SimConfig,
    pool: jnp.ndarray,
    partition: Partition,
    dt: jnp.ndarray,
    colliders: Sequence = (),
    collider_time: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, mx, my, mz) pool -> (m, vx, vy, vz) pool and max |v|^2.

    Returns (pool_v, max_vel_sqr).
    """
    m = pool[:, 0]                                        # [B+1, bv]
    mom = pool[:, 1:4]                                    # [B+1, 3, bv]
    has_mass = m > 0.0
    minv = jnp.where(has_mass, 1.0 / jnp.where(has_mass, m, 1.0), 0.0)
    v = mom * minv[:, None, :]

    # sticky slab: zero the axis component for blocks within ``bound_blocks``
    # of a domain face (reference is_in_bound bitmask, mgmpm_kernels.cuh:339)
    bcoord = unflatten_key(
        cfg, jnp.minimum(partition.keys, cfg.grid_size ** 3 - 1)
    ).T                                                   # [B, 3]
    near = (bcoord < cfg.bound_blocks) | (bcoord >= cfg.grid_size - cfg.bound_blocks)
    near = jnp.concatenate([near, jnp.zeros((1, 3), jnp.bool_)], axis=0)  # null row
    v = jnp.where(near[:, :, None], 0.0, v)

    g = jnp.asarray(cfg.gravity, v.dtype)
    v = v + g[None, :, None] * dt

    for col in colliders:
        xc = cell_positions(cfg, partition)               # [B+1, 3, bv]
        v = col.resolve(xc, v, collider_time if collider_time is not None else jnp.float32(0.0))

    v = jnp.where(has_mass[:, None, :], v, 0.0)

    vel_sqr = jnp.sum(v * v, axis=1)                      # [B+1, bv]
    vel_sqr = jnp.where(jnp.isnan(vel_sqr), jnp.inf, vel_sqr)
    max_vel_sqr = jnp.max(jnp.where(has_mass, vel_sqr, 0.0))

    pool_v = jnp.concatenate([m[:, None, :], v], axis=1)
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
