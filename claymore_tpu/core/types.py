"""Core pytree state types.

The reference's Structural template layer (Library/MnBase/Object/
StructuralDeclaration.h) exists to compute AoSoA addresses at compile time;
in JAX that role is played by array shapes, so the whole layer collapses to
the NamedTuples here:

* reference ``grid_buffer_`` (Projects/GMPM/grid_buffer.cuh:12-14)   -> ``SimState.grid``:
  ``f32[max_blocks+1, 4, block_volume]`` block pool, channels (m, mx, my, mz);
  the extra last slot is the *null block* absorbing traffic for inactive
  blocks (replaces the hash-table miss path).
* reference ``block_partition_`` (Projects/GMPM/hash_table.cuh:71-135) -> ``Partition``:
  a dense flat index table (the reference already backs its "hash table"
  with a dense 64^3 table) plus packed active keys.
* reference particle bins + buckets (Projects/GMPM/particle_buffer.cuh) ->
  *slot-major storage*: particle state lives directly in tile order
  (``S = num_tiles * tile`` slots, each tile bound to one home block), so
  the hot loop reads and writes contiguously and the per-substep re-bucketing
  (reference add_advection scatter) is ONE permutation gather.

Layout rule: per-particle arrays are component-leading ([3, S] positions,
[9, S] deformation gradients) so the particle axis lands in the TPU lane
dimension (see transfer.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp


class Partition(NamedTuple):
    """Sparse block partition (reference hash_table.cuh:75-135)."""

    table: jnp.ndarray     # i32[grid_size^3 + 1]; flat block key -> pool slot
    keys: jnp.ndarray      # i32[max_active_blocks]; flat key per slot
    count: jnp.ndarray     # i32[1]; number of active blocks
    overflow: jnp.ndarray  # i32[1]; blocks that did not fit (diagnostic)


class TileMap(NamedTuple):
    """Per-tile home-block binding for slot-major particle storage."""

    block: jnp.ndarray    # i32[T]; home-block pool slot (null_block if unused)
    bcoord: jnp.ndarray   # i32[3, T]; home-block coordinates
    tvalid: jnp.ndarray   # bool[T]; tile holds at least one particle
    dropped: jnp.ndarray  # i32[1]; particles that did not fit (diagnostic)


class ParticleModel(NamedTuple):
    """One material's particle set in slot-major SoA storage."""

    pos: jnp.ndarray              # f32[3, S]
    fields: Dict[str, jnp.ndarray]  # e.g. F: f32[9, S], J: f32[S]
    active: jnp.ndarray           # bool[S]; slot occupied
    pid: jnp.ndarray              # i32[S]; stable particle id (S = empty)
    tiles: TileMap


class SimState(NamedTuple):
    """Full double-buffer-free simulation state (functional rollid)."""

    grid: jnp.ndarray             # f32[max_blocks+1, 4, block_volume]
    partition: Partition
    models: Tuple[ParticleModel, ...]
    dt: jnp.ndarray               # f32[]
    max_vel: jnp.ndarray          # f32[]
    t: jnp.ndarray                # f32[]
    step: jnp.ndarray             # i32[]
    mig_dropped: jnp.ndarray      # i32[1]; particles lost to migration
    # capacity overflow, cumulative (multi-chip only; diagnostic)
    halo_overflow: jnp.ndarray    # i32[1]; halo blocks beyond halo_capacity
    # that could not be packed/exchanged, cumulative (multi-chip only)
