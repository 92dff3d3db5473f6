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
* reference particle bins + buckets (Projects/GMPM/particle_buffer.cuh)  -> flat SoA
  field arrays plus a ``TileMap``: a static-shaped [tiles, tile] particle
  index indirection where every tile is bound to one home block — the
  bucket/bin structure re-expressed as gather indices.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp


class Partition(NamedTuple):
    """Sparse block partition (reference hash_table.cuh:75-135)."""

    table: jnp.ndarray     # i32[grid_size^3 + 1]; maps flat block key -> pool slot
    #                        (null_block for inactive; last entry is the OOB sentinel)
    keys: jnp.ndarray      # i32[max_active_blocks]; flat block key per slot
    #                        (grid_size^3 for unused slots)
    count: jnp.ndarray     # i32[]; number of active blocks
    overflow: jnp.ndarray  # i32[]; blocks that did not fit (diagnostic)


class TileMap(NamedTuple):
    """Static-shaped particle bucket indirection for one model."""

    pidx: jnp.ndarray     # i32[T, tile]; particle index (0 for padding lanes)
    valid: jnp.ndarray    # bool[T, tile]
    block: jnp.ndarray    # i32[T]; home-block pool slot (null_block for unused)
    bcoord: jnp.ndarray   # i32[T, 3]; home-block coordinates
    tvalid: jnp.ndarray   # bool[T]; tile holds at least one particle
    dropped: jnp.ndarray  # i32[]; particles that did not fit (diagnostic)


class ParticleModel(NamedTuple):
    """One material's particle set (SoA; reference ParticleBuffer)."""

    pos: jnp.ndarray              # f32[P, 3]
    fields: Dict[str, jnp.ndarray]
    active: jnp.ndarray           # bool[P]; false for padding / lost particles
    tiles: TileMap


class SimState(NamedTuple):
    """Full double-buffer-free simulation state (functional rollid)."""

    grid: jnp.ndarray             # f32[max_blocks+1, 4, block_volume]; (m, mx, my, mz)
    partition: Partition
    models: Tuple[ParticleModel, ...]
    dt: jnp.ndarray               # f32[]; current step size
    max_vel: jnp.ndarray          # f32[]; |v|_max from the last grid update
    t: jnp.ndarray                # f32[]; simulated time
    step: jnp.ndarray             # i32[]; substep counter
