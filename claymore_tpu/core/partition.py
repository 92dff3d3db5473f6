"""Sparse block partition: activation, compaction, tile building.

TPU-native replacement for the reference's GPU hash-table partition and its
rebuild kernel chain (reference: Projects/GMPM/hash_table.cuh:75-135 for the
table, Projects/GMPM/gmpm_simulator.cuh:429-570 for the per-substep rebuild:
mark_active_*, thrust::exclusive_scan, update_partition, update_buckets,
compute_bin_capacity).  The atomicCAS insert becomes a boolean mask over the
dense block space followed by a static-size ``jnp.nonzero`` compaction; the
bucket scatter (add_advection, particle_buffer.cuh:100-135) becomes one sort
by home-block slot plus prefix sums — fully deterministic, no atomics.

Coordinate convention: positions and block/cell coordinates are
component-leading ([3, ...]) so per-particle arrays keep the particle axis
in the TPU lane dimension (see transfer.py layout rule).

All outputs are static-shaped so the whole rebuild runs inside jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from .types import Partition, TileMap


# --------------------------------------------------------------------------
# coordinate helpers (coords are [3, ...])
# --------------------------------------------------------------------------

def flatten_key(cfg: SimConfig, coord: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] block coords -> flat key; out-of-range -> sentinel (G^3)."""
    g = cfg.grid_size
    valid = jnp.all((coord >= 0) & (coord < g), axis=0)
    flat = (coord[0] * g + coord[1]) * g + coord[2]
    return jnp.where(valid, flat, g * g * g)


def unflatten_key(cfg: SimConfig, key: jnp.ndarray) -> jnp.ndarray:
    """flat key -> [3, ...] block coords."""
    g = cfg.grid_size
    kz = key % g
    ky = (key // g) % g
    kx = jnp.minimum(key // (g * g), g - 1)
    return jnp.stack([kx, ky, kz], axis=0)


def lookup(cfg: SimConfig, table: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] block coords -> pool slot (null_block when inactive/OOB).

    Replaces the reference's ``Partition::query`` (hash_table.cuh:129-134).
    """
    return table[flatten_key(cfg, coord)]


def base_cell(cfg: SimConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Lowest corner cell of the quadratic B-spline stencil:
    round(x/dx) - 1 (reference get_block_id, utility_funcs.hpp:21-23).
    pos: [3, ...] -> [3, ...] int32."""
    return jnp.floor(pos * cfg.dx_inv + 0.5).astype(jnp.int32) - 1


def home_block(cfg: SimConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Home block = block of cell (base - 1); guarantees the 3^3 stencil and
    its one-step advected version stay inside the 2^3 block arena anchored at
    the home block (the reference's arena invariant, mgmpm_kernels.cuh:687)."""
    return (base_cell(cfg, pos) - 1) >> cfg.block_bits


# --------------------------------------------------------------------------
# partition rebuild
# --------------------------------------------------------------------------

def _dilate_01(cfg: SimConfig, mask3: jnp.ndarray) -> jnp.ndarray:
    """OR of shifts by every offset in {0,1}^3 (the scatter stencil extends
    only one block in the + direction; reference register_neighbor_blocks,
    mgmpm_kernels.cuh:118-133)."""
    out = mask3
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                if ox == 0 and oy == 0 and oz == 0:
                    continue
                shifted = jnp.pad(
                    mask3, ((ox, 0), (oy, 0), (oz, 0)), constant_values=False
                )[: mask3.shape[0], : mask3.shape[1], : mask3.shape[2]]
                out = out | shifted
    return out


def rebuild(
    cfg: SimConfig,
    pool: jnp.ndarray,
    partition: Partition,
    model_positions: Tuple[jnp.ndarray, ...],
    model_active: Tuple[jnp.ndarray, ...],
    extra_mask: jnp.ndarray | None = None,
) -> Tuple[Partition, jnp.ndarray]:
    """Recompute the active block set, compact it, and remap the grid pool.

    Active set = blocks holding grid mass (reference mark_active_grid_blocks)
    union {0,1}^3-dilated particle home blocks (reference
    mark_active_particle_blocks + register_neighbor_blocks).
    Returns (new_partition, remapped_pool).
    """
    g = cfg.grid_size
    n3 = g * g * g
    nb = cfg.max_active_blocks
    mask = jnp.zeros((n3,), jnp.bool_)

    # blocks with grid mass survive (momentum ballistic past particles)
    has_mass = jnp.any(pool[:-1, 0, :] != 0.0, axis=-1)
    slot_live = jnp.arange(nb) < partition.count
    mask = mask.at[jnp.minimum(partition.keys, n3 - 1)].max(
        has_mass & slot_live & (partition.keys < n3)
    )

    # particle home blocks
    pmask = jnp.zeros((n3,), jnp.bool_)
    for pos, act in zip(model_positions, model_active):
        key = flatten_key(cfg, home_block(cfg, pos))
        pmask = pmask.at[jnp.minimum(key, n3 - 1)].max(act & (key < n3))
    pmask = _dilate_01(cfg, pmask.reshape(g, g, g)).reshape(-1)
    mask = mask | pmask
    if extra_mask is not None:
        mask = mask | extra_mask.reshape(-1)

    count = jnp.sum(mask, dtype=jnp.int32).reshape(1)
    (keys,) = jnp.nonzero(mask, size=nb, fill_value=n3)
    keys = keys.astype(jnp.int32)
    overflow = jnp.maximum(count - nb, 0)
    count = jnp.minimum(count, nb)

    table = jnp.full((n3 + 1,), cfg.null_block, jnp.int32)
    slots = jnp.arange(nb, dtype=jnp.int32)
    table = table.at[jnp.minimum(keys, n3)].set(
        jnp.where(keys < n3, slots, cfg.null_block)
    )
    table = table.at[n3].set(cfg.null_block)

    # remap pool rows old-slot -> new-slot ordering
    old_slot = partition.table[jnp.minimum(keys, n3)]
    new_pool = pool[old_slot]
    new_pool = jnp.where((keys < n3)[:, None, None], new_pool, 0.0)
    new_pool = jnp.concatenate([new_pool, jnp.zeros_like(pool[:1])], axis=0)

    return Partition(table=table, keys=keys, count=count, overflow=overflow), new_pool


# --------------------------------------------------------------------------
# tile (bucket) building
# --------------------------------------------------------------------------

def build_tiles(
    cfg: SimConfig,
    partition: Partition,
    pos: jnp.ndarray,
    active: jnp.ndarray,
    num_tiles: int,
) -> TileMap:
    """Bind particles to fixed-size tiles grouped by home-block pool slot.

    Replaces the reference's advection-bucket scatter + bin-offset scan
    (build_particle_cell_buckets / cell_bucket_to_block / compute_bin_capacity,
    mgmpm_kernels.cuh:37-94) with one key sort and prefix sums.
    pos: [3, P].
    """
    p = pos.shape[1]
    tile = cfg.particle_tile
    null = cfg.null_block
    nseg = null + 1

    hb = home_block(cfg, pos)
    slot = lookup(cfg, partition.table, hb)
    slot = jnp.where(active, slot, null).astype(jnp.int32)

    order = jnp.argsort(slot, stable=True)
    sorted_slot = slot[order]

    ones = jnp.ones((p,), jnp.int32)
    counts = jax.ops.segment_sum(ones, slot, num_segments=nseg)
    counts = counts.at[null].set(0)  # inactive particles get no tiles
    start = jnp.cumsum(counts) - counts

    tiles_per_block = -(-counts // tile)
    cum_tiles = jnp.cumsum(tiles_per_block)
    pad_start = (cum_tiles - tiles_per_block) * tile
    total_tiles = cum_tiles[-1]

    rank = jnp.arange(p, dtype=jnp.int32) - start[sorted_slot]
    flat_pos = pad_start[sorted_slot] + rank
    flat_pos = jnp.where(sorted_slot == null, num_tiles * tile, flat_pos)
    dropped = jnp.sum(
        (flat_pos >= num_tiles * tile) & (sorted_slot != null), dtype=jnp.int32
    ).reshape(1)

    pidx_flat = jnp.full((num_tiles * tile,), -1, jnp.int32)
    pidx_flat = pidx_flat.at[flat_pos].set(order.astype(jnp.int32), mode="drop")
    pidx = pidx_flat.reshape(num_tiles, tile)
    valid = pidx >= 0
    pidx = jnp.where(valid, pidx, 0)

    t_idx = jnp.arange(num_tiles)
    owner = jnp.searchsorted(cum_tiles, t_idx, side="right").astype(jnp.int32)
    tvalid = t_idx < total_tiles
    owner = jnp.where(tvalid, jnp.minimum(owner, null), null)
    coords = unflatten_key(
        cfg, jnp.minimum(partition.keys, cfg.grid_size ** 3 - 1)
    )                                                       # [3, nb]
    bcoord = coords[:, jnp.minimum(owner, cfg.max_active_blocks - 1)]
    bcoord = jnp.where(tvalid[None, :], bcoord, 0)          # [3, T]

    return TileMap(
        pidx=pidx,
        valid=valid,
        block=owner,
        bcoord=bcoord,
        tvalid=tvalid,
        dropped=dropped,
    )
