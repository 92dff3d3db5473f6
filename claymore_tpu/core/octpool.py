"""Oct-packed grid pool layout helpers (docs/design_octpool.md).

The sparse grid pool is ``f32[max_active_octs + 1, 16, 128]``: one native
TPU tile per OCT = 8 z-consecutive, z-aligned 4^3 blocks.
rows = (channel c in 0..3, cx in 0..3); lanes = (z8 in 0..7, cy, cz).
The trailing row is the *null oct* absorbing traffic for inactive octs.

This replaces the reference's ``grid_buffer_`` 4-KB block arenas
(reference: Projects/GMPM/grid_buffer.cuh:12-14) with a layout chosen for
TPU transfer physics: fully dense native tiles, and z-runs of active
blocks contiguous in the slot axis so multi-row window gathers run at HBM
speed (measured: 530 GB/s vs 15-150 GB/s for padded per-block rows,
scripts/prof_dma.py).

Addressing convention: a *block address* (``braddr``) is
``oct_slot * 8 + z8`` — the block's position in the virtual dense
``[(max_active_octs + 1) * 8]`` block-row space.  ``cfg.null_block`` is the
first block of the null oct.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig


def oct_key_from_coord(cfg: SimConfig, coord: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] block coords -> flat oct key; out-of-range -> sentinel."""
    g = cfg.grid_size
    gzo = cfg.grid_size_zo
    valid = jnp.all((coord >= 0) & (coord < g), axis=0)
    k = (coord[0] * g + coord[1]) * gzo + (coord[2] >> 3)
    return jnp.where(valid, k, cfg.num_oct_keys)


def oct_key_from_block_key(cfg: SimConfig, key: jnp.ndarray) -> jnp.ndarray:
    """flat block key (sentinel n3 for invalid) -> flat oct key."""
    g = cfg.grid_size
    gzo = cfg.grid_size_zo
    n3 = g * g * g
    xy = key // g
    k = xy * gzo + (key % g) // cfg.oct_z
    return jnp.where(key < n3, k, cfg.num_oct_keys)


def oct_coord(cfg: SimConfig, okey: jnp.ndarray):
    """flat oct key -> (bx, by, bzo) block-column coords."""
    g = cfg.grid_size
    gzo = cfg.grid_size_zo
    bzo = okey % gzo
    by = (okey // gzo) % g
    bx = jnp.minimum(okey // (gzo * g), g - 1)
    return bx, by, bzo


def lookup_braddr(cfg: SimConfig, table: jnp.ndarray,
                  coord: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] block coords -> block address (null_block when inactive)."""
    oslot = table[oct_key_from_coord(cfg, coord)]
    z8 = coord[2] & 7
    return jnp.where(oslot == cfg.null_oct, cfg.null_block, oslot * 8 + z8)


def gather_block_rows(cfg: SimConfig, pool: jnp.ndarray,
                      braddr: jnp.ndarray) -> jnp.ndarray:
    """Block addresses [...] -> per-block rows [..., 4, 64] with the cell
    axis ordered (cx, cy, cz) — the legacy block-row form the XLA oracle
    transfer consumes.  Test/fallback-grade (per-element lane extraction)."""
    oslot = braddr >> 3
    z8 = braddr & 7
    rows = pool[oslot]                                  # [..., 16, 128]
    shp = rows.shape[:-2]
    r4 = rows.reshape(shp + (16, 8, 16))
    blk = jnp.take_along_axis(
        r4, z8[..., None, None, None], axis=-2
    )[..., 0, :]                                        # [..., 16, 16]
    # rows (c, cx) x lanes (cy, cz) flatten directly to (c, (cx, cy, cz))
    return blk.reshape(shp + (4, 64))


def scatter_add_block_rows(cfg: SimConfig, pool: jnp.ndarray,
                           braddr: jnp.ndarray,
                           rows: jnp.ndarray) -> jnp.ndarray:
    """Add per-block rows [N, 4, 64] (cells ordered (cx, cy, cz)) into the
    pool at block addresses [N].  Null-oct traffic is re-zeroed by the
    caller.  Test/fallback-grade."""
    oslot = braddr >> 3
    z8 = braddr & 7
    o1 = pool.shape[0]
    p4 = pool.reshape(o1, 16, 8, 16)
    upd = rows.reshape(rows.shape[0], 16, 16)
    p4 = p4.at[oslot, :, z8].add(upd)
    return p4.reshape(o1, 16, 128)


def pool_mass(pool: jnp.ndarray) -> jnp.ndarray:
    """Mass channel view [O+1, 4(cx), 128(z8, cy, cz)]."""
    return pool[:, 0:4]


def block_has_mass(cfg: SimConfig, pool: jnp.ndarray) -> jnp.ndarray:
    """bool[O, 8]: per (live oct row, z8) any nonzero mass."""
    m = pool[:-1, 0:4]                                   # [O, 4, 128]
    o = m.shape[0]
    return jnp.any(m.reshape(o, 4, 8, 16) != 0.0, axis=(1, 3))


def oct_block_keys(cfg: SimConfig, okeys: jnp.ndarray) -> jnp.ndarray:
    """oct keys [O] -> flat block keys [O, 8] (sentinel rows -> n3)."""
    g = cfg.grid_size
    n3 = g * g * g
    bx, by, bzo = oct_coord(cfg, jnp.minimum(okeys, cfg.num_oct_keys - 1))
    base = (bx * g + by) * g + bzo * 8
    keys = base[:, None] + jnp.arange(8, dtype=okeys.dtype)[None, :]
    return jnp.where((okeys < cfg.num_oct_keys)[:, None], keys, n3)
