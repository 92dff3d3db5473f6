"""Sparse block partition: activation, compaction, tile building.

TPU-native replacement for the reference's GPU hash-table partition and its
rebuild kernel chain (reference: Projects/GMPM/hash_table.cuh:75-135 for the
table, Projects/GMPM/gmpm_simulator.cuh:429-570 for the per-substep rebuild:
mark_active_*, thrust::exclusive_scan, update_partition, update_buckets,
compute_bin_capacity).

The reference's atomic bucket scatter becomes ONE key sort per model that
CARRIES the whole particle state as payload operands (measured: payload
operands are ~free on the TPU sort); ranks and tile padding are derived
with cumsum/cummax segment tricks, and the sorted-dense -> padded-slot
placement is a searchsorted + per-tile contiguous window slice.  Random
1-element gathers/scatters run on the scalar path ~100x below HBM speed,
so nothing here indexes per particle.

Coordinate convention: positions and block/cell coordinates are
component-leading ([3, ...]).  All outputs are static-shaped so the whole
rebuild runs inside jit.
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
    """[3, ...] block coords -> block address (null_block when inactive/OOB).

    Replaces the reference's ``Partition::query`` (hash_table.cuh:129-134).
    The table maps OCT keys to oct-pool rows; a block address is
    ``oct_slot * 8 + z8`` (see core/octpool.py).
    """
    from . import octpool

    return octpool.lookup_braddr(cfg, table, coord)


def base_cell(cfg: SimConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Lowest corner cell of the quadratic B-spline stencil:
    round(x/dx) - 1 (reference get_block_id, utility_funcs.hpp:21-23)."""
    return jnp.floor(pos * cfg.dx_inv + 0.5).astype(jnp.int32) - 1


def home_block(cfg: SimConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Home block = block of cell (base - 1); guarantees the 3^3 stencil and
    its one-step advected version stay inside the 2^3 block arena anchored at
    the home block (the reference's arena invariant, mgmpm_kernels.cuh:687)."""
    return (base_cell(cfg, pos) - 1) >> cfg.block_bits


# --------------------------------------------------------------------------
# tile (bucket) building — the sort pipeline
# --------------------------------------------------------------------------

def sort_permute(cfg: SimConfig, model, num_tiles: int, region_fn=None):
    """Full rebucket: group slots into block-aligned, oct-group-padded
    tiles and move the WHOLE particle state into the new layout in one
    ``lax.sort`` (reference: build_particle_cell_buckets + update_buckets,
    mgmpm_kernels.cuh:37-94, 980-1000).

    Round 2 sorted (key, iota) and applied the permutation as an [S, C]
    row gather; the [C, S] <-> [S, C] relayouts around that gather cost
    93 ms at 1.4M slots on v5e (the C-sized minor dim pads ~9x).  A TPU
    sort carries extra payload operands at ~zero marginal cost (measured:
    15 operands sort exactly as fast as 2), so the state channels ride the
    sort itself; the sorted-dense -> padded-slot placement is then T
    contiguous window slices located with one searchsorted over the
    monotone destination map.

    ``region_fn``: optional bool predicate over flat block keys.  When
    given, slots whose home block satisfies it sort FIRST (keys stay
    ascending within each region) — the multi-chip engine uses this to
    make halo-boundary tiles a static prefix so the transfer can run
    boundary tiles, ship the halo payload, then run interior tiles
    overlapped with the in-flight collective (the reference's halo-first /
    interior-second g2p2g split, mgsp_benchmark.cuh:439-464).  The offset
    is a multiple of 8 so oct grouping (key >> 3) survives the shift.

    Returns (permuted model, tile_keys i32[T], dropped i32[1]).
    """
    s_cap = model.pos.shape[1]
    tile = cfg.particle_tile
    n3 = cfg.grid_size ** 3

    key = flatten_key(cfg, home_block(cfg, model.pos))
    key = jnp.where(model.active, key, n3).astype(jnp.int32)
    if region_fn is None:
        sort_src = key
        sentinel = n3
    else:
        off = n3 + 8                      # multiple of 8: (key+off)>>3 exact
        sentinel = 2 * off
        assert sentinel < (1 << 30), "domain too large for region packing"
        interior = jnp.logical_not(region_fn(jnp.minimum(key, n3 - 1)))
        sort_src = jnp.where(
            key < n3, key + jnp.where(interior, off, 0), sentinel
        ).astype(jnp.int32)

    # int payloads ride bitcast to f32 with a high exponent bit set (TPUs
    # flush f32 denormals even through copies/selects)
    def enc(x):
        return jax.lax.bitcast_convert_type(x | jnp.int32(0x40000000),
                                            jnp.float32)

    def dec(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(0x3FFFFFFF)

    chans = [enc(key), model.pos[0], model.pos[1], model.pos[2]]
    widths = []
    for k, v in model.fields.items():
        if v.ndim == 1:
            chans.append(v)
            widths.append((k, 1))
        else:
            chans.extend(v[i] for i in range(v.shape[0]))
            widths.append((k, v.shape[0]))
    chans.append(enc(model.pid))

    sorted_all = jax.lax.sort((sort_src, *chans), num_keys=1, is_stable=True)
    skey = sorted_all[0]
    schans = sorted_all[1:]
    act_s = skey < sentinel

    # padded destination slot per sorted element: level 1 tile-aligns block
    # boundaries, level 2 group-aligns home-oct boundaries (see plan_tiles)
    iota = jnp.arange(s_cap, dtype=jnp.int32)
    prev_key = jnp.concatenate([jnp.full((1,), -1, jnp.int32), skey[:-1]])
    boundary = (skey != prev_key) & act_s
    seg_start = jax.lax.cummax(jnp.where(boundary, iota, 0))
    prev_seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), seg_start[:-1]])
    prev_len = jnp.where(boundary, iota - prev_seg_start, 0)
    waste = jnp.where(boundary, (-prev_len) % tile, 0)
    p1 = iota + jnp.cumsum(waste)
    gt = cfg.group_tiles * tile
    o_boundary = ((skey >> 3) != (prev_key >> 3)) & boundary
    o_start_p1 = jax.lax.cummax(jnp.where(o_boundary, p1, 0))
    prev_o_p1 = jnp.concatenate([jnp.zeros((1,), jnp.int32), o_start_p1[:-1]])
    prev_o_len = jnp.where(o_boundary, p1 - prev_o_p1, 0)
    waste2 = jnp.where(o_boundary, (-prev_o_len) % gt, 0)
    new_slot = p1 + jnp.cumsum(waste2)
    fits = act_s & (new_slot < s_cap)
    dropped = jnp.sum(act_s & ~fits, dtype=jnp.int32).reshape(1)
    new_slot = jnp.where(fits, new_slot, s_cap)

    # dense window start per destination tile (new_slot is monotone; every
    # non-empty tile's range starts exactly at t*tile by construction)
    starts = jnp.searchsorted(
        new_slot, jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile,
        side="left").astype(jnp.int32)
    dstart, dlen = starts[:-1], jnp.minimum(starts[1:] - starts[:-1], tile)

    packed = jnp.stack(schans, axis=0)                    # [C, S]
    c = packed.shape[0]
    win = jax.vmap(
        lambda o: jax.lax.dynamic_slice(packed, (0, o), (c, tile))
    )(jnp.minimum(dstart, s_cap - tile))                  # [T, C, tile]
    valid = (jnp.arange(tile, dtype=jnp.int32)[None, :]
             < dlen[:, None])                             # [T, tile]
    out = jnp.moveaxis(win, 0, 1).reshape(c, num_tiles * tile)
    vflat = valid.reshape(-1)

    key_out = dec(out[0])
    pos = jnp.where(vflat[None, :], out[1:4], 0.0)
    fields = {}
    off = 4
    for name, w in widths:
        val = out[off] if w == 1 else out[off : off + w]
        fields[name] = jnp.where(
            vflat if w == 1 else vflat[None, :], val, 0.0)
        off += w
    pid = jnp.where(vflat, dec(out[off]), s_cap)

    tile_keys = jnp.where(
        dlen > 0, jnp.where(valid[:, 0], key_out[:: tile], n3), n3
    ).astype(jnp.int32)

    return (
        model._replace(pos=pos, fields=fields, active=vflat, pid=pid),
        tile_keys,
        dropped,
    )


def arena_margin(cfg: SimConfig, model) -> jnp.ndarray:
    """Minimum distance in cells (can go negative) of any active particle
    to its tile's transfer-arena bound.

    The B-spline base cell is floor(x/dx - 0.5); the transfer requires
    base - origin in [0, arena_cells - 3] (transfer.py in_range), i.e. the
    continuous coordinate c = x/dx - 0.5 - origin in [0, arena_cells - 2).
    The margin is min(c, arena_cells - 2 - c) over active particles and
    axes: how many cells of further drift the current bucketing tolerates.
    Drives drift-triggered rebucketing (SimConfig.rebucket_auto) — the
    reference instead rebuilds every substep unconditionally
    (gmpm_simulator.cuh:429-570).
    """
    tm = model.tiles
    t = tm.bcoord.shape[1]
    tile = cfg.particle_tile
    origin = (tm.bcoord + cfg.arena_lo) * cfg.block_size            # [3, T]
    c = (model.pos.reshape(3, t, tile) * cfg.dx_inv - 0.5
         - origin[:, :, None].astype(jnp.float32))
    m = jnp.minimum(c, (cfg.arena_cells - 2) - c)
    live = model.active.reshape(1, t, tile) & tm.tvalid[None, :, None]
    return jnp.min(jnp.where(live, m, jnp.inf))


def incremental_plan(cfg: SimConfig, model, tile_keys: jnp.ndarray):
    """Stable-tile rebucket: relocate only the particles whose home block
    left their tile's block (the reference's add_advection bucket update,
    particle_buffer.cuh:100-135) instead of re-sorting every slot.

    The full sort path (plan_tiles + apply_slot_permutation) moves every
    particle's whole state through an [S, C] permutation gather — measured
    ~17 ms at 1.6M slots on v5e, ~2/3 of the rebuild cost — while the
    physical churn is a few percent per window.  Here:

    * stayers keep their slot (tiles become buckets with holes; the
      transfer's ``active`` gating already handles dead lanes);
    * movers are compacted (fixed ``mover capacity``), sorted by their new
      home block, packed into tiles drawn from the free-tile pool, and
      scattered back — all costs scale with the mover count;
    * movers beyond capacity (or beyond the free-tile pool) are DEFERRED in
      place and counted in ``dropped`` (they survive one window inside the
      arena drift tolerance; persistent overflow surfaces loudly).

    Fragmentation (holes + part-filled tiles) is healed by the periodic
    full-sort defrag pass (SimConfig.defrag_every).

    Returns (model2, tile_keys2, moved_or_deferred_dropped).
    """
    s_cap = model.pos.shape[1]
    tile = cfg.particle_tile
    num_tiles = tile_keys.shape[0]
    n3 = cfg.grid_size ** 3
    m_cap = max(tile, int(s_cap * cfg.mover_capacity_frac))

    key = flatten_key(cfg, home_block(cfg, model.pos))
    key = jnp.where(model.active, key, n3).astype(jnp.int32)
    tk_slot = jnp.broadcast_to(
        tile_keys[:, None], (num_tiles, tile)
    ).reshape(-1)
    stay = model.active & (key == tk_slot)
    mover = model.active & ~stay

    (midx,) = jnp.nonzero(mover, size=m_cap, fill_value=s_cap)
    got_m = midx < s_cap
    deferred = jnp.sum(mover, dtype=jnp.int32) - jnp.sum(got_m, dtype=jnp.int32)
    gmid = jnp.minimum(midx, s_cap - 1)
    mkey = jnp.where(got_m, key[gmid], n3).astype(jnp.int32)

    # pack movers into fresh tiles: sort by key, pad to tile boundaries
    iota_m = jnp.arange(m_cap, dtype=jnp.int32)
    skey, sord = jax.lax.sort((mkey, iota_m), num_keys=1, is_stable=True)
    act_s = skey < n3
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), skey[:-1]])
    boundary = (skey != prev) & act_s
    seg_start = jax.lax.cummax(jnp.where(boundary, iota_m, 0))
    prev_seg = jnp.concatenate([jnp.zeros((1,), jnp.int32), seg_start[:-1]])
    prev_len = jnp.where(boundary, iota_m - prev_seg, 0)
    waste = jnp.where(boundary, (-prev_len) % tile, 0)
    mslot = iota_m + jnp.cumsum(waste)            # mover-local padded slot

    # free tiles: no active slot at all (counting movers too — a tile whose
    # movers might be DEFERRED must not be reallocated under them)
    occ = jnp.sum(model.active.reshape(num_tiles, tile), axis=1)
    free = occ == 0
    (ftile,) = jnp.nonzero(free, size=num_tiles, fill_value=num_tiles)
    n_free = jnp.sum(free, dtype=jnp.int32)

    # mover tile j -> global tile ftile[j]; beyond the pool: defer
    mtile = mslot // tile
    placeable = act_s & (mtile < n_free)
    deferred = deferred + jnp.sum(act_s & ~placeable, dtype=jnp.int32)
    gt = ftile[jnp.minimum(mtile, num_tiles - 1)]
    iota_m2 = jnp.arange(m_cap, dtype=jnp.int32)
    # distinct out-of-bounds fillers keep the scatters on the
    # unique-indices fast path
    dest = jnp.where(placeable, gt * tile + mslot % tile, s_cap + iota_m2)

    # source slot per sorted mover; single fused [C, M] gather + scatter
    src = gmid[sord]
    comps = [model.pos]
    widths = [("pos", 3)]
    for k, v in model.fields.items():
        comps.append(v if v.ndim > 1 else v[None, :])
        widths.append((k, 1 if v.ndim == 1 else v.shape[0]))
    packed = jnp.concatenate(comps, axis=0)       # [C, S]
    moved = jnp.take(packed, src, axis=1)         # [C, M]
    packed = packed.at[:, dest].set(moved, mode="drop", unique_indices=True)

    off = 0
    parts = {}
    for name, w in widths:
        parts[name] = packed[off : off + w]
        off += w
    pos2 = parts["pos"]
    fields2 = {
        k: (parts[k][0] if v.ndim == 1 else parts[k])
        for k, v in model.fields.items()
    }
    pid_m = model.pid[src]
    pid2 = model.pid.at[dest].set(pid_m, mode="drop", unique_indices=True)

    active2 = stay.at[dest].set(placeable, mode="drop", unique_indices=True)
    # deferred movers (beyond capacity / free pool) stay active in place
    placed_from = jnp.zeros((s_cap + 1,), jnp.bool_).at[
        jnp.where(placeable, src, s_cap)
    ].set(True, mode="drop")[:s_cap]
    active2 = active2 | (mover & ~placed_from)

    # new tile keys: freed tiles release their key, mover tiles bind theirs
    # (tiles are key-pure, so the key of each mover tile is the key at its
    # first slot)
    tile_keys2 = jnp.where(free, n3, tile_keys)
    starts = mslot % tile == 0
    tkey_scatter_idx = jnp.where(placeable & starts, gt, num_tiles)
    tile_keys2 = tile_keys2.at[tkey_scatter_idx].set(skey, mode="drop")

    model2 = model._replace(pos=pos2, fields=fields2, active=active2, pid=pid2)
    return model2, tile_keys2.astype(jnp.int32), deferred.reshape(1)


def finalize_tiles(cfg: SimConfig, partition: Partition, tile_keys: jnp.ndarray,
                   dropped: jnp.ndarray) -> TileMap:
    """Bind tiles to block addresses / coordinates of the new partition."""
    from . import octpool

    n3 = cfg.grid_size ** 3
    tvalid = tile_keys < n3
    bcoord = unflatten_key(cfg, jnp.minimum(tile_keys, n3 - 1))
    bcoord = jnp.where(tvalid[None, :], bcoord, 0)
    okey = octpool.oct_key_from_block_key(cfg, tile_keys)
    oslot = partition.table[okey]
    braddr = jnp.where(
        tvalid & (oslot != cfg.null_oct),
        oslot * 8 + (jnp.minimum(tile_keys, n3 - 1) & 7),
        cfg.null_block,
    )
    return TileMap(block=braddr, bcoord=bcoord, tvalid=tvalid, dropped=dropped)


# --------------------------------------------------------------------------
# partition rebuild
# --------------------------------------------------------------------------

def _dilate(cfg: SimConfig, mask3: jnp.ndarray) -> jnp.ndarray:
    """OR of shifts by every offset in the transfer's scatter stencil:
    {0,1}^3 when rebucketing every step (the stencil extends one block in the
    + direction; reference register_neighbor_blocks, mgmpm_kernels.cuh:118-133),
    {-1..2}^3 for the drift-tolerant 4^3 arena of lazy rebucketing."""
    lo, hi = cfg.arena_lo, cfg.arena_lo + cfg.arena_span - 1
    n = mask3.shape[0]
    out = mask3
    offs = range(lo, hi + 1)
    for ox in offs:
        for oy in offs:
            for oz in offs:
                if ox == 0 and oy == 0 and oz == 0:
                    continue
                pads = tuple((max(o, 0), max(-o, 0)) for o in (ox, oy, oz))
                shifted = jnp.pad(mask3, pads, constant_values=False)
                shifted = shifted[
                    pads[0][1] : pads[0][1] + n,
                    pads[1][1] : pads[1][1] + n,
                    pads[2][1] : pads[2][1] + n,
                ]
                out = out | shifted
    return out


def rebuild(
    cfg: SimConfig,
    pool: jnp.ndarray,
    partition: Partition,
    model_block_keys: Tuple[jnp.ndarray, ...],
    extra_mask: jnp.ndarray | None = None,
) -> Tuple[Partition, jnp.ndarray]:
    """Recompute the active OCT set, compact it, and remap the grid pool.

    The active-block set is computed exactly as the reference does — blocks
    holding grid mass (mark_active_grid_blocks) union {0,1}^3-dilated
    particle home blocks (mark_active_particle_blocks +
    register_neighbor_blocks) — then coarsened to octs (any active block
    activates its 8-block pool row).  Compaction in ascending oct-key order
    makes z-consecutive active octs slot-adjacent, which is what the window
    transfer path relies on.  Returns (new_partition, remapped_pool).
    """
    from . import octpool

    g = cfg.grid_size
    n3 = g * g * g
    no = cfg.num_oct_keys
    nb = cfg.max_active_octs
    mask = jnp.zeros((n3,), jnp.bool_)

    # blocks with grid mass survive (momentum ballistic past particles)
    has_mass = octpool.block_has_mass(cfg, pool)          # [O, 8]
    slot_live = (jnp.arange(nb) < partition.count) & (partition.keys < no)
    bkeys = octpool.oct_block_keys(cfg, partition.keys)   # [O, 8]
    mask = mask.at[jnp.minimum(bkeys, n3 - 1)].max(
        has_mass & slot_live[:, None] & (bkeys < n3)
    )

    # particle home blocks (block-level lists, tiny scatters)
    pmask = jnp.zeros((n3,), jnp.bool_)
    for keys in model_block_keys:
        pmask = pmask.at[keys].set(True, mode="drop")
    pmask = _dilate(cfg, pmask.reshape(g, g, g)).reshape(-1)
    mask = mask | pmask
    if extra_mask is not None:
        mask = mask | extra_mask.reshape(-1)

    # coarsen to octs; block key layout (x, y, z) makes z the low bits, so
    # consecutive groups of 8 block keys form one oct
    omask = jnp.any(mask.reshape(no, 8), axis=1)

    count = jnp.sum(omask, dtype=jnp.int32).reshape(1)
    (keys,) = jnp.nonzero(omask, size=nb, fill_value=no)
    keys = keys.astype(jnp.int32)
    overflow = jnp.maximum(count - nb, 0)
    count = jnp.minimum(count, nb)

    table = jnp.full((no + 1,), cfg.null_oct, jnp.int32)
    slots = jnp.arange(nb, dtype=jnp.int32)
    table = table.at[jnp.minimum(keys, no)].set(
        jnp.where(keys < no, slots, cfg.null_oct)
    )
    table = table.at[no].set(cfg.null_oct)

    # remap pool rows old-slot -> new-slot ordering
    old_slot = partition.table[jnp.minimum(keys, no)]
    new_pool = pool[old_slot]
    new_pool = jnp.where((keys < no)[:, None, None], new_pool, 0.0)
    new_pool = jnp.concatenate([new_pool, jnp.zeros_like(pool[:1])], axis=0)

    return Partition(table=table, keys=keys, count=count, overflow=overflow), new_pool
