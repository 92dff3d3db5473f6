"""Fused G2P2G transfer — the hot loop.

TPU-native redesign of the reference's fused CUDA kernel (reference:
Projects/GMPM/mgmpm_kernels.cuh:665-937).  The reference stages a 2^3-block
(8^3-cell) shared-memory arena per particle block, gathers with per-thread
scalar loops and scatters with shared-memory atomics.  Here the same arena
becomes a per-tile [4, 8, 8, 8] VMEM-resident tensor and the quadratic
B-spline transfer is factored into *separable per-axis contractions*:

* G2P:  v_p = sum_xyz wx[x] wy[y] wz[z] V[:, x, y, z] — one
  [C*64, 8] @ [8, tile] matmul per tile followed by two VPU reductions; the
  APIC moment matrix A comes from the same pipeline with the per-axis
  *moment* vectors m = w * (x_i - x_p).
* P2G:  the fused momentum scatter  W * (m v + Q (x_i - x_p))  decomposes
  into four separable outer-product terms stacked along the particle axis
  and contracted in ONE [64, 4*tile] @ [4*tile, 32] matmul per tile — the
  particle axis is the MXU contraction dimension, so the shared-memory
  atomics disappear and the result is deterministic.

Performance-critical layout decisions:
1. particle state is *slot-major*: stored directly in tile order, so the
   loop reads/writes contiguous chunks — no per-particle gather/scatter at
   all (those scatters measured ~40% of the step before this design).
2. the particle axis is always the trailing (lane) axis: positions [3, S],
   F [9, S], per-axis weights [chunk, 8, tile].  TPU vector registers are
   (8 sublanes, 128 lanes); small trailing dims waste up to 42x per op.

Tiles are processed in chunks under ``lax.scan`` with the next grid pool as
carry, bounding intermediate memory exactly like the CUDA block loop does.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from ..config import SimConfig
from ..models.materials import Material
from .types import ParticleModel
from . import partition as part
from . import octpool

def _nb_offsets(cfg):
    """[3, span^3] neighbor block offsets (arena_lo .. arena_lo+span-1)."""
    r = _np.arange(cfg.arena_lo, cfg.arena_lo + cfg.arena_span, dtype=_np.int32)
    return _np.stack(_np.meshgrid(r, r, r, indexing="ij"), axis=0).reshape(3, -1)


def _bspline_onehot(cfg: SimConfig, pos, origin):
    """Per-axis one-hot B-spline weight/moment vectors over the 8-cell arena
    axis (reference bspline_weight, utility_funcs.hpp:10-19).

    pos: [3, ct, tile]; origin: [3, ct, 1] arena origin cell per tile.
    Returns (w, m, in_range): w, m are 3-tuples of [ct, C, tile] (C = arena
    cells); in_range is [ct, tile].
    """
    dx = cfg.dx
    cells = cfg.arena_cells
    base = part.base_cell(cfg, pos)                       # [3, ct, tile]
    d = pos * cfg.dx_inv - base.astype(pos.dtype)         # in [0.5, 1.5]

    li = base - origin
    in_range = jnp.all((li >= 0) & (li <= cells - 3), axis=0)
    li = jnp.clip(li, 0, cells - 3)

    iota = jnp.arange(cells, dtype=jnp.int32)[None, :, None]   # [1, C, 1]
    ws, ms = [], []
    for ax in range(3):
        da = d[ax][:, None, :]                            # [ct, 1, tile]
        w0 = 0.5 * (1.5 - da) ** 2
        w1 = 0.75 - (da - 1.0) ** 2
        w2 = 0.5 * (da - 0.5) ** 2
        lia = li[ax][:, None, :]
        w = (
            w0 * (iota == lia)
            + w1 * (iota == lia + 1)
            + w2 * (iota == lia + 2)
        ).astype(pos.dtype)                               # [ct, 8, tile]
        cell_x = (origin[ax][:, None, :] + iota).astype(pos.dtype) * dx
        m = w * (cell_x - pos[ax][:, None, :])
        ws.append(w)
        ms.append(m)
    return ws, ms, in_range


def neighbor_slots(cfg: SimConfig, table, bcoord):
    """Block addresses of the arena's neighbor blocks per tile: [T, span^3]
    (oct_slot * 8 + z8, core/octpool.py)."""
    nb = bcoord[:, :, None] + jnp.asarray(_nb_offsets(cfg))[:, None, :]
    return part.lookup(cfg, table, nb)


def _arena_from_slots(cfg: SimConfig, pool, nb_slot):
    """[ct, span^3] block addresses -> [ct, 4, C, C, C] cell arena
    (oracle-grade extraction from the oct pool; the Pallas fast path never
    materializes this form)."""
    bs = cfg.block_size
    sp = cfg.arena_span
    blocks = octpool.gather_block_rows(cfg, pool, nb_slot)  # [ct, s^3, 4, bv]
    t = blocks.shape[0]
    arena = blocks.reshape(t, sp, sp, sp, 4, bs, bs, bs)
    arena = arena.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    c = sp * bs
    return arena.reshape(t, 4, c, c, c)


def _scatter_layout(cfg: SimConfig, arena_out):
    """[ct, C, C, C, 4] (x, y, z, c) cell arena -> [ct, s^3, 4, bv] rows."""
    bs = cfg.block_size
    sp = cfg.arena_span
    t = arena_out.shape[0]
    a = arena_out.reshape(t, sp, bs, sp, bs, sp, bs, 4)
    a = a.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return a.reshape(t, sp ** 3, 4, cfg.block_volume)


def _chunked(x, nchunks, tile_chunk, tile):
    """[..., T(*tile)] slot/tile arrays -> scan xs with chunk axis leading."""
    if x.ndim == 1:
        return x.reshape(nchunks, -1)
    return jnp.moveaxis(x.reshape(x.shape[:-1] + (nchunks, -1)), -2, 0)


def g2p2g_model(
    cfg: SimConfig,
    material: Material,
    pool_v: jnp.ndarray,
    table: jnp.ndarray,
    model: ParticleModel,
    dt: jnp.ndarray,
    next_dt: jnp.ndarray,
    next_pool: jnp.ndarray,
    tile_chunk: int = 32,
) -> Tuple[ParticleModel, jnp.ndarray]:
    """One material's fused grid->particle->grid transfer.

    ``pool_v`` holds (m, vx, vy, vz) after the grid update; ``next_pool``
    accumulates (m, mx, my, mz) for the next step.
    """
    tm = model.tiles
    num_tiles = tm.block.shape[0]
    tile = cfg.particle_tile
    assert num_tiles % tile_chunk == 0, (num_tiles, tile_chunk)
    nchunks = num_tiles // tile_chunk
    d_inv = jnp.asarray(cfg.d_inv, pool_v.dtype)
    mass = material.mass

    nb_slot_all = neighbor_slots(cfg, table, tm.bcoord)   # [T, 8]
    nb_slot_all = jnp.where(tm.tvalid[:, None], nb_slot_all, cfg.null_block)

    def chunk(carry, inp):
        pos, fields, valid, bcoord, nb_slot = inp
        ct = tile_chunk
        pos = pos.reshape(3, ct, tile)
        valid = valid.reshape(ct, tile)
        arena = _arena_from_slots(cfg, carry[1], nb_slot)

        origin = ((bcoord + cfg.arena_lo) * cfg.block_size)[:, :, None]
        w, mvec, in_range_pre = _bspline_onehot(cfg, pos, origin)
        (wx, wy, wz), (mx, my, mz) = w, mvec              # [ct, C, tile]

        vgrid = arena[:, 1:4]                             # [ct, 3, 8, 8, 8]
        gx = jnp.einsum("txp,tcxyz->tcyzp", wx, vgrid)
        gmx = jnp.einsum("txp,tcxyz->tcyzp", mx, vgrid)
        wy_b = wy[:, None, :, None, :]
        my_b = my[:, None, :, None, :]
        gxy = jnp.sum(gx * wy_b, axis=2)                  # [ct, 3, 8, tile]
        gxmy = jnp.sum(gx * my_b, axis=2)
        gmxy = jnp.sum(gmx * wy_b, axis=2)
        wz_b = wz[:, None, :, :]
        mz_b = mz[:, None, :, :]
        vel = jnp.sum(gxy * wz_b, axis=2)                 # [ct, 3, tile]
        col2 = jnp.sum(gxy * mz_b, axis=2)
        col1 = jnp.sum(gxmy * wz_b, axis=2)
        col0 = jnp.sum(gmxy * wz_b, axis=2)
        cols = (col0, col1, col2)
        a_soa = tuple(cols[c][:, r] for r in range(3) for c in range(3))

        # --- particle update (material static dispatch, SoA math) ---
        # chunk field slices are already flat over the chunk's slots:
        # F [9, ct*tile], scalars [ct*tile]
        new_fields_flat, contrib = material.update(
            d_inv, dt, tuple(c.reshape(-1) for c in a_soa), fields
        )

        new_pos = pos + vel.transpose(1, 0, 2) * dt       # [3, ct, tile]

        # fused momentum matrix  Q = (A m - contrib dt_next) D^-1
        q = tuple(
            ((a.reshape(-1) * mass - c * next_dt) * d_inv).reshape(ct, tile)
            for a, c in zip(a_soa, contrib)
        )

        # --- P2G at the advected position, same arena ---
        # a particle outside the arena pre-advection gathered with clipped
        # (wrong) weights, so it must not scatter either (matches the Pallas
        # kernel's in_range & in_range2 gate, ops/pallas_g2p2g.py)
        w2, m2, in_range = _bspline_onehot(cfg, new_pos, origin)
        ok = valid & in_range_pre & in_range
        (wx2, wy2, wz2), (mx2, my2, mz2) = w2, m2

        okf = ok[:, None, :].astype(pos.dtype)            # [ct, 1, tile]
        velm = vel * mass
        s0 = jnp.concatenate(
            [jnp.full((ct, 1, tile), mass, pos.dtype), velm], axis=1
        ) * okf
        zero = jnp.zeros((ct, 1, tile), pos.dtype)
        s1 = jnp.concatenate(
            [zero, q[0][:, None], q[3][:, None], q[6][:, None]], axis=1
        ) * okf
        s2 = jnp.concatenate(
            [zero, q[1][:, None], q[4][:, None], q[7][:, None]], axis=1
        ) * okf
        s3 = jnp.concatenate(
            [zero, q[2][:, None], q[5][:, None], q[8][:, None]], axis=1
        ) * okf

        ux = jnp.concatenate([wx2, mx2, wx2, wx2], axis=2)   # [ct, 8, 4*tile]
        uy = jnp.concatenate([wy2, wy2, my2, wy2], axis=2)
        uz = jnp.concatenate([wz2, wz2, wz2, mz2], axis=2)
        sv = jnp.concatenate([s0, s1, s2, s3], axis=2)       # [ct, 4, 4*tile]

        cells = cfg.arena_cells
        e = (ux[:, :, None, :] * uy[:, None, :, :]).reshape(
            ct, cells * cells, 4 * tile)
        r = (uz[:, :, None, :] * sv[:, None, :, :]).reshape(
            ct, cells * 4, 4 * tile)
        arena_out = jnp.einsum("tep,tfp->tef", e, r, precision=cfg.precision)
        arena_out = arena_out.reshape(ct, cells, cells, cells, 4)
        if cfg.mxu_precision != "highest":
            # exact-mass side contraction, mirroring the Pallas kernel's m8
            # dot (ops/pallas_g2p2g.py): under reduced transfer precision
            # the MASS channel is recomputed exactly so total grid mass —
            # the conservation invariant every health check pins at f32
            # roundoff — never rides a quantized dot.  Channel 0 receives
            # contributions only from the plain-weight/s0 segment (the
            # moment segments carry zero mass channels), so this is a
            # numerical-identity replacement, not an approximation.
            e0 = (wx2[:, :, None, :] * wy2[:, None, :, :]).reshape(
                ct, cells * cells, tile)
            r0 = wz2 * s0[:, 0:1, :]                      # [ct, cells, tile]
            m_arena = jnp.einsum("tep,tfp->tef", e0, r0,
                                 precision=jax.lax.Precision.HIGHEST)
            arena_out = arena_out.at[..., 0].set(
                m_arena.reshape(ct, cells, cells, cells))

        blocks = _scatter_layout(cfg, arena_out)
        acc = octpool.scatter_add_block_rows(
            cfg, carry[0], nb_slot.reshape(-1),
            blocks.reshape(ct * cfg.arena_span ** 3, 4, cfg.block_volume),
        )
        return (acc, carry[1]), (new_pos.reshape(3, -1), new_fields_flat,
                                 ok.reshape(-1))

    xs = (
        _chunked(model.pos, nchunks, tile_chunk, tile),
        {k: _chunked(v, nchunks, tile_chunk, tile) for k, v in model.fields.items()},
        _chunked(model.active, nchunks, tile_chunk, tile),
        jnp.moveaxis(tm.bcoord.reshape(3, nchunks, tile_chunk), 1, 0),
        nb_slot_all.reshape(nchunks, tile_chunk, cfg.arena_span ** 3),
    )
    (next_pool, _), (new_pos, new_fields, ok) = jax.lax.scan(
        chunk, (next_pool, pool_v), xs
    )
    next_pool = next_pool.at[cfg.null_oct].set(0.0)

    # stitch chunk outputs back into slot-major arrays (pure reshapes/moves)
    pos_out = jnp.moveaxis(new_pos, 0, 1).reshape(3, -1)
    fields_out = {}
    for k, v in new_fields.items():
        if v.ndim == 3:                                   # [nc, 9, cs]
            fields_out[k] = jnp.moveaxis(v, 0, 1).reshape(v.shape[1], -1)
        else:                                             # [nc, cs]
            fields_out[k] = v.reshape(-1)
    active_out = ok.reshape(-1)
    pid_out = jnp.where(active_out, model.pid, model.pos.shape[1])

    new_model = model._replace(
        pos=pos_out, fields=fields_out, active=active_out, pid=pid_out
    )
    return new_model, next_pool


def rasterize_model(
    cfg: SimConfig,
    material: Material,
    table: jnp.ndarray,
    model: ParticleModel,
    v0: jnp.ndarray,
    pool: jnp.ndarray,
    tile_chunk: int = 32,
) -> jnp.ndarray:
    """Initial P2G of mass and momentum with a uniform initial velocity
    (reference rasterize, mgmpm_kernels.cuh:154-219)."""
    tm = model.tiles
    num_tiles = tm.block.shape[0]
    tile = cfg.particle_tile
    nchunks = num_tiles // tile_chunk
    mass = material.mass

    nb_slot_all = neighbor_slots(cfg, table, tm.bcoord)
    nb_slot_all = jnp.where(tm.tvalid[:, None], nb_slot_all, cfg.null_block)

    def chunk(carry, inp):
        pos, valid, bcoord, nb_slot = inp
        ct = tile_chunk
        pos = pos.reshape(3, ct, tile)
        valid = valid.reshape(ct, tile)
        origin = ((bcoord + cfg.arena_lo) * cfg.block_size)[:, :, None]
        w, _, in_range = _bspline_onehot(cfg, pos, origin)
        wx, wy, wz = w
        cells = cfg.arena_cells
        okf = (valid & in_range)[:, None, :].astype(pos.dtype)
        sv = jnp.concatenate(
            [jnp.full((ct, 1, tile), mass, pos.dtype),
             jnp.broadcast_to((mass * v0)[None, :, None], (ct, 3, tile))],
            axis=1,
        ) * okf
        e = (wx[:, :, None, :] * wy[:, None, :, :]).reshape(
            ct, cells * cells, tile)
        r = (wz[:, :, None, :] * sv[:, None, :, :]).reshape(
            ct, cells * 4, tile)
        # init-time only: run the rasterization exact regardless of the
        # transfer precision so the initial mass/momentum are f32-true
        # (the per-substep path keeps its exact-mass side dot instead)
        arena_out = jnp.einsum(
            "tep,tfp->tef", e, r, precision=jax.lax.Precision.HIGHEST
        ).reshape(ct, cells, cells, cells, 4)
        blocks = _scatter_layout(cfg, arena_out)
        carry = octpool.scatter_add_block_rows(
            cfg, carry, nb_slot.reshape(-1),
            blocks.reshape(ct * cfg.arena_span ** 3, 4, cfg.block_volume),
        )
        return carry, None

    xs = (
        _chunked(model.pos, nchunks, tile_chunk, tile),
        _chunked(model.active, nchunks, tile_chunk, tile),
        jnp.moveaxis(tm.bcoord.reshape(3, nchunks, tile_chunk), 1, 0),
        nb_slot_all.reshape(nchunks, tile_chunk, cfg.arena_span ** 3),
    )
    pool, _ = jax.lax.scan(chunk, pool, xs)
    return pool.at[cfg.null_oct].set(0.0)
