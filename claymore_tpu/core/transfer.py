"""Fused G2P2G transfer — the hot loop.

TPU-native redesign of the reference's fused CUDA kernel (reference:
Projects/GMPM/mgmpm_kernels.cuh:665-937).  The reference stages a 2^3-block
(8^3-cell) shared-memory arena per particle block, gathers with per-thread
scalar loops and scatters with shared-memory atomics.  Here the same arena
becomes a per-tile [4, 8, 8, 8] register/VMEM-resident tensor and the
quadratic B-spline transfer is factored into *separable per-axis
contractions*:

* G2P:  v_p = sum_xyz wx[x] wy[y] wz[z] V[:, x, y, z] — one batched
  [tile, 8] @ [8, C*64] matmul (MXU) followed by two small VPU reductions;
  the APIC moment matrix A comes from the same pipeline with the per-axis
  *moment* vectors m = w * (x_i - x_p).
* P2G:  the fused momentum scatter  W * (m v + Q (x_i - x_p))  decomposes
  into four separable outer-product terms which are stacked along the
  particle axis and contracted in ONE [64, 4*tile] @ [4*tile, 32] matmul per
  tile — the particle axis is the MXU contraction dimension, so the
  shared-memory atomics disappear entirely and the result is deterministic.

Tiles are processed in chunks under ``lax.scan`` with the next grid pool as
carry, bounding intermediate memory exactly like the CUDA block loop does.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..models.materials import Material
from .types import ParticleModel, TileMap
from . import partition as part

_IOTA8 = jnp.arange(8, dtype=jnp.int32)


def _bspline_onehot(cfg: SimConfig, pos: jnp.ndarray, bcoord: jnp.ndarray):
    """Per-axis one-hot B-spline weight and moment vectors over the 8-cell
    arena axis.

    Returns (w, m, base, in_range) with w, m of shape [..., 3(axis), 8] where
    w[..., a, i] is the spline weight of arena cell i on axis a and
    m = w * (x_cell - x_p) is the APIC moment factor
    (reference bspline_weight, utility_funcs.hpp:10-19).
    """
    dx = cfg.dx
    base = part.base_cell(cfg, pos)                       # [..., 3]
    d = pos * cfg.dx_inv - base.astype(pos.dtype)         # in [0.5, 1.5]
    w0 = 0.5 * (1.5 - d) ** 2
    w1 = 0.75 - (d - 1.0) ** 2
    w2 = 0.5 * (d - 0.5) ** 2

    origin = bcoord * cfg.block_size                      # [..., 3] arena cell origin
    li = base - origin                                    # nominal range [1, 4]
    in_range = jnp.all((li >= 0) & (li <= 5), axis=-1)
    li = jnp.clip(li, 0, 5)

    iota = _IOTA8.reshape((1,) * pos.ndim + (-1,))        # [..., 1, 8] broadcast
    lix = li[..., None]                                   # [..., 3, 1]
    w = (
        w0[..., None] * (iota == lix)
        + w1[..., None] * (iota == lix + 1)
        + w2[..., None] * (iota == lix + 2)
    ).astype(pos.dtype)                                   # [..., 3, 8]

    cell_x = (origin[..., None] + _IOTA8).astype(pos.dtype) * dx  # [..., 3, 8]
    m = w * (cell_x - pos[..., None])
    return w, m, base, in_range


def _gather_arena(cfg: SimConfig, pool: jnp.ndarray, table: jnp.ndarray,
                  bcoord: jnp.ndarray):
    """Fetch the 2^3 neighbor blocks of each tile's home block and lay them
    out as a [tiles, 4, 8, 8, 8] cell arena.  Returns (arena, nb_slot)."""
    bs = cfg.block_size
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(8, 3)
    nb = bcoord[:, None, :] + offs[None]                  # [T, 8, 3]
    nb_slot = part.lookup(cfg, table, nb)                 # [T, 8]
    blocks = pool[nb_slot]                                # [T, 8, 4, bv]
    t = blocks.shape[0]
    arena = blocks.reshape(t, 2, 2, 2, 4, bs, bs, bs)
    arena = arena.transpose(0, 4, 1, 5, 2, 6, 3, 7)       # t, c, ox,cx, oy,cy, oz,cz
    arena = arena.reshape(t, 4, 2 * bs, 2 * bs, 2 * bs)
    return arena, nb_slot


def _scatter_layout(cfg: SimConfig, arena_out: jnp.ndarray) -> jnp.ndarray:
    """[T, 8, 8, 8, 4] (x, y, z, c) cell arena -> [T, 8, 4, bv] block rows."""
    bs = cfg.block_size
    t = arena_out.shape[0]
    a = arena_out.reshape(t, 2, bs, 2, bs, 2, bs, 4)
    a = a.transpose(0, 1, 3, 5, 7, 2, 4, 6)               # t, ox,oy,oz, c, cx,cy,cz
    return a.reshape(t, 8, 4, cfg.block_volume)


def _gather_fields(fields: Dict[str, jnp.ndarray], pid: jnp.ndarray):
    return {k: v[pid] for k, v in fields.items()}


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
    num_tiles, tile = tm.pidx.shape
    assert num_tiles % tile_chunk == 0, (num_tiles, tile_chunk)
    nchunks = num_tiles // tile_chunk
    d_inv = jnp.asarray(cfg.d_inv, pool_v.dtype)
    mass = material.mass

    pos_all = model.pos
    fields_all = model.fields

    def chunk(carry, inp):
        pidx, valid, bcoord, tvalid = inp
        arena, nb_slot = _gather_arena(cfg, pool_v, table, bcoord)
        # unused tiles must not scatter into live blocks
        nb_slot = jnp.where(tvalid[:, None], nb_slot, cfg.null_block)

        pos = pos_all[pidx]                                # [C, tile, 3]
        fields = _gather_fields(fields_all, pidx)

        w, mvec, _, _ = _bspline_onehot(cfg, pos, bcoord[:, None, :])
        wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
        mx, my, mz = mvec[..., 0, :], mvec[..., 1, :], mvec[..., 2, :]

        vgrid = arena[:, 1:4]                              # [C, 3, 8, 8, 8]
        gx = jnp.einsum("tpx,tcxyz->tpcyz", wx, vgrid)
        gmx = jnp.einsum("tpx,tcxyz->tpcyz", mx, vgrid)
        gxy = jnp.einsum("tpcyz,tpy->tpcz", gx, wy)
        gxmy = jnp.einsum("tpcyz,tpy->tpcz", gx, my)
        gmxy = jnp.einsum("tpcyz,tpy->tpcz", gmx, wy)
        vel = jnp.einsum("tpcz,tpz->tpc", gxy, wz)          # [C, tile, 3]
        col2 = jnp.einsum("tpcz,tpz->tpc", gxy, mz)
        col1 = jnp.einsum("tpcz,tpz->tpc", gxmy, wz)
        col0 = jnp.einsum("tpcz,tpz->tpc", gmxy, wz)
        amat = jnp.stack([col0, col1, col2], axis=-1)       # [C, tile, 3, 3]

        # --- particle update (material static dispatch) ---
        ct = pidx.shape[0]
        flat = lambda x: x.reshape((ct * tile,) + x.shape[2:])
        new_fields_flat, contrib = material.update(
            d_inv, dt, flat(amat), {k: flat(v) for k, v in fields.items()}
        )
        new_fields = {
            k: v.reshape((ct, tile) + v.shape[1:]) for k, v in new_fields_flat.items()
        }
        contrib = contrib.reshape(ct, tile, 3, 3)

        new_pos = pos + vel * dt

        # fused momentum matrix  Q = (A m - contrib dt_next) D^-1
        q = (amat * mass - contrib * next_dt) * d_inv

        # --- P2G at the advected position, same arena ---
        w2_, m2_, _, in_range = _bspline_onehot(cfg, new_pos, bcoord[:, None, :])
        ok = valid & in_range                               # drop escapees
        wx2, wy2, wz2 = w2_[..., 0, :], w2_[..., 1, :], w2_[..., 2, :]
        mx2, my2, mz2 = m2_[..., 0, :], m2_[..., 1, :], m2_[..., 2, :]

        s0 = jnp.concatenate(
            [jnp.full(vel.shape[:2] + (1,), mass, vel.dtype), mass * vel], axis=-1
        )                                                   # [C, tile, 4]
        zero = jnp.zeros(vel.shape[:2] + (1,), vel.dtype)
        s1 = jnp.concatenate([zero, q[..., :, 0]], axis=-1)
        s2 = jnp.concatenate([zero, q[..., :, 1]], axis=-1)
        s3 = jnp.concatenate([zero, q[..., :, 2]], axis=-1)

        okf = ok[..., None].astype(vel.dtype)
        ux = jnp.concatenate([wx2, mx2, wx2, wx2], axis=1)  # [C, 4*tile, 8]
        uy = jnp.concatenate([wy2, wy2, my2, wy2], axis=1)
        uz = jnp.concatenate([wz2, wz2, wz2, mz2], axis=1)
        svals = jnp.concatenate(
            [s0 * okf, s1 * okf, s2 * okf, s3 * okf], axis=1
        )                                                   # [C, 4*tile, 4]

        e = (ux[..., :, None] * uy[..., None, :]).reshape(ct, 4 * tile, 64)
        r = (uz[..., :, None] * svals[..., None, :]).reshape(ct, 4 * tile, 32)
        arena_out = jnp.einsum("tpe,tpf->tef", e, r)        # [C, 64, 32]
        arena_out = arena_out.reshape(ct, 8, 8, 8, 4)

        blocks = _scatter_layout(cfg, arena_out)            # [C, 8, 4, bv]
        carry = carry.at[nb_slot.reshape(-1)].add(
            blocks.reshape(ct * 8, 4, cfg.block_volume)
        )
        return carry, (new_pos, new_fields, ok)

    resh = lambda x: x.reshape((nchunks, tile_chunk) + x.shape[1:])
    next_pool, (new_pos, new_fields, ok) = jax.lax.scan(
        chunk,
        next_pool,
        (resh(tm.pidx), resh(tm.valid), resh(tm.bcoord), resh(tm.tvalid)),
    )
    # drop junk accumulated in the null block
    next_pool = next_pool.at[cfg.null_block].set(0.0)

    # --- write particle outputs back through the tile indirection ---
    p = pos_all.shape[0]
    flat_idx = jnp.where(ok, resh(tm.pidx), p).reshape(-1)  # OOB -> dropped
    pos_out = pos_all.at[flat_idx].set(
        new_pos.reshape(-1, 3), mode="drop"
    )
    fields_out = {}
    for k, v in fields_all.items():
        upd = new_fields[k].reshape((-1,) + v.shape[1:])
        fields_out[k] = v.at[flat_idx].set(upd, mode="drop")

    # particles that fell out of every tile (or escaped the arena) go inactive
    covered = jnp.zeros((p + 1,), jnp.bool_).at[flat_idx].set(True, mode="drop")[:p]
    active_out = model.active & covered

    new_model = ParticleModel(
        pos=pos_out, fields=fields_out, active=active_out, tiles=tm
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
    num_tiles, tile = tm.pidx.shape
    nchunks = num_tiles // tile_chunk
    mass = material.mass
    pos_all = model.pos

    def chunk(carry, inp):
        pidx, valid, bcoord, tvalid = inp
        ct = pidx.shape[0]
        nb_slot = part.lookup(
            cfg,
            table,
            bcoord[:, None, :]
            + jnp.stack(
                jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), axis=-1
            ).reshape(1, 8, 3),
        )
        nb_slot = jnp.where(tvalid[:, None], nb_slot, cfg.null_block)
        pos = pos_all[pidx]
        w, _, _, in_range = _bspline_onehot(cfg, pos, bcoord[:, None, :])
        ok = (valid & in_range)[..., None].astype(pos.dtype)
        wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
        svals = (
            jnp.concatenate(
                [jnp.full((ct, tile, 1), mass, pos.dtype),
                 jnp.broadcast_to(mass * v0, (ct, tile, 3))],
                axis=-1,
            )
            * ok
        )
        e = (wx[..., :, None] * wy[..., None, :]).reshape(ct, tile, 64)
        r = (wz[..., :, None] * svals[..., None, :]).reshape(ct, tile, 32)
        arena_out = jnp.einsum("tpe,tpf->tef", e, r).reshape(ct, 8, 8, 8, 4)
        blocks = _scatter_layout(cfg, arena_out)
        carry = carry.at[nb_slot.reshape(-1)].add(
            blocks.reshape(ct * 8, 4, cfg.block_volume)
        )
        return carry, None

    resh = lambda x: x.reshape((nchunks, tile_chunk) + x.shape[1:])
    pool, _ = jax.lax.scan(
        chunk, pool,
        (resh(tm.pidx), resh(tm.valid), resh(tm.bcoord), resh(tm.tvalid)),
    )
    return pool.at[cfg.null_block].set(0.0)
