"""Single-pass Pallas grid update.

TPU-native ``update_grid_velocity_query_max`` (reference
Projects/GMPM/mgmpm_kernels.cuh:326-420): momentum -> velocity, sticky
domain slab, gravity (after the clamp, matching the reference's order),
analytic collision objects, and the global max-|v|^2 CFL reduction — in
ONE pass over the oct pool.

The XLA formulation (core/grid.py) lowers to ~6 elementwise passes over
the [O+1, 16, 128] pool plus materialized temporaries (measured 14.7 ms
at 65k octs on v5e = ~150 GB/s effective); this kernel reads the pool
once and writes it once (~1.07 GB -> HBM-roofline ~1.6 ms), with a
per-program partial max reduced by one tiny jnp.max outside.

Analytic colliders (half-space / sphere / box, incl. animated rigid
motion) are branch-free VPU math and run inside the kernel via their
``resolve_soa`` component form — the reference likewise resolves
collisions inside its grid-velocity kernel (MGSP/mgmpm_kernels.cuh:363).
Only the SDF-grid collider needs gathers (no Mosaic lowering); scenes
using it keep the XLA path (engine gates on ``pallas_ok``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..core.types import Partition
from ..core.octpool import oct_coord

_ROWS = 128           # oct rows per program (: 128*16*128*4 = 1 MB in VMEM)


def _make_kernel(cfg: SimConfig, total: int, rows: int, colliders=(),
                 cached_specs=()):
    g = cfg.grid_size
    b = cfg.bound_blocks
    bs = cfg.block_size
    gx, gy, gz = (float(v) for v in cfg.gravity)

    def kernel(sc_ref, pool_ref, bx_ref, by_ref, bzo_ref, *rest):
        sdf_refs = rest[: len(cached_specs)]
        out_ref, max_ref = rest[len(cached_specs):]
        i = pl.program_id(0)
        blk = pool_ref[...]                                # [R, 16, 128]
        m = blk[:, 0:4]                                    # [R, 4, 128]
        has = m > 0.0
        minv = jnp.where(has, 1.0 / jnp.where(has, m, 1.0), 0.0)
        dt = sc_ref[0, 0]
        t = sc_ref[0, 1]

        # sticky-slab keep masks (reference is_in_bound bitmask,
        # mgmpm_kernels.cuh:339-371): x/y vary per oct row, z per lane
        def near(c):
            return (c < b) | (c >= g - b)

        kx = jnp.logical_not(near(bx_ref[...]))[:, :, None]    # [R,1,1]
        ky = jnp.logical_not(near(by_ref[...]))[:, :, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        bz = bzo_ref[...][:, None, :] * 8 + (lane >> 4)[None]  # [R,1,128]
        kz = jnp.logical_not(near(bz))

        vs = []
        for c, keep, gacc in ((0, kx, gx), (1, ky, gy), (2, kz, gz)):
            v = blk[:, 4 + 4 * c : 8 + 4 * c] * minv
            v = jnp.where(keep, v, 0.0) + gacc * dt        # gravity AFTER clamp
            vs.append(v)

        if colliders:
            # world cell positions: rows are (c, cx) so the channel view's
            # sub-row is cx; lanes are (z8, cy, cz)
            cxi = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 1), 1)
            cy = (lane >> 2) & 3
            cz = lane & 3
            xw = ((bx_ref[...][:, :, None] * bs + cxi).astype(jnp.float32)
                  * cfg.dx)
            yw = ((by_ref[...][:, :, None] * bs + cy[None]).astype(jnp.float32)
                  * cfg.dx)
            zw = ((bz * bs + cz[None]).astype(jnp.float32) * cfg.dx)
            shape = vs[0].shape
            x3 = tuple(jnp.broadcast_to(a, shape) for a in (xw, yw, zw))
            v3 = tuple(vs)
            for col in colliders:
                v3 = col.resolve_soa(x3, v3, t)
            vs = list(v3)

        if cached_specs:
            # pre-sampled SDF colliders (VERDICT r4 item 7): each ref holds
            # this program's active rows of the per-cell (sd, n) cache in
            # the pool layout — the gather happened outside the kernel as
            # one row gather; here it is pure elementwise projection, the
            # same math the reference runs in-kernel per trilinear fetch
            # (MGSP/mgmpm_kernels.cuh:363, boundary_condition.cuh:159-249).
            from ..models.boundary import _project_soa

            for (kind, friction), sref in zip(cached_specs, sdf_refs):
                srow = sref[...].astype(jnp.float32)       # [R, 16, 128]
                sd = srow[:, 0:4]
                n3v = (srow[:, 4:8], srow[:, 8:12], srow[:, 12:16])
                hit = sd <= 0.0
                proj = _project_soa(tuple(vs), n3v, kind, friction)
                vs = [jnp.where(hit, p, v) for p, v in zip(proj, vs)]

        vs = [jnp.where(has, v, 0.0) for v in vs]

        od = out_ref.dtype
        out_ref[:, 0:4] = m.astype(od)
        out_ref[:, 4:8] = vs[0].astype(od)
        out_ref[:, 8:12] = vs[1].astype(od)
        out_ref[:, 12:16] = vs[2].astype(od)

        vsq = vs[0] * vs[0] + vs[1] * vs[1] + vs[2] * vs[2]
        vsq = jnp.where(jnp.isnan(vsq), jnp.inf, vsq)      # NaN poisons dt
        # ragged final program: padding rows read garbage — mask them out
        # of the reduction (their writes are dropped by pallas)
        ridx = i * rows + jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1, 1), 0)
        vsq = jnp.where(has & (ridx < total), vsq, 0.0)
        # per-program partial max as a broadcast (8,128) tile: the compiled
        # Mosaic path rejects (1,1)-blocked SMEM outputs
        max_ref[...] = jnp.full((1, 8, 128), jnp.max(vsq), jnp.float32)

    return kernel


def grid_update_pallas(
    cfg: SimConfig,
    pool: jnp.ndarray,
    partition: Partition,
    dt: jnp.ndarray,
    colliders: Sequence = (),
    collider_time: jnp.ndarray | None = None,
    interpret: bool = False,
    out_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, mom) pool -> (m, v) pool and max |v|^2 (oct layout, one pass).

    ``out_dtype`` (default: the input pool's dtype) lets the velocity pool
    quantize at the store — with bf16 G2P arenas under the in-kernel DMA
    window path, storing the pool itself in bf16 halves the window DMA
    traffic with exactly the same rounding the gather path applied (the
    CFL max and all in-kernel math stay f32; the P2G accumulation pool is
    a separate f32 buffer, so conservation is untouched).

    Colliders split three ways: analytic ones (``resolve_soa``) run as
    in-kernel VPU math; static SDF-grid colliders run from a pre-sampled
    per-cell cache (``build_oct_cache``) gathered per active row outside
    the kernel; anything else must take the XLA path (the engine gates)."""
    soa_cols, cached = [], []
    for c in colliders:
        if getattr(c, "pallas_ok", False):
            soa_cols.append(c)
        elif hasattr(c, "oct_cache_ok") and c.oct_cache_ok(cfg):
            cached.append(c)
        else:
            raise AssertionError(
                f"{type(c).__name__} has neither an in-kernel (resolve_soa)"
                " form nor a static oct cache; it needs the XLA path"
            )
    o1 = pool.shape[0]
    rows = min(_ROWS, o1)
    n_prog = -(-o1 // rows)                               # ceil
    bx, by, bzo = oct_coord(
        cfg, jnp.minimum(partition.keys, cfg.num_oct_keys - 1))
    # null row -> coord 0 (inside the sticky bound: v zeroed, like the XLA
    # path's appended zero coords)
    z1 = jnp.zeros((1,), jnp.int32)
    cols = [jnp.concatenate([a.astype(jnp.int32), z1])[:, None]
            for a in (bx, by, bzo)]                       # [O+1, 1] each

    # active rows of each cached SDF field (one row gather per substep;
    # key sentinel -> the cache's no-hit row)
    nok = cfg.num_oct_keys
    keys_pad = jnp.concatenate(
        [jnp.minimum(partition.keys, nok), jnp.full((1,), nok, jnp.int32)])
    sdf_rows = [c.build_oct_cache(cfg)[keys_pad] for c in cached]

    cached_specs = tuple((c.kind, c.friction) for c in cached)
    kernel = _make_kernel(cfg, o1, rows, tuple(soa_cols), cached_specs)
    row_spec = pl.BlockSpec((rows, 16, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t = collider_time if collider_time is not None else jnp.float32(0.0)
    scalars = jnp.stack([dt.astype(jnp.float32),
                         jnp.asarray(t, jnp.float32)]).reshape(1, 2)
    pool_v, maxes = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec, col_spec, col_spec, col_spec,
        ] + [row_spec] * len(sdf_rows),
        out_specs=[
            row_spec,
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(pool.shape, out_dtype or pool.dtype),
            jax.ShapeDtypeStruct((n_prog, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, pool, *cols, *sdf_rows)
    return pool_v, jnp.max(maxes)


def kernel_colliders_ok(cfg: SimConfig, colliders) -> bool:
    """True when EVERY collider can ride the Pallas grid kernel — either
    analytic in-kernel math or a static pre-sampled SDF cache."""
    return all(
        getattr(c, "pallas_ok", False)
        or (hasattr(c, "oct_cache_ok") and c.oct_cache_ok(cfg))
        for c in colliders
    )
