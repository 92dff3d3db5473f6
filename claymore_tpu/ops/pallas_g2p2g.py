"""Pallas fused G2P2G kernel over the oct-packed grid pool.

The hot loop (reference: the fused CUDA kernel g2p2g,
Projects/GMPM/mgmpm_kernels.cuh:665-937) as a hand-scheduled TPU kernel.
Data movement follows docs/design_octpool.md:

* the grid pool stores 8 z-consecutive blocks per native (16, 128) tile
  (rows (c, cx), lanes (z8, cy, cz)) — fully dense, so the per-group grid
  fetch is ONE XLA row gather of 4 two-oct windows (measured 530 GB/s on
  v5e vs 15-150 GB/s for the round-2 padded per-block row gather);
* tiles come group-padded by the tile plan: tile // 8 identifies a group
  of tiles homed in one aligned 8-block z-oct, so a program's gather/
  scatter window set is static;
* in-kernel, per-block rectangles are placed with dynamic lane ROLLS
  (dynamic lane slicing does not lower in Mosaic — probed,
  scripts/prof_laneops.py): the two window rows are rolled by -z8*16 and
  merged with an iota select on the way in, and the P2G [32, 64] result —
  whose (bx, by, bz) 16x16 sub-rectangles are exactly oct-row (c,cx) x
  (cy,cz) rectangles — is rolled by +z8*16 into the group's output
  windows on the way out;
* P2G output windows accumulate across the group's tiles in VMEM and are
  scatter-added into the next pool as whole native rows (80 GB/s window
  rate; the round-2 block-row scatter ran at ~17 GB/s effective);
* no atomics anywhere; contraction over the particle axis on the MXU
  keeps the transfer bit-deterministic.

The caller-facing function mirrors core.transfer.g2p2g_model.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..models.materials import Material
from ..core.types import ParticleModel


def _dotp(cfg: SimConfig, a, b, precision: str | None = None,
          rhs_t: bool = False):
    """Matmul at the config's (or an overriding) precision.  Mosaic only
    implements the DEFAULT and HIGHEST dot precisions, so "high" (bf16x3,
    half the passes of HIGHEST at ~2^-21 relative error) is emulated with
    an explicit hi/lo split: a@b ~= ah@bh + ah@bl + al@bh.  On non-TPU
    backends (CPU interpret-mode tests) every precision is served by the
    native f32 dot: the hardware is exact there, and skipping the manual
    split keeps the oracle-equivalence suite bit-tight — unless
    cfg.force_mxu_split pins the split on (the CPU-testable knob for the
    bf16x3 + exact-mass interplay, VERDICT r4 weak #5).

    ``rhs_t``: b is [n, k]; contract dim 1 of BOTH operands, i.e. a @ b.T
    without materializing the transpose — the MXU streams the transposed
    operand, where an explicit ``b.T`` pays a VPU lane/sublane relayout."""
    p = precision or cfg.mxu_precision
    f32 = jnp.float32
    dn = (((1,), (1,)), ((), ())) if rhs_t else (((1,), (0,)), ((), ()))

    def d(x, y, prec=None):
        return jax.lax.dot_general(x, y, dimension_numbers=dn,
                                   preferred_element_type=f32,
                                   precision=prec)

    if p == "highest" or (jax.default_backend() != "tpu"
                          and not cfg.force_mxu_split):
        return d(a, b, jax.lax.Precision.HIGHEST)
    if p == "default":
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(f32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(f32)).astype(jnp.bfloat16)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _axis_weights(cfg: SimConfig, pos_ax, origin_ax, li_ax, dtype):
    """One-hot weight/moment rows for one axis: [8, tile] each
    (reference bspline_weight, utility_funcs.hpp:10-19)."""
    d = pos_ax * cfg.dx_inv - jnp.floor(pos_ax * cfg.dx_inv + 0.5) + 1.0
    w0 = 0.5 * (1.5 - d) ** 2
    w1 = 0.75 - (d - 1.0) ** 2
    w2 = 0.5 * (d - 0.5) ** 2
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (cfg.arena_cells, pos_ax.shape[1]), 0)
    w = (
        w0 * (iota == li_ax)
        + w1 * (iota == li_ax + 1)
        + w2 * (iota == li_ax + 2)
    ).astype(dtype)
    cell_x = (origin_ax + iota).astype(dtype) * cfg.dx
    m = w * (cell_x - pos_ax)
    return w, m


def group_window_indices(cfg: SimConfig, table: jnp.ndarray,
                         tile_key: jnp.ndarray) -> jnp.ndarray:
    """Per-group pool-row indices of the 4 neighbor-column / 2-oct windows:
    i32[G, 4, 2] (null_oct for dead groups / inactive positions — the null
    row is zeroed, so gathered garbage and scattered spill both vanish)."""
    from ..core import octpool

    g = cfg.grid_size
    gzo = cfg.grid_size_zo
    n3 = g * g * g
    gt = cfg.group_tiles
    ngroups = tile_key.shape[0] // gt
    gk = jnp.min(tile_key.reshape(ngroups, gt), axis=1)
    kc = jnp.minimum(gk, n3 - 1)
    bx = kc // (g * g)
    by = (kc // g) % g
    bzo = (kc % g) >> 3
    cols = []
    for dx in (0, 1):
        for dy in (0, 1):
            ws = []
            for w in (0, 1):
                x, y, zo = bx + dx, by + dy, bzo + w
                ok = (gk < n3) & (x < g) & (y < g) & (zo < gzo)
                okey = jnp.where(ok, (x * g + y) * gzo + zo, cfg.num_oct_keys)
                ws.append(table[okey])
            cols.append(jnp.stack(ws, axis=1))
    return jnp.stack(cols, axis=1).astype(jnp.int32)     # [G, 4, 2]


def _ablate() -> frozenset:
    """Timing-only kernel ablations (CLAYMORE_ABLATE=piece,piece,...).
    Each named piece is replaced by zeros so Mosaic DCEs it AND its
    exclusive producers — a coarse in-kernel compute map for the
    profilers (scripts/prof_kernel_ablate.py).  Physics is WRONG under
    any ablation; never set outside profiling."""
    import os

    return frozenset(
        p for p in os.environ.get("CLAYMORE_ABLATE", "").split(",") if p)


def _make_kernel(cfg: SimConfig, material: Material, tile: int,
                 field_widths: Tuple[Tuple[str, int], ...], chunk: int,
                 window_dma: bool = False):
    d_inv = cfg.d_inv
    mass = material.mass
    g = cfg.grid_size
    n3 = g * g * g
    cells = cfg.arena_cells                               # 8
    gt = cfg.group_tiles                                  # 8
    gpp = chunk // gt                                     # groups / program
    ablate = _ablate()

    # --- measured kernel micro-levers (defaults are the round-5 sweep
    # winners, PROF_LEVERS.json / docs/benchmarks.md round 5; the env
    # vars are subprocess A/B knobs for scripts/prof_levers.py) ---
    import os as _os
    # G2P dot precision override: the arena VALUES are already bf16
    # (storage quantization 2^-9), so a 1-pass DEFAULT dot only adds a
    # same-order 2^-8 truncation on the weight operand — and G2P carries
    # no conservation invariant (mass is P2G-side).  Config field is the
    # shipping control; the env var is the subprocess A/B knob.
    g2p_dot_prec = (_os.environ.get("CLAYMORE_G2P_DOT")
                    or cfg.g2p_dot_precision or None)
    # P2G dot via dot_general contracting dim 1 of both operands (a @ b.T
    # on the MXU, which streams the transposed operand for free) instead
    # of materializing f.T through a VPU lane/sublane relayout.  Same
    # contraction order, numerics-identical; measured 84.83 vs 90.68 ms
    # at 12M.  Default ON.
    p2g_dg = _os.environ.get("CLAYMORE_P2G_DG", "1") == "1"
    # 13 live P2G channels (mass + 3 momentum + 9 affine) vs the 16 the
    # round-4 layout padded with 3 always-zero rows (VERDICT r4 item 2):
    # drops 19% of the P2G dot's M rows.  Default 13.
    p2g_nch = int(_os.environ.get("CLAYMORE_P2G_CHANS", "13"))

    def kernel(*refs):
        if window_dma:
            # the (m, v) pool stays in HBM; each program's 4x2 window rows
            # arrive by double-buffered async copies issued one program
            # ahead (prefetch t+1 while computing t), so the gather rides
            # the DMA engines behind the transfer math instead of paying
            # an XLA gather + arena temp write + kernel re-read (measured
            # 665 GB/s DMA vs 530 GB/s gather, scripts/prof_dma.py) —
            # and dead programs skip their window fetches entirely.
            (key_ref, widx_ref, dt_ref, ndt_ref, _fd_ref, pool_ref,
             pos_ref, act_ref, *rest) = refs
            nf = len(field_widths)
            arena_scr, sems = rest[-2:]
            rest = rest[:-2]
        else:
            (key_ref, dt_ref, ndt_ref, _fd_ref, arena_ref,
             pos_ref, act_ref, *rest) = refs
            nf = len(field_widths)
        field_refs = rest[:nf]
        out_pos_ref, out_win_ref = rest[nf], rest[nf + 1]
        out_field_refs = rest[nf + 2 : nf + 2 + nf]
        out_act_ref = rest[nf + 2 + nf]

        t = pl.program_id(0)
        dtype = jnp.float32
        dt = dt_ref[0]
        next_dt = ndt_ref[0]
        keys = [key_ref[t * chunk + i] for i in range(chunk)]
        alive = keys[0] < n3
        for k in keys[1:]:
            alive = alive | (k < n3)

        if window_dma:
            n_prog = pl.num_programs(0)
            tcap = n_prog * chunk

            def _alive_of(p):
                a = None
                for i in range(chunk):
                    k = key_ref[jnp.minimum(p * chunk + i, tcap - 1)]
                    a = (k < n3) if a is None else a | (k < n3)
                return a

            def _window_copy(slot, prog, gi, col, w):
                idx = widx_ref[(prog * gpp + gi) * 8 + col * 2 + w]
                return pltpu.make_async_copy(
                    pool_ref.at[idx],
                    arena_scr.at[slot, gi, col, w],
                    sems.at[slot, gi, col, w],
                )

            def _galive_of(prog, gi):
                # any live tile in program ``prog``'s group ``gi``?  Group
                # padding intersperses fully-dead groups inside live macro
                # ranges; their 32 KB window fetches are pure waste (the
                # tiles that would read them are skipped, and their output
                # windows scatter into the absorbing null row).  Constant
                # in the keys, so start (prog t-1) and wait (prog t) agree.
                a = None
                for j in range(gt):
                    k = key_ref[jnp.minimum(prog * chunk + gi * gt + j,
                                            tcap - 1)]
                    a = (k < n3) if a is None else a | (k < n3)
                return a

            def _start_windows(slot, prog):
                for gi in range(gpp):
                    @pl.when(_galive_of(prog, gi))
                    def _(gi=gi):
                        for col in range(4):
                            for w in range(2):
                                _window_copy(slot, prog, gi, col, w).start()

            slot = jax.lax.rem(t, 2)
            nxt = jnp.minimum(t + 1, n_prog - 1)

            @pl.when((t == 0) & alive)
            def _():                        # warm-up: own windows
                _start_windows(0, 0)

            @pl.when((t + 1 < n_prog) & _alive_of(nxt))
            def _():                        # prefetch next program's windows
                _start_windows(jax.lax.rem(t + 1, 2), nxt)

        if window_dma:
            def read_window(gi, col, w):
                return arena_scr[slot, gi, col, w]

            def wait_windows():
                for gi in range(gpp):
                    @pl.when(_galive_of(t, gi))
                    def _(gi=gi):
                        for col in range(4):
                            for w in range(2):
                                _window_copy(slot, 0, gi, col, w).wait()
        else:
            def read_window(gi, col, w):
                return arena_ref[gi, col, w]

            def wait_windows():
                pass

        lane = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        # arena lane coordinate indices for the (by, bz, cy, cz) lane order
        lane64i = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
        lyi = (lane64i >> 5) * 4 + ((lane64i >> 2) & 3)
        lzi = ((lane64i >> 4) & 1) * 4 + (lane64i & 3)

        def _g2p_tile(i, pos, wins):
            """G2P for sub-tile i: velocity + affine-velocity columns.
            ``pos`` and the 4x2 window tiles ``wins`` are loaded by the
            caller OUTSIDE the liveness cond — Mosaic miscompiles sliced
            memref loads inside cond-with-results regions (probed on v5e,
            round 5)."""
            key = keys[i]
            gi = i // gt
            shift = (key & 7) * 16                        # z8 lane offset
            base = jnp.floor(pos * cfg.dx_inv + 0.5).astype(jnp.int32) - 1
            kc = jnp.minimum(key, n3 - 1)
            origin = jnp.stack(
                [kc // (g * g), (kc // g) % g, kc % g]
            )[:, None] * cfg.block_size
            rel = base - origin
            li = jnp.clip(rel, 0, cells - 3)
            in_range = jnp.all((rel >= 0) & (rel <= cells - 3), axis=0)

            ws, ms = [], []
            for ax in range(3):
                w, m = _axis_weights(
                    cfg, pos[ax][None, :],
                    origin[ax].astype(dtype)[None, :], li[ax][None, :], dtype,
                )
                ws.append(jnp.zeros_like(w) if "g2pw" in ablate else w)
                ms.append(jnp.zeros_like(m) if "g2pw" in ablate else m)
            (wx, wy, wz), (mx, my, mz) = ws, ms           # [8, tile]

            # --- assemble the [24, 64] arena: rows (bx, c, cx), lanes
            # (by, bz, cy, cz).  Each (bx, by) strip is two window rows
            # rolled by -z8*16 and merged at the oct seam. ---
            strips = []
            for dx in (0, 1):
                row_strips = []
                for dy in (0, 1):
                    col = dx * 2 + dy
                    # bf16 arenas widen at the load: storage quantization
                    # only (Mosaic's dynamic rotate is 32-bit only anyway)
                    a0 = wins[col][0].astype(dtype)
                    a1 = wins[col][1].astype(dtype)
                    r0 = pltpu.roll(a0, -shift, 1)
                    r1 = pltpu.roll(a1, -shift, 1)
                    merged = jnp.where(lane < 128 - shift, r0, r1)
                    row_strips.append(merged[4:16, :32])  # velocity rows
                strips.append(jnp.concatenate(row_strips, axis=1))
            vflat = jnp.concatenate(strips, axis=0)       # [24, 64]
            if "arena" in ablate:
                vflat = jnp.zeros((24, 64), dtype)


            # --- G2P: contract (y, z) jointly on the MXU, x on the VPU ---
            # weight rows in the block-factored (by, bz, cy, cz) lane order:
            # concat of per-(by, bz) slice outer products (Mosaic-legal)
            def yz(a, b):
                parts = []
                for byy in (0, 1):
                    for bzz in (0, 1):
                        pa = a[byy * 4:(byy + 1) * 4]
                        pb = b[bzz * 4:(bzz + 1) * 4]
                        parts.append(
                            (pa[:, None, :] * pb[None, :, :]).reshape(16, tile))
                return jnp.concatenate(parts, axis=0)     # [64, tile]

            wyz = yz(wy, wz)
            # y/z moments via the cell-coordinate identity
            # m_ax = w_ax * (cell_ax - p_ax): contract cell-scaled copies of
            # the arena stacked on the MXU's M axis (24 -> 72 of 128 rows,
            # which was idle) against ONE weight matrix, instead of three
            # weight variants stacked on N (3x the MXU passes + two extra
            # [64, tile] weight builds; measured win, round 3)
            ly = (lyi + origin[1]).astype(dtype) * cfg.dx
            lz = (lzi + origin[2]).astype(dtype) * cfg.dx
            a3 = jnp.concatenate([vflat, vflat * ly, vflat * lz], axis=0)
            gcat = _dotp(cfg, a3, wyz, precision=g2p_dot_prec)  # [72, tile]
            if "g2pdot" in ablate:
                gcat = jnp.zeros((72, tile), dtype)

            gres = gcat.reshape(3, 2, 3, 4, tile)
            g0 = gres[0]                                  # plain w*w
            wx_b = wx.reshape(2, 1, 4, tile)
            mx_b = mx.reshape(2, 1, 4, tile)
            vel = jnp.sum(g0 * wx_b, axis=(0, 2))         # [3, tile]
            col0 = jnp.sum(g0 * mx_b, axis=(0, 2))        # x-moment
            col1 = jnp.sum(gres[1] * wx_b, axis=(0, 2)) - pos[1][None] * vel
            col2 = jnp.sum(gres[2] * wx_b, axis=(0, 2)) - pos[2][None] * vel
            cols = (col0, col1, col2)
            a_soa = tuple(cols[c][r] for r in range(3) for c in range(3))
            return vel, a_soa, in_range.astype(dtype)

        def _p2g_tile(i, pos, vel, a_soa, in_range_f, contrib_i):
            """P2G for sub-tile i at the advected position, same arena.
            ``origin`` is recomputed from the key (3 scalar divs — cheaper
            than carrying an i32 vector through the liveness cond)."""
            key = keys[i]
            gi = i // gt
            shift = (key & 7) * 16
            kc = jnp.minimum(key, n3 - 1)
            origin = jnp.stack(
                [kc // (g * g), (kc // g) % g, kc % g]
            )[:, None] * cfg.block_size
            in_range = in_range_f > 0
            new_pos = pos + vel * dt
            out_pos_ref[:, i, :] = new_pos

            q = tuple(
                (av * mass - cv * next_dt) * d_inv
                for av, cv in zip(a_soa, contrib_i)
            )

            ly = (lyi + origin[1]).astype(dtype) * cfg.dx
            lz = (lzi + origin[2]).astype(dtype) * cfg.dx
            base2 = jnp.floor(new_pos * cfg.dx_inv + 0.5).astype(jnp.int32) - 1
            rel2 = base2 - origin
            li2 = jnp.clip(rel2, 0, cells - 3)
            in_range2 = jnp.all((rel2 >= 0) & (rel2 <= cells - 3), axis=0)
            tvf = key < n3
            ok = (act_ref[0, i, :] > 0) & in_range & in_range2 & tvf
            out_act_ref[0, i, :] = ok.astype(jnp.int32)

            ws2, ms2 = [], []
            for ax in range(3):
                w, m = _axis_weights(
                    cfg, new_pos[ax][None, :],
                    origin[ax].astype(dtype)[None, :], li2[ax][None, :], dtype,
                )
                ws2.append(jnp.zeros_like(w) if "p2gw" in ablate else w)
                ms2.append(jnp.zeros_like(m) if "p2gw" in ablate else m)
            (wx2, wy2, wz2), (mx2, my2, mz2) = ws2, ms2

            # --- one PURE-W matmul (K = tile, M = 128 fully used) via the
            # moment identity m_ax = w_ax * (cell_ax - p_ax): the APIC
            # momentum-matrix terms become output-coordinate scales of
            # plain-weight transfers.  Round 2 concatenated 4 source terms
            # on the contraction axis (K = 4*tile with M = 32 of 128 rows
            # used — 4x the MXU passes) plus two extra weight builds. ---
            okf = ok[None, :].astype(dtype)
            xp, yp, zp = new_pos[0], new_pos[1], new_pos[2]
            q1 = (q[0], q[3], q[6])                       # Q column 0 (x)
            q2 = (q[1], q[4], q[7])
            q3 = (q[2], q[5], q[8])
            chans = [jnp.full((tile,), mass, dtype)]
            for c3 in range(3):
                chans.append(vel[c3] * mass
                             - q1[c3] * xp - q2[c3] * yp - q3[c3] * zp)
            chans.extend(q1)
            chans.extend(q2)
            chans.extend(q3)
            if p2g_nch > 13:
                chans.extend([jnp.zeros((tile,), dtype)] * (p2g_nch - 13))
            nch = len(chans)
            sv = jnp.stack(chans, axis=0) * okf           # [nch, tile]

            # E rows (bx, ch, cx); F rows (by, bz, cy, cz)
            e_parts = []
            for dx in (0, 1):
                uxb = wx2[dx * 4:(dx + 1) * 4]
                e_parts.append(
                    (sv[:, None, :] * uxb[None, :, :]).reshape(4 * nch, tile))
            e = jnp.concatenate(e_parts, axis=0)          # [8*nch, tile]

            def yz2(a, b):
                parts = []
                for byy in (0, 1):
                    for bzz in (0, 1):
                        pa = a[byy * 4:(byy + 1) * 4]
                        pb = b[bzz * 4:(bzz + 1) * 4]
                        parts.append(
                            (pa[:, None, :] * pb[None, :, :]).reshape(16, tile))
                return jnp.concatenate(parts, axis=0)

            f = yz2(wy2, wz2)                             # [64, tile]
            if p2g_dg:
                a16 = _dotp(cfg, e, f, rhs_t=True)        # [8*nch, 64]
            else:
                a16 = _dotp(cfg, e, f.T)                  # [8*nch, 64]
            # Under reduced transfer precision the mass channel is re-done
            # in a more precise side dot: total grid mass is the
            # conservation invariant the health checks pin, while the
            # 2^-21 momentum/stress error of "high" is dwarfed by the bf16
            # arena storage quantization (2^-9) it composes with.
            # CLAYMORE_MASS_DOT is the measurement knob for this dot's
            # cost/accuracy point (highest | high | off); see
            # docs/benchmarks.md round 5 for the measured decision.
            import os as _os
            mass_mode = _os.environ.get("CLAYMORE_MASS_DOT", "highest")
            exact_mass = (cfg.mxu_precision != "highest"
                          and mass_mode != "off")
            if exact_mass:
                e_mass = jnp.concatenate(
                    [e[0:4], e[4 * nch : 4 * nch + 4]], axis=0)
                m8 = _dotp(cfg, e_mass, f if p2g_dg else f.T,
                           precision=mass_mode, rhs_t=p2g_dg)     # [8, 64]
            if "p2gdot" in ablate:
                a16 = jnp.zeros((8 * nch, 64), dtype)
                if exact_mass:
                    m8 = jnp.zeros((8, 64), dtype)


            # combine channels: out_c = W[mv'] + cellx(row) * W[q1] +
            # celly(lane) * W[q2] + cellz(lane) * W[q3]; mass row verbatim.
            # ly/lz are the arena lane coordinate scales from the G2P side;
            # cellx varies along the rect's cx rows.
            iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
            rects = []
            for dx in (0, 1):
                cxr = ((origin[0] + dx * 4 + iota4).astype(dtype) * cfg.dx)
                base_r = dx * 4 * nch
                rows = [m8[dx * 4 : (dx + 1) * 4] if exact_mass
                        else a16[base_r : base_r + 4]]    # mass
                for c3 in range(3):
                    a_v = a16[base_r + (1 + c3) * 4 : base_r + (2 + c3) * 4]
                    a_q1 = a16[base_r + (4 + c3) * 4 : base_r + (5 + c3) * 4]
                    a_q2 = a16[base_r + (7 + c3) * 4 : base_r + (8 + c3) * 4]
                    a_q3 = a16[base_r + (10 + c3) * 4 : base_r + (11 + c3) * 4]
                    rows.append(a_v + cxr * a_q1 + ly * a_q2 + lz * a_q3)
                rects.append(jnp.concatenate(rows, axis=0))
            aout = jnp.concatenate(rects, axis=0)         # [32, 64]

            # place each (bx, by) 16x32 rectangle into the group's output
            # window at lane offset z8*16 (roll; the part wrapping past lane
            # 128 belongs to the second window row)
            zeros96 = jnp.zeros((16, 96), dtype)
            if "p2gscatter" in ablate:
                aout = jnp.zeros_like(aout)
            for dx in (0, 1):
                for dy in (0, 1):
                    col = dx * 2 + dy
                    rect = aout[dx * 16:(dx + 1) * 16, dy * 32:(dy + 1) * 32]
                    padded = jnp.concatenate([rect, zeros96], axis=1)
                    r = pltpu.roll(padded, shift, 1)
                    m0 = lane >= shift
                    m1 = lane < shift - 96
                    out_win_ref[gi, col, 0] += jnp.where(m0, r, 0.0)
                    out_win_ref[gi, col, 1] += jnp.where(m1, r, 0.0)

        def _g2p_or_dead(i):
            """Per-tile G2P, optionally gated on the tile key behind a
            liveness cond (CLAYMORE_TILE_SKIP=1).  Group padding makes
            ~15-25% of tiles inside live macro ranges DEAD (key = n3);
            the cond replaces their weight build + MXU dot with a handful
            of zero materializations — but the round-5 sweep measured the
            cond STALLING Mosaic's software pipeline for more than the
            dead compute costs (PROF_LEVERS.json: noskip 76.55 vs skip
            78.95 ms at 12M/1.25-slack), so the default is unconditional
            compute.  Correctness never depends on the cond: a dead
            tile's G2P garbage (stale scratch windows, passthrough pos)
            is fully masked downstream — fields by the tvb where, P2G by
            the per-tile pl.when.  Mosaic cond-with-results is touchy
            (probed on v5e, round 5): no ref reads inside either region
            (pos and the group's window tiles load unconditionally out
            here) and every result a same-dtype f32 vector (mixed i32/i1
            results tripped layout-inference asserts)."""
            pos = pos_ref[:, i, :]                        # [3, tile]
            gi = i // gt
            wins = tuple(
                (read_window(gi, col, 0), read_window(gi, col, 1))
                for col in range(4)
            )

            def live():
                return _g2p_tile(i, pos, wins)

            def dead():
                return (jnp.zeros((3, tile), dtype),
                        tuple(jnp.zeros((tile,), dtype) for _ in range(9)),
                        jnp.zeros((tile,), dtype))

            import os as _os
            if _os.environ.get("CLAYMORE_TILE_SKIP", "0") == "1":
                vel, a_soa, in_range_f = jax.lax.cond(keys[i] < n3, live,
                                                      dead)
            else:
                vel, a_soa, in_range_f = live()
            return pos, vel, a_soa, in_range_f

        def _compute():
            wait_windows()
            out_win_ref[:] = jnp.zeros_like(out_win_ref)
            per_tile = [_g2p_or_dead(i) for i in range(chunk)]

            # --- material update, batched over the chunk: per-particle SoA
            # math (incl. the Jacobi/Givens SVD) runs on [chunk, tile]
            # components — ``chunk`` sublanes instead of 1, the VPU's (8, 128)
            # registers actually filled (measured 8x waste at [tile], rnd 2) ---
            a_batched = tuple(
                jnp.stack([per_tile[i][2][r] for i in range(chunk)], axis=0)
                for r in range(9)
            )
            fields = {}
            for (name, w_), ref in zip(field_widths, field_refs):
                fields[name] = ref[:] if w_ > 1 else ref[0]  # [.., chunk, tile]
            new_fields, contrib = material.update(d_inv, dt, a_batched, fields)
            if "material" in ablate:
                new_fields = fields
                contrib = tuple(jnp.zeros_like(c) for c in contrib)


            # dead sub-tiles keep their input fields (padding must be inert)
            # (i32 mask: Mosaic can't minor-dim-reshape 1-bit vectors)
            tvb = jnp.stack(
                [(k < n3).astype(jnp.int32) for k in keys], axis=0
            )[:, None] > 0                                        # [chunk, 1]
            for (name, w_), oref, iref in zip(field_widths, out_field_refs,
                                              field_refs):
                v = new_fields[name]
                old = iref[:] if w_ > 1 else iref[0]
                v = jnp.where(tvb if w_ == 1 else tvb[None], v, old)
                if w_ > 1:
                    oref[:] = v
                else:
                    oref[0] = v

            for i in range(chunk):
                pos, vel, a_soa, in_range_f = per_tile[i]
                contrib_i = tuple(c[i] for c in contrib)

                @pl.when(keys[i] < n3)
                def _(i=i, pos=pos, vel=vel, a_soa=a_soa,
                      in_range_f=in_range_f, contrib_i=contrib_i):
                    _p2g_tile(i, pos, vel, a_soa, in_range_f, contrib_i)

                @pl.when(jnp.logical_not(keys[i] < n3))
                def _(i=i):
                    # dead-tile passthrough (padding must be inert)
                    out_pos_ref[:, i, :] = pos_ref[:, i, :]
                    out_act_ref[0, i, :] = jnp.zeros((tile,), jnp.int32)

        def _dead_program():
            # all-padding program: no transfer work; outputs stay well-defined
            out_win_ref[:] = jnp.zeros_like(out_win_ref)
            out_act_ref[:] = jnp.zeros_like(out_act_ref)
            out_pos_ref[:] = pos_ref[:]
            for (_name, w_), oref, iref in zip(field_widths, out_field_refs,
                                               field_refs):
                oref[:] = iref[:]

        pl.when(alive)(_compute)
        pl.when(jnp.logical_not(alive))(_dead_program)

    return kernel


def g2p2g_pallas(
    cfg: SimConfig,
    material: Material,
    pool_v: jnp.ndarray,
    table: jnp.ndarray,
    model: ParticleModel,
    dt: jnp.ndarray,
    next_dt: jnp.ndarray,
    next_pool: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[ParticleModel, jnp.ndarray]:
    """Drop-in replacement for core.transfer.g2p2g_model on TPU."""
    import math as _math

    assert cfg.arena_span == 2, (
        "the oct-window Pallas path supports span-2 arenas only "
        "(rebucket_every <= 2); use the XLA backend for wider arenas"
    )
    tm = model.tiles
    num_tiles = tm.block.shape[0]
    tile = cfg.particle_tile
    gt = cfg.group_tiles
    # chunk must be a multiple of the group size and divide the tile count
    chunk = max(cfg.pallas_chunk, gt)
    if num_tiles % chunk != 0 or chunk % gt != 0:
        chunk = _math.gcd(num_tiles, 8 * 64)
        if chunk % gt != 0:
            chunk = num_tiles
    assert num_tiles % gt == 0, (num_tiles, gt)

    g = cfg.grid_size
    n3 = g * g * g
    tile_key = jnp.where(
        tm.tvalid,
        (tm.bcoord[0] * g + tm.bcoord[1]) * g + tm.bcoord[2],
        n3,
    ).astype(jnp.int32)

    field_widths = tuple(
        (k, v.shape[0] if v.ndim > 1 else 1) for k, v in model.fields.items()
    )
    # bf16 arenas ride the DMA path when the velocity pool is ALREADY bf16
    # (the grid kernel stored it quantized — engine.substep_impl wires
    # this); a bf16 request against an f32 pool falls back to the XLA
    # gather, the only place that can convert dtypes
    want_bf16 = cfg.g2p_arena_dtype == "bfloat16"
    window_dma = cfg.g2p_window_dma and (
        not want_bf16 or pool_v.dtype == jnp.bfloat16)
    kernel = _make_kernel(cfg, material, tile, field_widths, chunk,
                          window_dma=window_dma)

    # Large models run the gather -> kernel -> scatter pipeline over macro
    # chunks of tiles under lax.scan, bounding the [G, 4, 2, 16, 128]
    # window temporaries (64 KB per group).
    macro = num_tiles
    if num_tiles > cfg.pallas_macro_tiles:
        macro = max(chunk, (cfg.pallas_macro_tiles // chunk) * chunk)
    n_full = num_tiles // macro
    rem = num_tiles - n_full * macro           # rem % chunk == 0

    s_cap = model.pos.shape[1]
    gpp = chunk // gt

    def run_macro(mt, acc_pool, inp):
        """One pallas dispatch over ``mt`` tiles; carry = next pool."""
        keys_m, pos_m, act_m, fields_m = inp
        widx = group_window_indices(cfg, table, keys_m)    # [mg, 4, 2]
        mg = mt // gt
        n_prog = mt // chunk

        # Dead-tail stream clamp: group padding intersperses invalid tiles
        # INSIDE the live range (groups pad to 8 per oct), but beyond the
        # LAST live tile everything is dead capacity, so every program past
        # that tile's chunk maps its particle blocks to ONE common dead
        # chunk — Mosaic skips refetch/writeback while consecutive block
        # indices are equal, and never-written output blocks keep their
        # (aliased) input values, which is exactly the dead passthrough.
        # At 25M with 1.25x tile slack this removes ~20% of the particle
        # stream traffic per substep.
        last_live = jnp.max(jnp.where(
            keys_m < n3, jnp.arange(mt, dtype=jnp.int32), -1))
        fd = jnp.minimum((last_live + chunk) // chunk,
                         jnp.int32(max(n_prog - 1, 0))).reshape(1)

        smap = lambda t, *pref: (0, jnp.minimum(t, pref[-1][0]), 0)
        if window_dma:
            # pool stays in HBM; the kernel DMAs its window rows directly
            in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
            inputs = [pool_v]
        else:
            arenas_in = pool_v[widx]                       # [mg, 4, 2, 16, 128]
            if want_bf16 and arenas_in.dtype != jnp.bfloat16:
                # fuses into the gather: the arena temp is written and
                # kernel-read at half width; the f32 pool is untouched
                arenas_in = arenas_in.astype(jnp.bfloat16)
            in_specs = [
                pl.BlockSpec((gpp, 4, 2, 16, 128),
                             lambda t, *pref: (t, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            inputs = [arenas_in]
        in_specs += [
            pl.BlockSpec((3, chunk, tile), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, tile), smap, memory_space=pltpu.VMEM),
        ]
        inputs += [pos_m, act_m]
        for (k, w) in field_widths:
            in_specs.append(
                pl.BlockSpec((w, chunk, tile), smap, memory_space=pltpu.VMEM)
            )
            inputs.append(fields_m[k])

        out_shapes = [
            jax.ShapeDtypeStruct((3, mt, tile), jnp.float32),     # pos
            jax.ShapeDtypeStruct((mg, 4, 2, 16, 128), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((3, chunk, tile), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 4, 2, 16, 128), lambda t, *pref: (t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        for k, w in field_widths:
            out_shapes.append(jax.ShapeDtypeStruct((w, mt, tile), jnp.float32))
            out_specs.append(
                pl.BlockSpec((w, chunk, tile), smap, memory_space=pltpu.VMEM)
            )
        out_shapes.append(jax.ShapeDtypeStruct((1, mt, tile), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, chunk, tile), smap, memory_space=pltpu.VMEM)
        )

        nsp = 5 if window_dma else 4
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(mt // chunk,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=(
                [pltpu.VMEM((2, gpp, 4, 2, 16, 128), pool_v.dtype),
                 pltpu.SemaphoreType.DMA((2, gpp, 4, 2))]
                if window_dma else []
            ),
        )
        # particle streams update in place (identical in/out index maps:
        # block t is consumed before it is overwritten); without aliasing
        # XLA keeps inputs live across the call and doubles stream traffic
        nalias = len(field_widths)
        pos_op = nsp + 1                                  # pos operand index
        aliases = {pos_op: 0, pos_op + 1: 2 + nalias}     # pos, active
        for i in range(nalias):
            aliases[pos_op + 2 + i] = 2 + i
        scalars = [keys_m]
        if window_dma:
            scalars.append(widx.reshape(-1))
        scalars += [jnp.full((1,), 0.0, jnp.float32) + dt,
                    jnp.full((1,), 0.0, jnp.float32) + next_dt,
                    fd]                     # pref[-1]: dead-tail clamp chunk
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*scalars, *inputs)

        # window scatter-add of whole native rows (null row absorbs spill)
        acc_pool = acc_pool.at[widx.reshape(-1)].add(
            outs[1].reshape(-1, 16, 128))
        nf = len(field_widths)
        return acc_pool, (outs[0], tuple(outs[2 : 2 + nf]), outs[2 + nf])

    # tile-axis views [w, T, tile] and a slicer for [lo, lo+mt) tile ranges
    pos_v = model.pos.reshape(3, num_tiles, tile)
    act_v = model.active.astype(jnp.int32).reshape(1, num_tiles, tile)
    fields_v = {
        k: v.reshape(v.shape[0] if v.ndim > 1 else 1, num_tiles, tile)
        for k, v in model.fields.items()
    }

    def tile_slice(lo, mt):
        return (
            jax.lax.dynamic_slice_in_dim(tile_key, lo, mt, 0),
            jax.lax.dynamic_slice_in_dim(pos_v, lo, mt, 1),
            jax.lax.dynamic_slice_in_dim(act_v, lo, mt, 1),
            {k: jax.lax.dynamic_slice_in_dim(v, lo, mt, 1)
             for k, v in fields_v.items()},
        )

    if n_full * macro == num_tiles and n_full <= 1:
        # single-dispatch fast path: pass the reshape views directly —
        # tile_slice's dynamic_slices materialize full copies (~0.8 ms at
        # 1M in the device trace)
        acc, (pos_o, fields_o, act_o) = run_macro(
            num_tiles, next_pool, (tile_key, pos_v, act_v, fields_v))
        new_pos = pos_o.reshape(3, s_cap)
        new_field_arrays = list(fields_o)
        new_active = act_o.reshape(s_cap) > 0
    else:
        full = tile_slice(0, n_full * macro)
        xs = jax.tree.map(
            lambda x: jnp.moveaxis(
                x.reshape(x.shape[: -2] + (n_full, macro) + x.shape[-1:])
                if x.ndim == 3 else x.reshape(n_full, macro, *x.shape[1:]),
                x.ndim - 2 if x.ndim == 3 else 0, 0),
            full,
        )
        acc, (pos_s, fields_s, act_s) = jax.lax.scan(
            lambda c, i: run_macro(macro, c, i), next_pool, xs)
        new_pos = jnp.moveaxis(pos_s, 0, 1).reshape(3, -1)
        new_field_arrays = [jnp.moveaxis(a, 0, 1).reshape(a.shape[1], -1)
                            for a in fields_s]
        new_active = jnp.moveaxis(act_s, 0, 1).reshape(-1) > 0
        if rem:
            acc, (pos_r, fields_r, act_r) = run_macro(
                rem, acc, tile_slice(n_full * macro, rem))
            new_pos = jnp.concatenate(
                [new_pos, pos_r.reshape(3, -1)], axis=1)
            new_field_arrays = [
                jnp.concatenate([a, r.reshape(r.shape[0], -1)], axis=1)
                for a, r in zip(new_field_arrays, fields_r)
            ]
            new_active = jnp.concatenate(
                [new_active, act_r.reshape(-1) > 0])

    next_pool = acc.at[cfg.null_oct].set(0.0)

    fields_out = {}
    for (k, w), arr in zip(field_widths, new_field_arrays):
        fields_out[k] = arr.reshape(w, s_cap) if w > 1 else arr.reshape(s_cap)

    pid_out = jnp.where(new_active, model.pid, s_cap)
    new_model = model._replace(
        pos=new_pos, fields=fields_out, active=new_active, pid=pid_out
    )
    return new_model, next_pool
