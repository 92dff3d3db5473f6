"""Multi-chip spatial domain decomposition over a JAX device mesh.

TPU-native redesign of the reference's MGSP multi-GPU pipeline
(reference: Projects/MGSP/mgsp_benchmark.cuh:28-777).  The mapping:

* one ``std::thread`` + CUDA context per GPU with fork-join queues
  (mgsp_benchmark.cuh:309-356)          -> SPMD ``shard_map`` over a 1-D
  ``jax.sharding.Mesh`` axis; the scheduler disappears.
* ``halo_tagging`` blockid-list exchange + ``cudaMemcpyPeerAsync`` halo
  packing (mgsp_benchmark.cuh:661-776, halo_buffer.cuh:54-63) -> one
  symmetric ``lax.ppermute`` of fixed-shape dense *halo windows*: the
  2*margin block layers around each slab boundary.  Because each shard adds
  only the *neighbor's* contribution into its own pool, every overlapping
  block ends up with the global sum on all owners — exactly the reference's
  collect/reduce semantics, but static-shaped and deterministic.
* host-side global max-vel reduction (mgsp_benchmark.cuh:410-416)
  -> ``lax.pmax`` on device.
* static geometric particle assignment (``get_domain``, MGSP/settings.h:69-93)
  -> slab assignment along the mesh axis at init, PLUS per-substep particle
  *migration* via fixed-capacity ``ppermute`` buffers (the reference ships
  vestigial, unused migration kernels, halo_kernels.cuh:100-130; here it is
  implemented, keeping each shard's working set inside its halo margin).

Each shard holds a full-domain index table and runs the identical
single-chip substep; only the three comm hooks differ.  Grid coordinates
are global everywhere, so boundary conditions and collision objects work
unchanged.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..core import engine as engine_mod
from ..core import partition as part
from ..core.types import ParticleModel, SimState
from ..models.materials import Material

# Jitted sharded programs (and their HaloComm) shared across engine
# instances with equal static parameters — the same dedup as
# engine._entry_points: CI equivalence tests build several identical
# MultiChipEngines and each sharded substep compile is ~10-20 s on a
# 1-core box.  Keyed on hashables only (frozen dataclasses, Mesh, ints).
_SHARED: dict = {}


def _shared(key, build):
    try:
        hash(key)
    except TypeError:      # e.g. an SDF-grid collider holding arrays
        return build()
    fn = _SHARED.get(key)
    if fn is None:
        fn = _SHARED[key] = build()
    return fn


class HaloComm:
    """Per-shard communication hooks used inside shard_map.

    ``axes`` maps mesh axis names to decomposed spatial dimensions:
    1-D x-slabs = (("x", 0),); the reference's 4-GPU 2x2 (x, z) box split
    (reference MGSP/settings.h:78-88, partition_domain.h:27-70) =
    (("x", 0), ("z", 2)).  Corner (diagonal) halo flow is handled by
    chaining ppermutes along both axes.
    """

    def __init__(self, cfg: SimConfig, axes, mesh_shape, margin: int,
                 mig_cap: int, halo_capacity: Optional[int] = None,
                 overlap: bool = True):
        self.cfg = cfg
        self.axes = tuple(axes)          # ((mesh_axis_name, spatial_dim), ...)
        self.mesh_shape = tuple(mesh_shape)
        self.margin = margin
        self.mig_cap = mig_cap
        # Axes of extent 1 carry no neighbors: a ppermute along them has an
        # EMPTY permutation (= writes zeros), so every pack/mask/scatter
        # feeding it is pure waste — at mesh (1,) that machinery alone cost
        # 34.8% of per-chip throughput (MULTICHIP_PERF r4; VERDICT r4 weak
        # #2).  All comm hooks below statically skip size-1 axes; a fully
        # trivial mesh degrades to the exact single-chip pipeline under the
        # shard_map wrapper.
        self.live_axes = tuple(a for a, n in enumerate(self.mesh_shape)
                               if n > 1)
        self.trivial = not self.live_axes
        # boundary/interior transfer split (engine gates on defrag_every)
        self.overlap = overlap and not self.trivial
        self.slabs = []
        for n in self.mesh_shape:
            assert cfg.grid_size % n == 0, (cfg.grid_size, n)
            self.slabs.append(cfg.grid_size // n)
        if halo_capacity is None:
            # derived default: a direction's window is ~2*margin of the
            # slab's block layers, so at most ~2m/slab of the shard's
            # active octs (x4 safety for uneven occupancy, floor 512).
            # Overflow is counted loudly (SimState.halo_overflow), so a
            # pathological scene degrades visibly, not silently.  Round 2
            # shipped full-pool buffers per direction — 8 ppermutes of
            # max_active_blocks rows per substep at the 100M config.
            min_slab = min(self.slabs)
            frac = min(1.0, 2.0 * margin / max(min_slab, 1))
            halo_capacity = min(
                cfg.max_active_octs,
                max(512, int(4.0 * frac * cfg.max_active_octs)),
            )
        self.halo_capacity = halo_capacity

    # -- mesh geometry -------------------------------------------------
    def _bounds(self, a: int):
        """(index, lo, hi) of this shard's block-range on decomposed axis a."""
        i = jax.lax.axis_index(self.axes[a][0])
        lo = i * self.slabs[a]
        return i, lo, lo + self.slabs[a]

    def _spatial_coord(self, keys, a: int):
        """Coordinate range of flat OCT keys along decomposed axis a:
        returns (lo, hi) block coords covered by each oct (hi exclusive).
        Octs are single blocks in x/y and 8-block runs in z."""
        from ..core.octpool import oct_coord

        dim = self.axes[a][1]
        bx, by, bzo = oct_coord(self.cfg, jnp.minimum(
            keys, self.cfg.num_oct_keys - 1))
        if dim == 0:
            return bx, bx + 1
        if dim == 1:
            return by, by + 1
        return bzo * 8, bzo * 8 + 8

    def _shift(self, x, a: int, step: int):
        """ppermute x by ``step`` shards along decomposed axis a."""
        n = self.mesh_shape[a]
        perm = [(k, k + step) for k in range(n) if 0 <= k + step < n]
        return jax.lax.ppermute(x, self.axes[a][0], perm)

    # -- reductions ----------------------------------------------------
    def reduce_max(self, x):
        for a in self.live_axes:
            x = jax.lax.pmax(x, self.axes[a][0])
        return x

    # -- boundary/interior transfer split --------------------------------
    # The reference runs g2p2g over halo blocks first, fires the peer
    # copies, and hides them behind interior g2p2g
    # (mgsp_benchmark.cuh:439-464).  Here the tile plan sorts boundary-oct
    # tiles into a static prefix (sort_permute's region_fn), the transfer
    # runs in two dispatches, and the payload ppermute is issued between
    # them so XLA's async collectives overlap it with the interior dispatch.

    def is_boundary_key(self, keys):
        """bool[...] over flat BLOCK keys: could a tile homed at this block
        scatter into any shipped halo window?  Conservative per home OCT
        (drift-proof: the P2G arena is anchored at the home block, so the
        scatter reach [b, b+1] blocks — [oct, oct+8] along z — is fixed
        between rebuilds)."""
        cfg = self.cfg
        g = cfg.grid_size
        m = self.margin
        bound = jnp.zeros(keys.shape, bool)
        for a in self.live_axes:
            _name, dim = self.axes[a]
            if dim == 0:
                c = keys // (g * g)
                reach_lo, reach_hi = 0, 1          # scatter [c, c+1]
            else:                                  # dim == 2: z-oct runs
                c = (keys % g) & ~7
                reach_lo, reach_hi = 0, 8          # scatter [c, c+8]
            _, lo, hi = self._bounds(a)
            # left window [lo, lo+m): writers c+reach_hi-1 >= lo is implied
            # for resident tiles; drifted tiles (c < lo) are included too
            bound = bound | (c < lo + m)
            # right window [hi-m, hi): writers reach c+reach_hi >= hi-m
            bound = bound | (c + reach_hi >= hi - m)
        return bound

    def boundary_tile_cap(self, num_tiles: int, multiple: int) -> int:
        """Static prefix capacity for boundary tiles, same philosophy as
        halo_capacity: geometric fraction x4 safety, loud overflow."""
        frac = 0.0
        for a in self.live_axes:
            reach = 1 if self.axes[a][1] == 0 else 8
            frac += min(1.0, (2.0 * self.margin + reach) / self.slabs[a])
        cap = int(4.0 * min(frac, 1.0) * num_tiles)
        cap = max(cap, 4 * multiple)
        cap = -(-cap // multiple) * multiple
        return min(cap, num_tiles)

    # -- packed halo exchange -------------------------------------------
    # The reference exchanges only *active* halo blocks: halo_tagging
    # blockid-list exchange -> collect_halo_grid_blocks pack -> peer copy ->
    # atomicAdd reduce (reference mgsp_benchmark.cuh:661-776,
    # halo_buffer.cuh:54-63, halo_kernels.cuh:22-97).  Here the same protocol
    # in static shapes: each shard packs (keys, pool rows) of its active
    # blocks inside the boundary window into a fixed-capacity buffer and
    # ppermutes it; the receiver scatter-adds by table lookup.  Payload size
    # is halo_capacity blocks — independent of the grid cross-section G^2
    # (the dense-window formulation shipped 2m*G^2 blocks per neighbor,
    # 134 MB/substep at 1024^3 — unusable at the 100M-particle target).

    def _directions(self):
        """All nonzero neighbor offsets over the decomposed axes: 2 for a
        1-D split, 8 (4 sides + 4 corners) for the 2-D (x, z) split.
        Size-1 axes have no neighbors and are pinned to step 0 (their
        ppermutes would be empty-permutation zero-writes)."""
        dirs = []
        steps = [(-1, 0, 1) if n > 1 else (0,) for n in self.mesh_shape]
        import itertools
        for d in itertools.product(*steps):
            if any(d):
                dirs.append(d)
        return dirs

    def _pack_window(self, pool, partition, cond_extra, lane_ok):
        """Pack (keys, rows) of my active octs where cond_extra holds.

        ``lane_ok(keys)`` -> bool[H?, 128] masks each oct row's lanes to the
        blocks actually inside the exchange window, so interior mass of an
        oct straddling the window boundary is never shipped (the block-level
        exchange semantics of round 2, at oct-row granularity)."""
        cfg = self.cfg
        no = cfg.num_oct_keys
        nb = cfg.max_active_octs
        h = self.halo_capacity
        keys = partition.keys
        live = (jnp.arange(nb) < partition.count) & (keys < no)
        cond = live & cond_extra
        (idx,) = jnp.nonzero(cond, size=h, fill_value=nb)
        valid = idx < nb
        overflow = (jnp.sum(cond, dtype=jnp.int32)
                    - jnp.sum(valid, dtype=jnp.int32)).reshape(1)
        gidx = jnp.minimum(idx, nb - 1)
        k = jnp.where(valid, keys[gidx], no).astype(jnp.int32)
        mask = valid[:, None] & lane_ok(k)
        rows = pool[gidx] * mask[:, None, :].astype(pool.dtype)
        # per-block (z8) mass bits of the masked row, packed into one i32
        has = jnp.any(
            rows[:, 0:4].reshape(h, 4, 8, 16) != 0.0, axis=(1, 3))
        bits = jnp.sum(
            has.astype(jnp.int32) << jnp.arange(8, dtype=jnp.int32)[None, :],
            axis=1).astype(jnp.int32)
        return k, bits, rows, overflow

    def exchange_halo(self, pool, partition):
        """Pack each neighbor-facing boundary window and ship it with (a
        chain of) ppermutes; returns the received packed contributions plus
        my total pack overflow.

        The exchange is SPLIT so the payload transfer can hide behind the
        partition rebuild (the reference overlaps peer copies with interior
        g2p2g on spare streams, mgsp_benchmark.cuh:439-464): the partition
        rebuild only needs each received oct's key + per-block mass BITS —
        a few bytes per row — while the 8 KB row payloads are consumed by
        add_halo strictly after the rebuild.  Shipping (keys, massbits)
        and rows as separate ppermutes leaves XLA's async collectives free
        to run the payload permute concurrently with the rebuild chain."""
        m = self.margin
        keys = partition.keys
        bounds = [self._bounds(a) for a in range(len(self.axes))]
        lane_bz = jnp.arange(128, dtype=jnp.int32) >> 4      # z8 per lane
        received = []
        overflow = jnp.zeros((1,), jnp.int32)
        for d in self._directions():
            cond = jnp.ones_like(keys, dtype=bool)
            win = []
            for a, step in enumerate(d):
                if step == 0:
                    continue
                clo, chi = self._spatial_coord(keys, a)
                _, lo, hi = bounds[a]
                edge = hi if step > 0 else lo
                # oct intersects the [edge-m, edge+m) window
                cond = cond & (chi > edge - m) & (clo < edge + m)
                if self.axes[a][1] == 2:
                    win.append((a, edge))

            def lane_ok(k, win=win, bounds=bounds):
                ok = jnp.ones((k.shape[0], 128), bool)
                if win:
                    from ..core.octpool import oct_coord
                    _, _, bzo = oct_coord(self.cfg, jnp.minimum(
                        k, self.cfg.num_oct_keys - 1))
                    bz = bzo[:, None] * 8 + lane_bz[None, :]
                    for a, edge in win:
                        ok = ok & (bz >= edge - m) & (bz < edge + m)
                return ok

            k, bits, rows, of = self._pack_window(pool, partition, cond,
                                                  lane_ok)
            overflow = overflow + of
            meta = (k, bits)
            payload = rows
            for a, step in enumerate(d):
                if step:
                    meta = jax.tree.map(lambda x: self._shift(x, a, step),
                                        meta)
                    payload = self._shift(payload, a, step)
            received.append((meta[0], meta[1], payload))
        return (received, overflow)

    def halo_mass_mask(self, slabs):
        """Blocks where a neighbor contributed mass -> keep them active
        (block-level mask consumed by partition.rebuild's extra_mask)."""
        from ..core import octpool

        cfg = self.cfg
        n3 = cfg.grid_size ** 3
        if not slabs[0]:                 # trivial mesh: nothing received
            return None
        mask = jnp.zeros((n3,), jnp.bool_)
        for keys, bits, _rows in slabs[0]:
            has = (bits[:, None]
                   >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1 > 0
            bkeys = octpool.oct_block_keys(cfg, keys)        # [H, 8]
            mask = mask.at[jnp.minimum(bkeys, n3 - 1)].max(
                has & (bkeys < n3))
        return mask

    def add_halo(self, pool, partition, slabs):
        """Sum neighbor contributions into my (rebuilt) pool.  Blocks I do
        not have active fall into the null row (they carry no mass for me by
        construction: the mass mask activated every massy received block)."""
        no = self.cfg.num_oct_keys
        if not slabs[0]:                 # trivial mesh: nothing received
            return pool
        for keys, _bits, rows in slabs[0]:
            slots = partition.table[jnp.minimum(keys, no)]
            slots = jnp.where(keys < no, slots, self.cfg.null_oct)
            pool = pool.at[slots].add(rows)
        return pool.at[self.cfg.null_oct].set(0.0)

    # -- particle migration -------------------------------------------
    def migrate(self, models: List[ParticleModel], materials, enable=True):
        """Ship slab-crossing particles to their neighbor shard.

        Returns (models, dropped) with ``dropped`` an i32[1] count of
        particles LOST this substep: senders beyond ``migration_capacity``
        (which would keep simulating on the wrong shard and can scatter
        outside the halo window) and received particles with no free
        destination lane.  The caller accumulates it into
        ``SimState.mig_dropped`` so the loss is loud (reference analogue:
        the capacity aborts, gmpm_simulator.cuh:473-476).
        """
        cfg = self.cfg
        k = self.mig_cap
        if isinstance(enable, bool):
            enable = jnp.bool_(enable)
        out = []
        dropped = jnp.zeros((1,), jnp.int32)
        for model in models:
            p = model.pos.shape[1]
            pos, fields, pid = model.pos, dict(model.fields), model.pid
            active = model.active
            # one axis at a time: corner crossers move diagonally within a
            # single call via two hops (x then z); size-1 axes have no
            # neighbor to ship to (particles can't leave a full-domain slab)
            for a in self.live_axes:
                dim = self.axes[a][1]
                _, lo, hi = self._bounds(a)

                # The pack (nonzero compactions + payload gathers) and the
                # place (free-lane search + minor-dim scatters) are
                # lax.cond-gated: unconditional, their index machinery cost
                # ~80 ms/substep at 1M on TPU (minor-dim scatter serializes
                # on the scalar path) even with an all-false mask — 10x the
                # whole single-chip substep.  Only the ppermutes between the
                # conds run every substep (collectives must stay congruent
                # across shards: ``enable`` is the shard-LOCAL rebuild
                # predicate, so a neighbor may send while we skip — receive
                # placement therefore gates on what actually arrived, never
                # on our own predicate).
                def _pack(pos, active, pid, fields, lo=lo, hi=hi, dim=dim):
                    hb = part.home_block(cfg, pos)[dim]
                    pls, drops = [], jnp.zeros((1,), jnp.int32)
                    for cond in (active & (hb < lo), active & (hb >= hi)):
                        (idx,) = jnp.nonzero(cond, size=k, fill_value=p)
                        valid = idx < p
                        # senders beyond capacity stay resident on the wrong
                        # shard: deactivate AND count them (they must not
                        # keep scattering)
                        want = jnp.sum(cond, dtype=jnp.int32)
                        got = jnp.sum(valid, dtype=jnp.int32)
                        drops = drops + (want - got).reshape(1)
                        gidx = jnp.minimum(idx, p - 1)
                        pls.append({
                            "pos": pos[:, gidx],
                            "valid": valid,
                            "pid": pid[gidx],
                            **{f: v[..., gidx] for f, v in fields.items()},
                        })
                        # deactivate every lane that wants to leave (shipped
                        # or not — unshipped crossers are counted above)
                        active = active & ~cond
                    return pls[0], pls[1], active, drops

                def _pack_skip(pos, active, pid, fields):
                    z = {
                        "pos": jnp.zeros((3, k), pos.dtype),
                        "valid": jnp.zeros((k,), bool),
                        "pid": jnp.zeros((k,), pid.dtype),
                        **{f: jnp.zeros(v.shape[:-1] + (k,), v.dtype)
                           for f, v in fields.items()},
                    }
                    return z, dict(z), active, jnp.zeros((1,), jnp.int32)

                pl_l, pl_r, active, dr = jax.lax.cond(
                    enable, _pack, _pack_skip, pos, active, pid, fields)
                dropped = dropped + dr
                rvs = (jax.tree.map(lambda x: self._shift(x, a, -1), pl_l),
                       jax.tree.map(lambda x: self._shift(x, a, +1), pl_r))

                def _place(pos, active, pid, fields, rvs=rvs):
                    drops = jnp.zeros((1,), jnp.int32)
                    for rv in rvs:
                        (free,) = jnp.nonzero(~active, size=k, fill_value=p)
                        ok = rv["valid"] & (free < p)
                        # received-but-unplaced particles are lost: count
                        drops = drops + jnp.sum(
                            rv["valid"] & (free >= p), dtype=jnp.int32
                        ).reshape(1)
                        tgt = jnp.where(ok, free, p)
                        pos = pos.at[:, tgt].set(rv["pos"], mode="drop")
                        pid = pid.at[tgt].set(rv["pid"], mode="drop")
                        for f in fields:
                            fields[f] = fields[f].at[..., tgt].set(
                                rv[f], mode="drop")
                        active = active.at[tgt].set(True, mode="drop")
                    return pos, active, pid, fields, drops

                def _place_skip(pos, active, pid, fields):
                    return (pos, active, pid, fields,
                            jnp.zeros((1,), jnp.int32))

                has_rx = jnp.any(rvs[0]["valid"]) | jnp.any(rvs[1]["valid"])
                pos, active, pid, fields, dr2 = jax.lax.cond(
                    has_rx, _place, _place_skip, pos, active, pid, fields)
                dropped = dropped + dr2
            out.append(model._replace(pos=pos, fields=fields, active=active,
                                      pid=pid))
        return out, dropped


class MultiChipEngine:
    """MGSP-equivalent multi-chip engine: same config/materials API as
    MPMEngine, sharded over a 1-D x-slab mesh (``n_devices``) or the
    reference's 2-D (x, z) box split (``mesh_shape=(nx, nz)``; reference
    MGSP/settings.h:78-88 splits 4 GPUs 2x2 over (x, z))."""

    def __init__(
        self,
        cfg: SimConfig,
        materials: Sequence[Material],
        mesh: Optional[Mesh] = None,
        n_devices: Optional[int] = None,
        mesh_shape: Optional[Sequence[int]] = None,
        axis: str = "x",
        halo_margin: Optional[int] = None,
        migration_capacity: int = 2048,
        halo_capacity: Optional[int] = None,
        colliders: Sequence = (),
        tile_chunk: int = 32,
        particle_capacity_factor: float = 1.5,
        use_pallas=False,
        overlap_halo: bool = True,
    ):
        if mesh_shape is not None:
            mesh_shape = tuple(int(n) for n in mesh_shape)
            assert len(mesh_shape) in (1, 2)
        if mesh is None:
            total = (int(np.prod(mesh_shape)) if mesh_shape
                     else (n_devices or len(jax.devices())))
            devs = np.array(jax.devices()[:total])
            if mesh_shape and len(mesh_shape) == 2:
                mesh = Mesh(devs.reshape(mesh_shape), (axis, "z"))
            else:
                mesh = Mesh(devs, (axis,))
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.devices.size
        if mesh_shape is None:
            mesh_shape = tuple(mesh.devices.shape)
        self.mesh_shape = mesh_shape
        # decomposed spatial dims: x always; z for 2-D box splits
        axes = tuple(zip(mesh.axis_names, (0, 2)[: len(mesh_shape)]))
        self.cfg = cfg
        self.materials = tuple(materials)
        self.colliders = tuple(colliders)
        self.tile_chunk = tile_chunk
        self.capacity_factor = particle_capacity_factor
        self.use_pallas = use_pallas
        if use_pallas:
            # SDF caches must exist before the sharded substep traces
            # (same eager-build rule as MPMEngine)
            for c in self.colliders:
                if (not getattr(c, "pallas_ok", False)
                        and hasattr(c, "oct_cache_ok")
                        and c.oct_cache_ok(cfg)):
                    c.build_oct_cache(cfg)
        # The P2G arena can scatter up to (arena_lo + arena_span - 1) block
        # layers past the slab boundary (and |arena_lo| before it), so the
        # exchanged window must be at least that wide or boundary mass leaks.
        arena_reach = max(cfg.arena_lo + cfg.arena_span - 1, -cfg.arena_lo, 1)
        if halo_margin is None:
            halo_margin = arena_reach
        assert halo_margin >= arena_reach, (
            f"halo_margin={halo_margin} cannot cover the transfer arena's "
            f"scatter reach of {arena_reach} block layers (rebucket_every="
            f"{cfg.rebucket_every} widens the arena; raise halo_margin or "
            "lower rebucket_every)"
        )
        # ppermute exchanges with immediate neighbors only, so the window may
        # not extend past their slabs
        for n in mesh_shape:
            assert cfg.grid_size // n >= halo_margin, (
                "slab thinner than the halo margin; use fewer devices or a "
                "larger domain"
            )
        comm_key = (cfg, axes, tuple(mesh_shape), halo_margin,
                    migration_capacity, halo_capacity, overlap_halo)
        self.comm = _shared(
            ("comm",) + comm_key,
            lambda: HaloComm(cfg, axes, mesh_shape, halo_margin,
                             migration_capacity, halo_capacity,
                             overlap=overlap_halo))
        # program-identity key: everything substep_impl closes over
        self._key = (cfg, self.materials, self.colliders, tile_chunk,
                     use_pallas, self.mesh) + comm_key
        self._num_tiles: List[int] = []
        self._pcaps: List[int] = []
        self._substep_fn = None

    @property
    def _spec_axes(self):
        names = self.mesh.axis_names
        return names[0] if len(names) == 1 else tuple(names)

    # -- init ----------------------------------------------------------
    def init_state(self, model_positions, model_velocities=None) -> SimState:
        cfg = self.cfg
        nd = self.n_dev
        if model_velocities is None:
            model_velocities = [(0.0, 0.0, 0.0)] * len(self.materials)

        pos_stacked, act_stacked = [], []
        self._num_tiles, self._pcaps = [], []
        for raw in model_positions:
            raw = np.asarray(raw, np.float32)
            base = np.floor(raw * cfg.dx_inv + 0.5).astype(np.int64) - 1
            hb = (base - 1) >> cfg.block_bits          # [n, 3] home blocks
            # shard index: row-major over the decomposed axes (x-major)
            shard = np.zeros(len(raw), np.int64)
            for (name, dim), n_ax in zip(self.comm.axes, self.mesh_shape):
                slab_ax = cfg.grid_size // n_ax
                shard = shard * n_ax + np.clip(hb[:, dim] // slab_ax, 0, n_ax - 1)
            counts = np.bincount(shard, minlength=nd)
            # per-shard tile capacity from the actual worst shard's layout
            # (incl. oct-group padding), scaled for migration growth
            nt = max(
                engine_mod.exact_tiles(
                    cfg, [raw[shard == d]],
                    slack=max(self.capacity_factor, 1.3))
                for d in range(nd)
            )
            c = max(self.tile_chunk, cfg.group_tiles)
            nt = -(-nt // c) * c
            s_cap = nt * cfg.particle_tile  # slot capacity per shard
            pos_sh = np.zeros((3, nd * s_cap), np.float32)
            act_sh = np.zeros((nd * s_cap,), bool)
            for d in range(nd):
                sel = raw[shard == d]
                pos_sh[:, d * s_cap : d * s_cap + len(sel)] = sel.T
                act_sh[d * s_cap : d * s_cap + len(sel)] = True
            self._pcaps.append(s_cap)
            self._num_tiles.append(nt)
            pos_stacked.append(jnp.asarray(pos_sh))
            act_stacked.append(jnp.asarray(act_sh))

        v0s = tuple(tuple(float(c) for c in v) for v in model_velocities)
        comm = self.comm
        # the transfer split needs boundary tiles in the static prefix from
        # the FIRST substep, so the initial plan sorts with the same region
        split = comm.overlap and cfg.defrag_every == 1

        def _build():
            init_fn = functools.partial(
                engine_mod.init_impl, cfg, self.materials,
                tuple(self._num_tiles), self.tile_chunk,
                region_fn=comm.is_boundary_key if split else None,
            )
            ax = self._spec_axes

            def _init(p, a):
                st = init_fn(p, a, v0s)
                # initial halo reduction so every active copy holds the
                # global sum (reference initial_setup collect/reduce,
                # mgsp_benchmark.cuh:653)
                slabs = comm.exchange_halo(st.grid, st.partition)
                return st._replace(
                    grid=comm.add_halo(st.grid, st.partition, slabs))

            return jax.jit(
                jax.shard_map(
                    _init,
                    mesh=self.mesh,
                    in_specs=(tuple(P(None, ax) for _ in pos_stacked),
                              tuple(P(ax) for _ in act_stacked)),
                    out_specs=self._out_state_spec(),
                    check_vma=False,
                )
            )

        sharded_init = _shared(
            ("init",) + self._key + (tuple(self._num_tiles), v0s, split),
            _build)
        return sharded_init(tuple(pos_stacked), tuple(act_stacked))

    def _out_state_spec(self):
        ax = self._spec_axes
        part_spec = part.Partition(table=P(ax), keys=P(ax), count=P(ax),
                                   overflow=P(ax))
        tile_spec = part.TileMap(block=P(ax), bcoord=P(None, ax),
                                 tvalid=P(ax), dropped=P(ax))
        model_specs = tuple(
            ParticleModel(
                pos=P(None, ax),
                fields={
                    k: (P(None, ax) if shp else P(ax))
                    for k, shp in mat.field_specs
                },
                active=P(ax),
                pid=P(ax),
                tiles=tile_spec,
            )
            for mat in self.materials
        )
        return SimState(
            grid=P(ax), partition=part_spec, models=model_specs,
            dt=P(), max_vel=P(), t=P(), step=P(), mig_dropped=P(ax),
            halo_overflow=P(ax),
        )

    # -- stepping ------------------------------------------------------
    def _build_substep(self):
        spec = self._out_state_spec()
        fn = functools.partial(
            engine_mod.substep_impl, self.cfg, self.materials, self.colliders,
            self.tile_chunk, comm=self.comm, use_pallas=self.use_pallas,
        )
        return jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(spec, P()), out_specs=spec, check_vma=False,
            )
        )

    @property
    def substep(self):
        if self._substep_fn is None:
            self._substep_fn = _shared(("substep",) + self._key,
                                       self._build_substep)
        return self._substep_fn

    def _build_run_steps(self):
        spec = self._out_state_spec()
        fn = functools.partial(
            engine_mod.substep_impl, self.cfg, self.materials,
            self.colliders, self.tile_chunk, comm=self.comm,
            use_pallas=self.use_pallas,
        )

        def loop(st, fe, n_):
            return jax.lax.fori_loop(0, n_, lambda i, s: fn(s, fe), st)

        return jax.jit(
            jax.shard_map(loop, mesh=self.mesh,
                          in_specs=(spec, P(), P()), out_specs=spec,
                          check_vma=False),
        )

    def run_steps(self, state: SimState, n: int, frame_end) -> SimState:
        """n substeps in one sharded device program (single dispatch)."""
        if getattr(self, "_run_steps_fn", None) is None:
            self._run_steps_fn = _shared(("run_steps",) + self._key,
                                         self._build_run_steps)
        import jax.numpy as _jnp
        return self._run_steps_fn(state, _jnp.float32(frame_end),
                                  _jnp.int32(n))

    def run_frame(self, state: SimState, frame_end) -> SimState:
        """All substeps of one frame in ONE sharded device program (round 2
        ran a per-substep host loop with a float(state.t) readback — ~30 ms
        of tunnel latency per substep on the axon remote backend, dwarfing
        the step itself; the reference pays a per-substep host sync too,
        mgsp_benchmark.cuh:410-416)."""
        if getattr(self, "_run_frame_fn", None) is None:
            self._run_frame_fn = _shared(("run_frame",) + self._key,
                                         self._build_run_frame)
        return self._run_frame_fn(state, jnp.float32(frame_end))

    def _build_run_frame(self):
        spec = self._out_state_spec()
        fn = functools.partial(
            engine_mod.substep_impl, self.cfg, self.materials,
            self.colliders, self.tile_chunk, comm=self.comm,
            use_pallas=self.use_pallas,
        )
        cap = self.cfg.max_substeps_per_frame
        eps = 1e-9

        def frame(st, fe):
            step0 = st.step

            def cond(s):
                return (s.t < fe - eps) & (s.step - step0 < cap)

            st = st._replace(
                dt=jnp.minimum(st.dt, jnp.maximum(fe - st.t, 0.0)))
            return jax.lax.while_loop(cond, lambda s: fn(s, fe), st)

        return jax.jit(
            jax.shard_map(frame, mesh=self.mesh,
                          in_specs=(spec, P()), out_specs=spec,
                          check_vma=False)
        )

    def run(self, state: SimState, frames: int, on_frame=None,
            check_health: bool = True) -> SimState:
        frame_dt = self.cfg.frame_dt()
        t0 = float(state.t)
        for f in range(frames):
            state = self.run_frame(state, t0 + (f + 1) * frame_dt)
            if check_health:
                self.check_health(state, strict=False)
            if on_frame is not None:
                on_frame(f, state)
        return state

    def check_health(self, state: SimState, strict: bool = True) -> None:
        """Divergence + silent-loss counters across all shards (the
        multi-chip analogue of MPMEngine.check_health; reference aborts,
        mgsp_benchmark.cuh:473-476)."""
        import warnings

        t = float(state.t)
        if not np.isfinite(t) or not np.isfinite(float(state.max_vel)):
            raise FloatingPointError(
                f"simulation diverged: t={t}, max_vel={float(state.max_vel)}"
            )
        msgs = []
        of = int(np.asarray(state.partition.overflow).sum())
        if of > 0:
            msgs.append(f"partition overflow: {of} octs beyond capacity")
        for i, m in enumerate(state.models):
            d = int(np.asarray(m.tiles.dropped).sum())
            if d > 0:
                msgs.append(f"model {i}: {d} particles dropped (tile capacity)")
        md = int(np.asarray(state.mig_dropped).sum())
        if md > 0:
            msgs.append(f"{md} particles lost to migration capacity")
        ho = int(np.asarray(state.halo_overflow).sum())
        if ho > 0:
            msgs.append(f"{ho} halo octs beyond halo_capacity (mass leaked)")
        if msgs:
            msg = "; ".join(msgs) + " — increase capacities"
            if strict:
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    def update_material(self, model_idx: int, **params) -> "MultiChipEngine":
        """New engine with updated material parameters (reference
        update_*_parameters, gmpm_simulator.cuh:211-254); states carry over."""
        import dataclasses as _dc

        mats = list(self.materials)
        mats[model_idx] = _dc.replace(mats[model_idx], **params)
        eng = MultiChipEngine(
            self.cfg, mats, mesh=self.mesh, mesh_shape=self.mesh_shape,
            axis=self.axis, halo_margin=self.comm.margin,
            migration_capacity=self.comm.mig_cap,
            halo_capacity=self.comm.halo_capacity, colliders=self.colliders,
            tile_chunk=self.tile_chunk,
            particle_capacity_factor=self.capacity_factor,
            use_pallas=self.use_pallas,
            overlap_halo=self.comm.overlap,
        )
        eng._num_tiles = list(self._num_tiles)
        eng._pcaps = list(self._pcaps)
        return eng

    # -- inspection ----------------------------------------------------
    def get_positions(self, state: SimState, model_idx: int = 0) -> np.ndarray:
        m = state.models[model_idx]
        pos = np.asarray(m.pos).T
        act = np.asarray(m.active)
        return pos[act]

    def diagnostics(self, state: SimState) -> dict:
        """Global probes.  Each block is counted from its OWNER shard (the
        shard whose slab contains it): after every halo reduction the owner's
        copy holds the global sum for all of its blocks, while a non-owner
        copy of a straddling oct row only holds the window blocks."""
        cfg = self.cfg
        nd = self.n_dev
        gzo = cfg.grid_size_zo
        g = cfg.grid_size
        pool = np.asarray(state.grid).reshape(nd, -1, 16, 128)
        keys = np.asarray(state.partition.keys).reshape(nd, -1)
        counts = np.asarray(state.partition.count).reshape(nd)
        nb = keys.shape[1]
        live = np.arange(nb)[None, :] < counts[:, None]      # [nd, nb]
        kk = np.minimum(keys, cfg.num_oct_keys - 1)
        bx = kk // (gzo * g)
        by = (kk // gzo) % g
        bz = (kk % gzo)[:, :, None] * 8 + np.arange(8)       # [nd, nb, 8]
        coords = (bx[:, :, None], by[:, :, None], bz)
        # shard index of each block, row-major over the decomposed axes
        owner = np.zeros((nd, nb, 8), np.int64)
        for (name, dim), n_ax in zip(self.comm.axes, self.mesh_shape):
            slab = g // n_ax
            owner = owner * n_ax + np.clip(coords[dim] // slab, 0, n_ax - 1)
        mine = (owner == np.arange(nd)[:, None, None]) & live[:, :, None]
        blkmask = np.repeat(mine, 16, axis=2).reshape(nd, nb, 128)
        rows = pool[:, :nb] * blkmask[:, :, None, :]
        mass = float(rows[:, :, 0:4].sum())
        mom = rows[:, :, 4:16].reshape(nd, nb, 3, 4, 128).sum(
            axis=(0, 1, 3, 4))
        out = {
            "grid_mass": float(mass),
            "grid_momentum": mom,
            "t": float(state.t),
            "dt": float(state.dt),
            "active_blocks": counts.tolist(),
            "migration_dropped": int(np.asarray(state.mig_dropped).sum()),
            "halo_overflow": int(np.asarray(state.halo_overflow).sum()),
        }
        for i, m in enumerate(state.models):
            out[f"model{i}_active"] = int(jnp.sum(m.active))
            out[f"model{i}_dropped_tiles"] = int(
                np.asarray(m.tiles.dropped).sum())
        return out
