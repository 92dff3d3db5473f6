"""Simulation orchestrator.

TPU-native equivalent of the reference's host-side simulator
(reference: Projects/GMPM/gmpm_simulator.cuh:25-783).  The double-buffered
rollid machinery becomes purely functional state threading; the per-substep
host round trips (max-vel memcpy, scan readbacks, capacity checks,
gmpm_simulator.cuh:341-570) disappear: the whole substep — grid update, CFL,
fused G2P2G per material, partition rebuild, re-bucketing — is one jitted
function, and whole frames run on device under ``lax.while_loop``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..models.materials import Material
from . import grid as grid_ops
from . import partition as part
from . import transfer
from .types import Partition, ParticleModel, SimState, TileMap


class MPMEngine:
    """One compiled engine = (config, materials, colliders).

    Materials and colliders are static; changing them re-traces (the moral
    equivalent of the reference's per-material template instantiation).
    """

    def __init__(
        self,
        cfg: SimConfig,
        materials: Sequence[Material],
        colliders: Sequence = (),
        tile_chunk: int = 32,
    ):
        self.cfg = cfg
        self.materials = tuple(materials)
        self.colliders = tuple(colliders)
        self.tile_chunk = tile_chunk
        self._num_tiles: List[int] = []
        self.substep = jax.jit(self._substep)
        self.run_frame = jax.jit(self._run_frame)

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _round_tiles(self, n_particles: int) -> int:
        t = self.cfg.tiles_for(n_particles)
        c = self.tile_chunk
        return -(-t // c) * c

    def init_state(
        self,
        model_positions: Sequence[np.ndarray],
        model_velocities: Optional[Sequence] = None,
    ) -> SimState:
        """Build the initial state: partition from particle home blocks, tile
        buckets, and rasterized grid mass/momentum (reference initial_setup,
        gmpm_simulator.cuh:637-781)."""
        cfg = self.cfg
        assert len(model_positions) == len(self.materials)
        if model_velocities is None:
            model_velocities = [(0.0, 0.0, 0.0)] * len(self.materials)

        models: List[ParticleModel] = []
        self._num_tiles = []
        positions, actives = [], []
        for mat, raw in zip(self.materials, model_positions):
            raw = np.asarray(raw, np.float32)
            n = raw.shape[0]
            pos = jnp.asarray(raw)
            active = jnp.ones((n,), jnp.bool_)
            nt = self._round_tiles(n)
            self._num_tiles.append(nt)
            models.append(
                ParticleModel(
                    pos=pos,
                    fields=mat.init_fields(n),
                    active=active,
                    tiles=TileMap(  # placeholder, rebuilt below
                        pidx=jnp.zeros((nt, cfg.particle_tile), jnp.int32),
                        valid=jnp.zeros((nt, cfg.particle_tile), jnp.bool_),
                        block=jnp.full((nt,), cfg.null_block, jnp.int32),
                        bcoord=jnp.zeros((nt, 3), jnp.int32),
                        tvalid=jnp.zeros((nt,), jnp.bool_),
                        dropped=jnp.int32(0),
                    ),
                )
            )
            positions.append(pos)
            actives.append(active)

        pool = jnp.zeros(
            (cfg.max_active_blocks + 1, 4, cfg.block_volume), jnp.float32
        )
        empty = Partition(
            table=jnp.full((cfg.num_table_entries + 1,), cfg.null_block, jnp.int32),
            keys=jnp.full((cfg.max_active_blocks,), cfg.num_table_entries, jnp.int32),
            count=jnp.int32(0),
            overflow=jnp.int32(0),
        )
        partition, pool = part.rebuild(cfg, pool, empty, tuple(positions), tuple(actives))

        models = [
            m._replace(
                tiles=part.build_tiles(cfg, partition, m.pos, m.active, nt)
            )
            for m, nt in zip(models, self._num_tiles)
        ]

        for mat, model, v0 in zip(self.materials, models, model_velocities):
            pool = transfer.rasterize_model(
                cfg, mat, partition.table, model,
                jnp.asarray(v0, jnp.float32), pool, self.tile_chunk,
            )

        return SimState(
            grid=pool,
            partition=partition,
            models=tuple(models),
            dt=jnp.float32(cfg.default_dt),
            max_vel=jnp.float32(0.0),
            t=jnp.float32(0.0),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def _substep(self, state: SimState, frame_end: jnp.ndarray) -> SimState:
        cfg = self.cfg
        dt = state.dt

        pool_v, max_vel_sqr = grid_ops.grid_update(
            cfg, state.grid, state.partition, dt, self.colliders, state.t
        )
        t_after = state.t + dt
        next_dt = grid_ops.compute_dt(cfg, max_vel_sqr, t_after, frame_end)

        next_pool = jnp.zeros_like(state.grid)
        new_models = []
        for mat, model in zip(self.materials, state.models):
            model, next_pool = transfer.g2p2g_model(
                cfg, mat, pool_v, state.partition.table, model,
                dt, next_dt, next_pool, self.tile_chunk,
            )
            new_models.append(model)

        partition, next_pool = part.rebuild(
            cfg, next_pool, state.partition,
            tuple(m.pos for m in new_models),
            tuple(m.active for m in new_models),
        )
        new_models = [
            m._replace(tiles=part.build_tiles(cfg, partition, m.pos, m.active,
                                              m.tiles.pidx.shape[0]))
            for m in new_models
        ]

        return SimState(
            grid=next_pool,
            partition=partition,
            models=tuple(new_models),
            dt=next_dt,
            max_vel=jnp.sqrt(max_vel_sqr),
            t=t_after,
            step=state.step + 1,
        )

    def _run_frame(self, state: SimState, frame_end: jnp.ndarray) -> SimState:
        """All substeps of one frame on device (no host round trips; the
        reference syncs max-vel to host every substep, gmpm_simulator.cuh:344)."""
        eps = 1e-9

        def cond(s):
            return s.t < frame_end - eps

        def body(s):
            return self._substep(s, frame_end)

        # clamp the first dt against the frame boundary as well
        state = state._replace(
            dt=jnp.minimum(state.dt, jnp.maximum(frame_end - state.t, 0.0))
        )
        return jax.lax.while_loop(cond, body, state)

    def run(self, state: SimState, frames: int, on_frame=None) -> SimState:
        """Frame loop (reference main_loop, gmpm_simulator.cuh:303-591)."""
        frame_dt = self.cfg.frame_dt()
        t0 = float(state.t)
        for f in range(frames):
            frame_end = jnp.float32(t0 + (f + 1) * frame_dt)
            state = self.run_frame(state, frame_end)
            if on_frame is not None:
                on_frame(f, state)
        return state

    # ------------------------------------------------------------------
    # inspection / output
    # ------------------------------------------------------------------

    def get_positions(self, state: SimState, model_idx: int = 0) -> np.ndarray:
        """Active particle positions on host (reference
        retrieve_particle_buffer, mgmpm_kernels.cuh:1088-1122)."""
        m = state.models[model_idx]
        pos = np.asarray(m.pos)
        act = np.asarray(m.active)
        return pos[act]

    def diagnostics(self, state: SimState) -> dict:
        """Conservation / occupancy probes (reference check_* kernels,
        mgmpm_kernels.cuh:1023-1085)."""
        cfg = self.cfg
        grid_mass = float(jnp.sum(state.grid[:-1, 0]))
        mom = jnp.sum(state.grid[:-1, 1:4], axis=(0, 2))
        out = {
            "grid_mass": grid_mass,
            "grid_momentum": np.asarray(mom),
            "active_blocks": int(state.partition.count),
            "block_overflow": int(state.partition.overflow),
            "null_block_mass": float(jnp.sum(jnp.abs(state.grid[cfg.null_block, 0]))),
            "t": float(state.t),
            "dt": float(state.dt),
            "step": int(state.step),
        }
        for i, m in enumerate(state.models):
            out[f"model{i}_active"] = int(jnp.sum(m.active))
            out[f"model{i}_dropped_tiles"] = int(m.tiles.dropped)
        return out
