"""Debug / validation helpers (reference check_table, check_partition,
sum_grid_mass, sum_particle_counts — Projects/GMPM/mgmpm_kernels.cuh:1023-1085)."""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..core.partition import unflatten_key
from ..core.types import Partition, SimState


def pool_to_dense(cfg: SimConfig, state: SimState):
    """Expand the sparse oct pool to dense (m, mom) grids for testing."""
    n = cfg.domain_size
    bs = cfg.block_size
    g = cfg.grid_size
    gzo = cfg.grid_size_zo
    m = np.zeros((n, n, n), np.float64)
    mom = np.zeros((n, n, n, 3), np.float64)
    pool = np.asarray(state.grid, np.float64)
    keys = np.asarray(state.partition.keys)
    count = int(np.asarray(state.partition.count)[0])
    for s in range(count):
        k = keys[s]
        bx = (k // (gzo * g)) * bs
        by = ((k // gzo) % g) * bs
        bz0 = (k % gzo) * 8 * bs
        # row (c, cx), lane (z8, cy, cz) -> [4ch, 4cx, 8z8, 4cy, 4cz]
        oct = pool[s].reshape(4, 4, 8, 4, 4)
        blk = oct.transpose(0, 2, 1, 3, 4)                # c, z8, cx, cy, cz
        for z8 in range(8):
            zz = bz0 + z8 * bs
            m[bx : bx + bs, by : by + bs, zz : zz + bs] = blk[0, z8]
            mom[bx : bx + bs, by : by + bs, zz : zz + bs] = np.moveaxis(
                blk[1:4, z8], 0, -1)
    return m, mom


def check_partition(cfg: SimConfig, partition: Partition) -> None:
    """Key <-> slot round trip (reference check_table / check_partition)."""
    keys = np.asarray(partition.keys)
    table = np.asarray(partition.table)
    count = int(np.asarray(partition.count)[0])
    assert int(np.asarray(partition.overflow)[0]) == 0
    for s in range(count):
        assert keys[s] < cfg.num_oct_keys
        assert table[keys[s]] == s, (s, keys[s], table[keys[s]])
    assert np.all(keys[count:] == cfg.num_oct_keys)
    live = table[table != cfg.null_oct]
    assert live.size == count


def check_tiles(cfg: SimConfig, state: SimState, model_idx: int = 0) -> None:
    """Slot-major invariants: no duplicate particle ids, no dropped
    particles, and every active slot's home block matches its tile."""
    from ..core.partition import home_block, lookup

    m = state.models[model_idx]
    tm = m.tiles
    active = np.asarray(m.active)
    pid = np.asarray(m.pid)[active]
    assert len(pid) == len(set(pid.tolist())), "duplicate particle in slots"
    assert int(np.asarray(tm.dropped)[0]) == 0
    # slot -> tile home-block consistency
    slot_of = np.asarray(
        lookup(cfg, state.partition.table, home_block(cfg, m.pos))
    )
    tile_of_slot = np.repeat(np.asarray(tm.block), cfg.particle_tile)
    assert np.all(slot_of[active] == tile_of_slot[active])
