"""Debug / validation helpers (reference check_table, check_partition,
sum_grid_mass, sum_particle_counts — Projects/GMPM/mgmpm_kernels.cuh:1023-1085)."""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..core.partition import unflatten_key
from ..core.types import Partition, SimState


def pool_to_dense(cfg: SimConfig, state: SimState):
    """Expand the sparse block pool to dense (m, mom) grids for testing."""
    n = cfg.domain_size
    bs = cfg.block_size
    m = np.zeros((n, n, n), np.float64)
    mom = np.zeros((n, n, n, 3), np.float64)
    pool = np.asarray(state.grid, np.float64)
    keys = np.asarray(state.partition.keys)
    count = int(np.asarray(state.partition.count)[0])
    coords = np.asarray(unflatten_key(cfg, state.partition.keys))
    for s in range(count):
        bx, by, bz = coords[:, s] * bs
        blk = pool[s].reshape(4, bs, bs, bs)
        m[bx : bx + bs, by : by + bs, bz : bz + bs] = blk[0]
        mom[bx : bx + bs, by : by + bs, bz : bz + bs] = np.moveaxis(blk[1:4], 0, -1)
    return m, mom


def check_partition(cfg: SimConfig, partition: Partition) -> None:
    """Key <-> slot round trip (reference check_table / check_partition)."""
    keys = np.asarray(partition.keys)
    table = np.asarray(partition.table)
    count = int(np.asarray(partition.count)[0])
    assert int(np.asarray(partition.overflow)[0]) == 0
    for s in range(count):
        assert keys[s] < cfg.num_table_entries
        assert table[keys[s]] == s, (s, keys[s], table[keys[s]])
    assert np.all(keys[count:] == cfg.num_table_entries)
    live = table[table != cfg.null_block]
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
