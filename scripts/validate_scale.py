"""BASELINE config-5 shape check: 1024^3-cell domain, multi-chip.

Runs the MGSP-equivalent sharded engine at domain_bits=10 (the 100M-particle
scenario's resolution) on a virtual CPU mesh with a small particle load:
validates that the per-shard 256^3-entry tables, the G-independent packed
halo exchange, and the rebuild masks compile and conserve mass at the
target resolution — the piece of config 5 that does not need 8 real chips.

Run:  python scripts/validate_scale.py [n_devices]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_devices: int = 4) -> None:
    import jax
    from claymore_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)

    import jax.numpy as jnp
    import numpy as np

    import claymore_tpu as cmt
    from claymore_tpu.io.sampler import sample_uniform_box_world
    from claymore_tpu.parallel.multi import MultiChipEngine

    cfg = cmt.SimConfig(domain_bits=10, max_active_blocks=2048,
                        default_dt=1e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
    # a thin rod of material crossing every x-shard boundary
    pos = sample_uniform_box_world(cfg.dx, [0.3, 0.5, 0.49],
                                   [0.7, 0.505, 0.51], cfg.ppc)
    eng = MultiChipEngine(cfg, [mat], n_devices=n_devices, tile_chunk=8,
                          migration_capacity=4096, halo_capacity=512)
    st = eng.init_state([pos], [(0.3, -0.4, 0.0)])
    n = pos.shape[0]
    fe = jnp.float32(1e9)
    for _ in range(3):
        st = eng.substep(st, fe)
    jax.block_until_ready(st)
    d = eng.diagnostics(st)
    assert int(np.asarray(st.partition.overflow).sum()) == 0, (
        "partition overflow — raise max_active_blocks")
    expected = n * mat.mass
    assert abs(d["grid_mass"] - expected) < 1e-4 * expected, (
        d["grid_mass"], expected)
    assert d["halo_overflow"] == 0
    assert d["migration_dropped"] == 0
    assert d["model0_active"] == n
    print(f"domain_bits=10 x {n_devices} shards: {n} particles, "
          f"blocks/shard {d['active_blocks']}, mass ok, t={d['t']:.5f}")
    print("scale validation: OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
