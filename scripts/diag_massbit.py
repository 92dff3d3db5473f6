"""Diagnostic: is the P2G mass channel bit-identical between
mxu_precision="high" (exact-mass side dot) and "highest" after one
substep from the SAME state?  It must be — both compute the mass rows
with a HIGHEST-precision dot over the same operands."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from claymore_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

cfg_hi = cmt.SimConfig(domain_bits=6, max_active_blocks=512, default_dt=2e-4,
                       mxu_precision="highest", g2p_arena_dtype="float32")
cfg_h3 = dataclasses.replace(cfg_hi, mxu_precision="high")
mat = cmt.FixedCorotated(volume=cfg_hi.default_volume(), e=1e4, nu=0.3)
pos = sample_uniform_box_world(cfg_hi.dx, [0.4] * 3, [0.6] * 3, cfg_hi.ppc)

e_hi = cmt.MPMEngine(cfg_hi, [mat], tile_chunk=8, use_pallas=True)
e_h3 = cmt.MPMEngine(cfg_h3, [mat], tile_chunk=8, use_pallas=True)
s_hi = e_hi.init_state([pos], [(0.2, -0.4, 0.1)])
s_h3 = e_h3.init_state([pos], [(0.2, -0.4, 0.1)])
fe = jnp.float32(1.0)

for step in range(4):
    s_hi = e_hi.substep(s_hi, fe)
    s_h3 = e_h3.substep(s_h3, fe)
    g_hi = np.asarray(s_hi.grid)[:-1, 0:4]       # mass rows
    g_h3 = np.asarray(s_h3.grid)[:-1, 0:4]
    total_hi, total_h3 = g_hi.sum(dtype=np.float64), g_h3.sum(dtype=np.float64)
    exp = pos.shape[0] * mat.mass
    bit = np.array_equal(g_hi, g_h3)
    print(f"step {step}: mass cells bit-identical={bit}  "
          f"per-cell max |diff|={np.max(np.abs(g_hi - g_h3)):.3e}  "
          f"total hi={total_hi:.9e} h3={total_h3:.9e}  "
          f"rel_err hi={abs(total_hi - exp) / exp:.3e} "
          f"h3={abs(total_h3 - exp) / exp:.3e}")
