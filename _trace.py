import time, glob, gzip, json, os
import numpy as np
import jax, jax.numpy as jnp
import sys
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
import sys
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas='pallas' in sys.argv)
span=0.12 if '--quick' in sys.argv else 0.2; lo,hi = 0.4-span/2, 0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
st = eng.init_state([pos], [(0.,-0.5,0.)])
fe = jnp.float32(1e9)
st = eng.substep(st, fe); jax.block_until_ready(st); float(np.asarray(st.t))
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        st = eng.substep(st, fe)
    jax.block_until_ready(st)
    float(np.asarray(st.grid[0,0,0]))
print("traced")
