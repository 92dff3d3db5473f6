import time, sys
import numpy as np
import jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

k = int(sys.argv[1]); up = sys.argv[2] == "pallas"
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4,
                    rebucket_every=k)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
span=0.2; lo,hi=0.4-span/2,0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
tc = 64 if (up or k == 1) else 8
e = cmt.MPMEngine(cfg, [mat], tile_chunk=tc, use_pallas=up)
s = e.init_state([pos], [(0.,-0.5,0.)])
fe = jnp.float32(1e9)
s = e.substep(s, fe); jax.block_until_ready(s); float(np.asarray(s.t))
n = 20
t0=time.perf_counter()
for _ in range(n): s = e.substep(s, fe)
jax.block_until_ready(s); float(np.asarray(s.grid[0,0,0]))
dt_ = (time.perf_counter()-t0)/n
d = e.diagnostics(s)
print(f"k={k} pallas={up}: {dt_*1e3:.2f} ms/step, {pos.shape[0]*1e-6/dt_:.1f} Mpps, mass={d['grid_mass']:.5f}, act={d['model0_active']}", flush=True)
