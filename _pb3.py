import time, sys
import numpy as np
import jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

up = sys.argv[1] == "pallas"
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
span=0.12; lo,hi=0.4-span/2,0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
fe = jnp.float32(1e9)
e = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=up)
s = e.init_state([pos], [(0.,-0.5,0.)])
s = e.substep(s, fe); jax.block_until_ready(s)
print("warm", flush=True)
for rep in range(3):
    n = 20
    t0=time.perf_counter()
    for _ in range(n): s = e.substep(s, fe)
    jax.block_until_ready(s)
    _ = float(np.asarray(s.grid[0,0,0])) + float(np.asarray(s.t))
    dt_ = (time.perf_counter()-t0)/n
    print(f"{'pallas' if up else 'xla'} rep{rep}: {dt_*1e3:.2f} ms/step, {pos.shape[0]*1e-6/dt_:.1f} Mpps", flush=True)
