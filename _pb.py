import time, sys
import numpy as np
import jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

quick = "--quick" in sys.argv
span = 0.12 if quick else 0.2
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
lo,hi = 0.4-span/2, 0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
print("particles:", pos.shape[0], flush=True)
for use_pallas in (True, False):
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=use_pallas)
    st = eng.init_state([pos], [(0.,-0.5,0.)])
    fe = jnp.float32(1e9)
    t0 = time.perf_counter()
    st = eng.substep(st, fe); jax.block_until_ready(st)
    print(f"pallas={use_pallas}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    n = 5
    t0=time.perf_counter()
    for _ in range(n): st = eng.substep(st, fe)
    jax.block_until_ready(st)
    dt = (time.perf_counter()-t0)/n
    d = eng.diagnostics(st)
    print(f"pallas={use_pallas}: {dt*1e3:.2f} ms/step, {pos.shape[0]*1e-6/dt:.2f} Mpps, mass={d['grid_mass']:.5f}", flush=True)
