import time
import numpy as np
import jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world

cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
span=0.12; lo,hi=0.4-span/2,0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
fe = jnp.float32(1e9)

engs, states = [], []
for up in (False, True):
    e = cmt.MPMEngine(cfg, [mat], tile_chunk=64, use_pallas=up)
    s = e.init_state([pos], [(0.,-0.5,0.)])
    engs.append(e); states.append(s)

for i in range(30):
    states = [e.substep(s, fe) for e, s in zip(engs, states)]
jax.block_until_ready(states)
p0 = engs[0].get_positions(states[0]); p1 = engs[1].get_positions(states[1])
k0 = np.lexsort((p0[:,2],p0[:,1],p0[:,0])); k1 = np.lexsort((p1[:,2],p1[:,1],p1[:,0]))
print("30-step traj: shapes", p0.shape, p1.shape, "max diff:",
      np.max(np.abs(p0[k0]-p1[k1])) if p0.shape==p1.shape else "SHAPE MISMATCH")
print("com:", p0.mean(0), p1.mean(0))

for name, e, s in (("xla", engs[0], states[0]), ("pallas", engs[1], states[1])):
    n = 50
    t0=time.perf_counter()
    for _ in range(n): s = e.substep(s, fe)
    jax.block_until_ready(s)
    dt_ = (time.perf_counter()-t0)/n
    print(f"{name}: {dt_*1e3:.2f} ms/step, {pos.shape[0]*1e-6/dt_:.1f} Mpps")
