import numpy as np, jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=64)
span=0.12; lo,hi=0.4-span/2,0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
st = eng.init_state([pos], [(0.,-0.5,0.)])
d = eng.diagnostics(st)
print("init:", {k: d[k] for k in ("grid_mass","active_blocks","model0_active","model0_dropped_tiles")})
st = eng.substep(st, jnp.float32(1e9)); jax.block_until_ready(st)
d = eng.diagnostics(st)
print("after 1:", {k: d[k] for k in ("grid_mass","active_blocks","model0_active","model0_dropped_tiles")})
