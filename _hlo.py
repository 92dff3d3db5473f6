import numpy as np
import jax, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world
cfg = cmt.SimConfig(domain_bits=8, max_active_blocks=8192, default_dt=1e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=5e3, nu=0.4)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=32)
span=0.2; lo,hi = 0.4-span/2, 0.4+span/2
pos = sample_uniform_box_world(cfg.dx, [lo,0.5,lo],[hi,0.5+span,hi], cfg.ppc)
st = eng.init_state([pos], [(0.,-0.5,0.)])
fe = jnp.float32(1e9)
txt = jax.jit(eng._substep).lower(st, fe).compile().as_text()
open("/tmp/substep.hlo","w").write(txt)
print("written", len(txt))
