import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.core import transfer, grid as grid_ops
from claymore_tpu.ops import pallas_g2p2g as pg
from claymore_tpu.io.sampler import sample_uniform_box_world

cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
pos = sample_uniform_box_world(cfg.dx, [0.45]*3, [0.58]*3, cfg.ppc)
st = eng.init_state([pos], [(0.2,-0.3,0.1)])
pv, _ = grid_ops.grid_update(cfg, st.grid, st.partition, st.dt, (), jnp.float32(0))
m = st.models[0]
dt = st.dt
m1, p1 = transfer.g2p2g_model(cfg, mat, pv, st.partition.table, m, dt, dt, jnp.zeros_like(st.grid), 4)
m2, p2 = pg.g2p2g_pallas(cfg, mat, pv, st.partition.table, m, dt, dt, jnp.zeros_like(st.grid), interpret=True)
print("pos diff:", float(jnp.max(jnp.abs(m1.pos - m2.pos))))
print("F diff:", float(jnp.max(jnp.abs(m1.fields['F'] - m2.fields['F']))))
print("active equal:", bool(jnp.all(m1.active == m2.active)))
d = np.abs(np.asarray(p1) - np.asarray(p2))
print("pool diff max:", d.max(), "at", np.unravel_index(np.argmax(d), d.shape))
print("pool mass sums:", float(p1[:,0].sum()), float(p2[:,0].sum()))
act = np.asarray(m1.active)
pd = np.abs(np.asarray(m1.pos) - np.asarray(m2.pos))[:, act]
fd = np.abs(np.asarray(m1.fields['F']) - np.asarray(m2.fields['F']))[:, act]
print("ACTIVE pos diff:", pd.max(), "F diff:", fd.max())
