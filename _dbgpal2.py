import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
import claymore_tpu as cmt
from claymore_tpu.core import transfer, grid as grid_ops, partition as part
from claymore_tpu.ops import pallas_g2p2g as pg
from claymore_tpu.io.sampler import sample_uniform_box_world
from claymore_tpu.utils.debug import pool_to_dense

cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
pos = sample_uniform_box_world(cfg.dx, [0.45]*3, [0.58]*3, cfg.ppc)
st = eng.init_state([pos], [(0.2,-0.3,0.1)])
pv, _ = grid_ops.grid_update(cfg, st.grid, st.partition, st.dt, (), jnp.float32(0))
m = st.models[0]
dt = st.dt
m1, _ = transfer.g2p2g_model(cfg, mat, pv, st.partition.table, m, dt, dt, jnp.zeros_like(st.grid), 4)
m2, _ = pg.g2p2g_pallas(cfg, mat, pv, st.partition.table, m, dt, dt, jnp.zeros_like(st.grid), interpret=True)

# dense velocity grid for exact reference
st_v = st._replace(grid=pv)
_, mom = pool_to_dense(cfg, st_v)   # here channels 1:4 are velocities
vel_grid = mom
p0 = np.asarray(m.pos)
act = np.asarray(m.active)
i = int(np.argmax(np.abs(np.asarray(m1.pos) - np.asarray(m2.pos)).max(0) * act))
x = p0[:, i]
base = np.floor(x / cfg.dx + 0.5).astype(int) - 1
d = x / cfg.dx - base
def bw(dd): return np.array([0.5*(1.5-dd)**2, 0.75-(dd-1)**2, 0.5*(dd-0.5)**2])
w = [bw(d[k]) for k in range(3)]
v_ref = np.zeros(3)
for a_ in range(3):
    for b_ in range(3):
        for c_ in range(3):
            v_ref += w[0][a_]*w[1][b_]*w[2][c_]*vel_grid[base[0]+a_, base[1]+b_, base[2]+c_]
v1 = (np.asarray(m1.pos)[:, i] - x) / float(dt)
v2 = (np.asarray(m2.pos)[:, i] - x) / float(dt)
print("particle", i, "x:", x, "base:", base)
# which tile/home block
hb = np.asarray(part.home_block(cfg, m.pos))[:, i]
print("home block:", hb, "li:", base - hb*4)
print("v_ref:", v_ref)
print("v_xla:", v1)
print("v_pal:", v2)
from claymore_tpu.core.transfer import neighbor_slots, _arena_from_slots
tm = m.tiles
nb = neighbor_slots(cfg, st.partition.table, tm.bcoord)
nb = jnp.where(tm.tvalid[:, None], nb, cfg.null_block).astype(jnp.int32)
ar_k = pg.gather_arenas(cfg, pv, nb)
ar_x = _arena_from_slots(cfg, pv, nb[1:2])
print("tile1 arena pallas nonzeros:", int(jnp.sum(ar_k[1] != 0)))
print("tile1 arena xla nonzeros:", int(jnp.sum(ar_x[0,1:4] != 0)))
print("arena diff:", float(jnp.max(jnp.abs(ar_k[1] - ar_x[0,1:4]))))
# where in the arena is the particle reading?
print("tile of slot 310 block:", np.asarray(tm.bcoord)[:,1], "tvalid:", bool(tm.tvalid[1]))
