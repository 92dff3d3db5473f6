import time
import numpy as np
import jax, jax.numpy as jnp

S = 688128
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.permutation(S).astype(np.int32))
key = jnp.asarray(rng.integers(0, 8192, S).astype(np.int32))
data1 = jnp.asarray(rng.standard_normal(S).astype(np.float32))
data16 = jnp.asarray(rng.standard_normal((S,16)).astype(np.float32))
data16T = jnp.asarray(np.ascontiguousarray(np.asarray(data16).T))
datas = [jnp.asarray(rng.standard_normal(S).astype(np.float32)) for _ in range(14)]

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")

timeit("gather 1-D [S]", jax.jit(lambda d, i: d[i]), data1, idx)
timeit("gather rows [S,16]", jax.jit(lambda d, i: d[i]), data16, idx)
timeit("gather lanes [16,S]", jax.jit(lambda d, i: d[:, i]), data16T, idx)
timeit("gather 2-D reshape [S/128,128]", jax.jit(lambda d, i: d.reshape(-1,128)[i//128, i%128]), data1, idx)
timeit("sort key+1 payload", jax.jit(lambda k, d: jax.lax.sort((k, d), num_keys=1)), key, data1)
timeit("sort key+14 payloads", jax.jit(lambda k, *ds: jax.lax.sort((k,)+ds, num_keys=1)), key, *datas)
timeit("argsort", jax.jit(lambda k: jnp.argsort(k)), key)
timeit("scatter 1-D set", jax.jit(lambda d, i: jnp.zeros_like(d).at[i].set(d)), data1, idx)
timeit("scatter rows [S,16]", jax.jit(lambda d, i: jnp.zeros_like(d).at[i].set(d)), data16, idx)
