"""Probe Mosaic support + cost of dynamic lane ops needed by the oct kernel:
  (a) pltpu.roll with a traced (data-dependent) shift on [16, 128] f32
  (b) dynamic lane-offset read  ref[:, pl.ds(k*16, 32)]
  (c) dynamic lane-offset accumulate write ref[:, pl.ds(k*16, 16)] += v
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, build):
    try:
        out = build()
        out.block_until_ready()
        print(f"  {name}: OK   sum={float(jnp.sum(out)):.1f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"  {name}: FAIL {type(e).__name__}: {msg}")


x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
shifts = jnp.asarray([3 * 16], jnp.int32)


def dyn_roll():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], 1)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(shifts, x)


def dyn_lane_read():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:, pl.ds(s_ref[0], 32)]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 32), jnp.float32),
    )(shifts, x)


def dyn_lane_read_wide():
    """read 32 lanes at dynamic offset from a [16, 384] (3-oct) window"""
    xw = jnp.arange(16 * 384, dtype=jnp.float32).reshape(16, 384)

    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:, pl.ds(s_ref[0] + 112, 32)]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 32), jnp.float32),
    )(shifts, xw)


def dyn_lane_write():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = jnp.zeros((16, 128), jnp.float32)
        o_ref[:, pl.ds(s_ref[0], 32)] = x_ref[:, :32] * 2.0
        o_ref[:, pl.ds(s_ref[0] + 32, 16)] += x_ref[:, :16]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(shifts, x)


if __name__ == "__main__":
    probe("dynamic roll (traced shift)", dyn_roll)
    probe("dynamic lane ds read [16,128]->32", dyn_lane_read)
    probe("dynamic lane ds read [16,384]->32", dyn_lane_read_wide)
    probe("dynamic lane ds write/accum", dyn_lane_write)
