"""grid_update_pallas vs the XLA grid_update oracle (interpret mode).

Covers: occupied/empty cells, boundary octs on every face (sticky slab
keep-masks incl. the z-per-lane case), the appended null row, the ragged
final pallas program, and NaN momentum poisoning the CFL max.
"""

import numpy as np
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.core import grid as grid_ops
from claymore_tpu.core.types import Partition
from claymore_tpu.ops.pallas_grid import grid_update_pallas


def _random_partition_pool(cfg, n_active, seed=0, nan_at=None):
    rng = np.random.default_rng(seed)
    no = cfg.num_oct_keys
    nb = cfg.max_active_octs
    keys = np.full((nb,), no, np.int32)
    keys[:n_active] = rng.choice(no, size=n_active, replace=False)
    pool = np.zeros((nb + 1, 16, 128), np.float32)
    mass = rng.uniform(0.0, 2.0, size=(n_active, 4, 128)).astype(np.float32)
    mass[mass < 0.6] = 0.0                       # plenty of empty cells
    mom = rng.normal(0.0, 1e-3, size=(n_active, 12, 128)).astype(np.float32)
    pool[:n_active, 0:4] = mass
    pool[:n_active, 4:16] = mom
    if nan_at is not None:
        pool[nan_at, 5, 7] = np.nan              # mom-x row of cell cx=1
        pool[nan_at, 1, 7] = 1.0                 # massy, so the NaN counts
    part = Partition(
        table=jnp.zeros((no + 1,), jnp.int32),   # unused by grid update
        keys=jnp.asarray(keys),
        count=jnp.full((1,), n_active, jnp.int32),
        overflow=jnp.zeros((1,), jnp.int32),
    )
    return part, jnp.asarray(pool)


def _check(cfg, part, pool, dt=3e-4, colliders=(), t=0.0, atol=1e-9):
    ref_pool, ref_max = grid_ops.grid_update(cfg, pool, part,
                                             jnp.float32(dt), colliders,
                                             jnp.float32(t))
    pal_pool, pal_max = grid_update_pallas(cfg, pool, part,
                                           jnp.float32(dt),
                                           colliders=colliders,
                                           collider_time=jnp.float32(t),
                                           interpret=True)
    rp, pp = np.asarray(ref_pool), np.asarray(pal_pool)
    # mass rows are pass-through: bit-exact
    np.testing.assert_array_equal(rp[:, 0:4], pp[:, 0:4])
    # velocities may differ by FMA-contraction ulps between the two
    # lowerings (observed 4.7e-10 abs on CPU interpret vs XLA:CPU)
    np.testing.assert_allclose(rp[:, 4:16], pp[:, 4:16],
                               rtol=1e-4, atol=atol)
    rm, pm = float(ref_max), float(pal_max)
    if np.isinf(rm):
        assert np.isinf(pm)
    else:
        # collider projections accumulate a few FMA ulps into |v|^2
        mtol = 1e-12 if not colliders else 1e-6
        assert abs(rm - pm) <= mtol * max(1.0, abs(rm))


def test_matches_xla_incl_boundary_octs():
    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=192)
    # n_active chosen so active octs certainly include boundary coords
    part, pool = _random_partition_pool(cfg, n_active=150, seed=1)
    _check(cfg, part, pool)


def test_ragged_grid_and_null_row():
    # max_active_octs + 1 = 97: not a multiple of any pallas row block
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=96)
    part, pool = _random_partition_pool(cfg, n_active=60, seed=2)
    # put mass in the null row too: it must be processed like the XLA path
    pool = pool.at[-1, 0:4].set(1.0)
    pool = pool.at[-1, 4:8].set(0.25)
    _check(cfg, part, pool)


def test_analytic_colliders_in_kernel_match_xla():
    """Half-space + sphere + box (mixed kinds, friction, animated motion)
    resolved INSIDE the Pallas grid kernel vs the XLA oracle (the
    reference resolves collisions in-kernel, MGSP/mgmpm_kernels.cuh:363)."""
    from claymore_tpu.models.boundary import (
        Box, HalfSpace, RigidMotion, Sphere)

    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=192)
    part, pool = _random_partition_pool(cfg, n_active=150, seed=4)
    colliders = (
        HalfSpace((0.0, 0.3, 0.0), (0.1, 1.0, 0.0), kind="slip",
                  friction=0.3),
        Sphere((0.5, 0.5, 0.5), 0.2, kind="separate", friction=0.1,
               motion=RigidMotion(trans_vel=(0.05, 0.0, 0.0),
                                  omega=(0.0, 1.5, 0.0))),
        Box((0.6, 0.1, 0.6), (0.9, 0.4, 0.9), kind="sticky"),
    )
    assert all(c.pallas_ok for c in colliders)
    # atol 1e-7: the in-kernel projection's FMA ordering differs from the
    # XLA oracle's by a few ulps on near-zero velocities
    _check(cfg, part, pool, colliders=colliders, t=0.37, atol=1e-7)


def test_sdf_collider_is_not_pallas_ok():
    from claymore_tpu.models.boundary import SignedDistanceCollider

    sdf = np.ones((8, 8, 8), np.float32)
    col = SignedDistanceCollider(sdf, dx=1.0 / 8)
    assert not col.pallas_ok


def test_nan_momentum_poisons_max():
    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=128)
    part, pool = _random_partition_pool(cfg, n_active=100, seed=3, nan_at=5)
    _, mx = grid_update_pallas(cfg, pool, part, jnp.float32(1e-4),
                               interpret=True)
    assert np.isinf(float(mx))


def _sphere_sdf_grid(n, dx, center, radius):
    ax = (np.arange(n) * dx).astype(np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                    + (z - center[2]) ** 2) - radius).astype(np.float32)


def test_static_sdf_collider_oct_cache_matches_xla():
    """A STATIC SignedDistanceCollider rides the Pallas grid kernel via a
    pre-sampled per-cell (sd, n) cache (VERDICT r4 item 7; reference
    resolves SDF collisions in-kernel, MGSP/mgmpm_kernels.cuh:363 +
    boundary_condition.cuh:159-249).  The grid update only evaluates the
    SDF at cell positions, so an f32 cache reproduces the XLA trilinear
    path exactly; the shipped bf16 cache differs only by storage
    quantization."""
    from claymore_tpu.models.boundary import SignedDistanceCollider

    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=192)
    part, pool = _random_partition_pool(cfg, n_active=150, seed=7)
    sdf = _sphere_sdf_grid(32, 1.0 / 32, (0.5, 0.45, 0.5), 0.22)
    col = SignedDistanceCollider(sdf, dx=1.0 / 32, kind="separate",
                                 friction=0.2)
    assert not col.pallas_ok          # no in-kernel gather form...
    assert col.oct_cache_ok(cfg)      # ...but static -> cacheable
    col.build_oct_cache(cfg, dtype=jnp.float32)   # exact for the test
    _check(cfg, part, pool, colliders=(col,), t=0.0, atol=1e-7)


def test_animated_sdf_collider_keeps_xla_path():
    from claymore_tpu.models.boundary import (RigidMotion,
                                              SignedDistanceCollider)

    cfg = cmt.SimConfig(domain_bits=6, max_active_blocks=64)
    sdf = np.ones((8, 8, 8), np.float32)
    col = SignedDistanceCollider(sdf, dx=1.0 / 8,
                                 motion=RigidMotion(omega=(0, 1.0, 0)))
    assert not col.oct_cache_ok(cfg)
    from claymore_tpu.ops.pallas_grid import kernel_colliders_ok
    assert not kernel_colliders_ok(cfg, (col,))


def test_static_sdf_engine_end_to_end():
    """Full engine equivalence: pallas (cached SDF in-kernel) vs XLA with
    the same collider — positions must track within cache quantization."""
    from claymore_tpu.io.sampler import sample_uniform_box_world
    from claymore_tpu.models.boundary import SignedDistanceCollider

    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256,
                        default_dt=5e-4, g2p_arena_dtype="float32",
                        mxu_precision="highest")
    mat = cmt.JFluid(volume=cfg.default_volume())
    pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.58] * 3, cfg.ppc)
    sdf = _sphere_sdf_grid(16, 1.0 / 16, (0.5, 0.35, 0.5), 0.18)
    col = SignedDistanceCollider(sdf, dx=1.0 / 16, kind="slip",
                                 friction=0.1, bound_cells=1)
    col.build_oct_cache(cfg, dtype=jnp.float32)
    import warnings
    e_p = cmt.MPMEngine(cfg, [mat], colliders=(col,), tile_chunk=4,
                        use_pallas="interpret")
    with warnings.catch_warnings():
        warnings.simplefilter("error")        # XLA engine must NOT warn
        e_x = cmt.MPMEngine(cfg, [mat], colliders=(col,), tile_chunk=4)
    s_p = e_p.init_state([pos], [(0.2, -0.4, 0.1)])
    s_x = e_x.init_state([pos], [(0.2, -0.4, 0.1)])
    fe = jnp.float32(1.0)
    for _ in range(3):
        s_p = e_p.substep(s_p, fe)
        s_x = e_x.substep(s_x, fe)
    pp, px = e_p.get_positions(s_p), e_x.get_positions(s_x)
    assert pp.shape == px.shape
    kp = np.lexsort((pp[:, 2], pp[:, 1], pp[:, 0]))
    kx = np.lexsort((px[:, 2], px[:, 1], px[:, 0]))
    assert np.max(np.abs(pp[kp] - px[kx])) < 1e-6
