"""Collision-object tests (reference boundary_condition.cuh semantics)."""

import numpy as np
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.models import boundary
from claymore_tpu.io.sampler import sample_uniform_box_world


def make_fields(vel_vec):
    # [B, 3, bv] with B=2 blocks of 8 cells for simplicity
    xw = np.random.default_rng(0).uniform(0.2, 0.8, (2, 3, 8)).astype(np.float32)
    v = np.tile(np.asarray(vel_vec, np.float32)[None, :, None], (2, 1, 8))
    return jnp.asarray(xw), jnp.asarray(v)


def test_halfspace_sticky_zeroes_inside():
    col = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="sticky")
    xw, v = make_fields((0.3, -1.0, 0.2))
    out = np.asarray(col.resolve(xw, v, jnp.float32(0.0)))
    below = np.asarray(xw)[:, 1, :] < 0.5
    assert np.all(out[:, :, :][np.broadcast_to(below[:, None, :], out.shape)] == 0.0)
    above = ~below
    assert np.allclose(out[np.broadcast_to(above[:, None, :], out.shape)],
                       np.asarray(v)[np.broadcast_to(above[:, None, :], out.shape)])


def test_halfspace_slip_removes_normal_component():
    col = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="slip")
    xw, v = make_fields((0.3, -1.0, 0.2))
    out = np.asarray(col.resolve(xw, v, jnp.float32(0.0)))
    below = np.asarray(xw)[:, 1, :] < 0.5
    # normal (y) velocity zeroed, tangential kept
    assert np.allclose(out[:, 1, :][below], 0.0)
    assert np.allclose(out[:, 0, :][below], 0.3, atol=1e-6)
    assert np.allclose(out[:, 2, :][below], 0.2, atol=1e-6)


def test_separate_keeps_separating_velocity():
    col = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="separate")
    xw, v_in = make_fields((0.0, 1.0, 0.0))   # moving away from the surface
    out = np.asarray(col.resolve(xw, v_in, jnp.float32(0.0)))
    assert np.allclose(out, np.asarray(v_in))


def test_slip_friction_slows_tangential():
    col = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="slip",
                             friction=0.5)
    xw, v = make_fields((1.0, -1.0, 0.0))
    out = np.asarray(col.resolve(xw, v, jnp.float32(0.0)))
    below = np.asarray(xw)[:, 1, :] < 0.5
    # |v_t| = 1, v.n = -1 -> slowed by friction*|v.n| = 0.5
    assert np.allclose(out[:, 0, :][below], 0.5, atol=1e-5)
    col2 = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="slip",
                              friction=5.0)
    out2 = np.asarray(col2.resolve(xw, v, jnp.float32(0.0)))
    assert np.allclose(out2[:, 0, :][below], 0.0)  # fully stopped


def test_moving_collider_inherits_velocity():
    motion = boundary.RigidMotion(trans_vel=(0.2, 0.0, 0.0))
    col = boundary.HalfSpace((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), kind="sticky",
                             motion=motion)
    xw, v = make_fields((0.0, -1.0, 0.0))
    out = np.asarray(col.resolve(xw, v, jnp.float32(0.0)))
    below = np.asarray(xw)[:, 1, :] < 0.5
    # sticky to a moving object -> cell velocity equals object velocity
    assert np.allclose(out[:, 0, :][below], 0.2, atol=1e-6)
    assert np.allclose(out[:, 1, :][below], 0.0, atol=1e-6)


def test_sdf_collider_matches_analytic_sphere():
    n = 64
    dx = 1.0 / n
    grid = np.stack(np.meshgrid(*([np.arange(n) * dx] * 3), indexing="ij"), 0)
    center = np.array([0.5, 0.5, 0.5])
    sdf = np.linalg.norm(grid - center[:, None, None, None], axis=0) - 0.2
    col = boundary.SignedDistanceCollider(sdf, dx, kind="slip", bound_cells=2)
    ref = boundary.Sphere(center, 0.2, kind="slip")
    xw = jnp.asarray(
        np.random.default_rng(1).uniform(0.32, 0.68, (4, 3, 8)).astype(np.float32)
    )
    v = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3, 8)).astype(np.float32))
    o1 = np.asarray(col.resolve(xw, v, jnp.float32(0.0)))
    o2 = np.asarray(ref.resolve(xw, v, jnp.float32(0.0)))
    # exclude the sphere center where the analytic normal is singular
    r = np.linalg.norm(np.asarray(xw) - center[None, :, None], axis=1)
    ok = np.broadcast_to((r > 0.05)[:, None, :], o1.shape)
    assert np.max(np.abs(o1 - o2)[ok]) < 0.05  # trilinear SDF vs analytic


def test_engine_with_sphere_collider_runs():
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    col = boundary.Sphere((0.5, 0.3, 0.5), 0.12, kind="separate")
    eng = cmt.MPMEngine(cfg, [mat], colliders=[col], tile_chunk=4)
    pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.55] * 3, cfg.ppc)
    state = eng.init_state([pos])
    for _ in range(5):
        state = eng.substep(state, jnp.float32(1.0))
    d = eng.diagnostics(state)
    assert np.isfinite(d["grid_mass"]) and d["grid_mass"] > 0


def test_signed_distance_collider_claymore_binary_format(tmp_path):
    """Round-trip the reference's *_sdf.bin + *_grad_{0,1,2}.bin asset format
    (reference init_from_signed_distance_file, boundary_condition.cuh:297-320:
    raw float32, C row-major with z innermost)."""
    import numpy as np
    from claymore_tpu.models import boundary as bnd

    res = (8, 6, 5)
    rng = np.random.default_rng(0)
    sdf = rng.normal(size=res).astype(np.float32)
    grads = rng.normal(size=(3,) + res).astype(np.float32)
    prefix = str(tmp_path / "collider")
    sdf.reshape(-1).tofile(prefix + "_sdf.bin")
    for c in range(3):
        grads[c].reshape(-1).tofile(prefix + f"_grad_{c}.bin")

    col = bnd.SignedDistanceCollider.from_claymore_files(
        prefix, res, dx=1.0 / 8)
    assert np.allclose(np.asarray(col.values), sdf)
    assert np.allclose(np.asarray(col.grads), grads)

    # scene-level wiring
    from claymore_tpu.io.scene import _build_collider
    import claymore_tpu as cmt
    cfg = cmt.SimConfig(domain_bits=5)
    c2 = _build_collider(
        {"type": "sdf_file", "prefix": prefix, "resolution": list(res),
         "dx": 1.0 / 8, "kind": "slip"}, cfg)
    assert np.allclose(np.asarray(c2.values), sdf)
