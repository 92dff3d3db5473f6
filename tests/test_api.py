"""API-surface tests: runtime parameter updates (reference
update_*_parameters, gmpm_simulator.cuh:211-254), stage timers, package
exports."""

import time

import numpy as np
import pytest
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.io.sampler import sample_uniform_box_world
from claymore_tpu.utils.timers import StageTimer


@pytest.mark.slow
def test_update_material_rejits_and_softens():
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    # resting on the sticky floor slab (y = 0.25 at domain_bits 5) so the
    # impact deforms the block and stiffness matters
    pos = sample_uniform_box_world(cfg.dx, [0.45, 0.26, 0.45],
                                   [0.55, 0.36, 0.55], cfg.ppc)
    state = eng.init_state([pos], [(0.0, -2.0, 0.0)])
    soft = eng.update_material(0, e=1e2)
    assert soft.materials[0].e == 1e2
    assert soft.materials[0].nu == mat.nu  # untouched params preserved

    fe = jnp.float32(1.0)
    s_hard, s_soft = state, state
    for _ in range(20):
        s_hard = eng.substep(s_hard, fe)
        s_soft = soft.substep(s_soft, fe)
    # same mass, different dynamics
    dh = eng.diagnostics(s_hard)
    ds = soft.diagnostics(s_soft)
    assert abs(dh["grid_mass"] - ds["grid_mass"]) < 1e-4 * dh["grid_mass"]
    fh = np.asarray(s_hard.models[0].fields["F"])
    fs = np.asarray(s_soft.models[0].fields["F"])
    assert np.max(np.abs(fh - fs)) > 1e-6  # different stiffness, different F


def test_stage_timer():
    t = StageTimer()
    t.tick()
    time.sleep(0.01)
    dt = t.tock("sleepy")
    assert dt >= 0.01
    with t.stage("ctx"):
        time.sleep(0.005)
    rows = dict((r[0], r) for r in t.summary())
    assert "sleepy" in rows and "ctx" in rows
    assert "sleepy" in t.report()


def test_package_exports():
    assert callable(cmt.load_scene)
    for name in ("SimConfig", "MPMEngine", "FixedCorotated", "JFluid", "Sand",
                 "NACC", "HalfSpace", "Sphere", "Box", "SignedDistanceCollider",
                 "RigidMotion", "SimState", "Partition"):
        assert hasattr(cmt, name), name


def test_distributed_pod_mesh():
    """Multi-host helpers degrade gracefully on a single process and build
    meshes over the local (virtual) device set."""
    import jax
    from claymore_tpu.parallel import distributed

    assert distributed.init_multihost() is False  # no coordinator configured
    m = distributed.pod_mesh((4, 2), ("x", "z"))
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("x", "z")
    m1 = distributed.pod_mesh((2,), ("x",))
    assert m1.devices.shape == (2,)
