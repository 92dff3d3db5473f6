"""IO layer tests: bgeo round trip, sdf round trip + sampling, scene JSON
end-to-end, async writer (reference has no tests for its IO layer;
SURVEY.md section 4)."""

import json
import os

import numpy as np
import pytest

from claymore_tpu.io import bgeo, sdf as sdf_io, async_io
from claymore_tpu.io.scene import load_scene


def test_bgeo_roundtrip(tmp_path):
    n = 1000
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    attrs = {
        "J": rng.uniform(0.5, 1.5, n).astype(np.float32),
        "v": rng.normal(size=(n, 3)).astype(np.float32),
        "id": np.arange(n, dtype=np.int32),
    }
    path = str(tmp_path / "cloud.bgeo")
    bgeo.write_bgeo(path, pos, attrs)
    rpos, rattrs = bgeo.read_bgeo(path)
    assert np.array_equal(rpos, pos)
    assert np.array_equal(rattrs["J"], attrs["J"])
    assert np.array_equal(rattrs["v"], attrs["v"])
    assert np.array_equal(rattrs["id"], attrs["id"])


def test_bgeo_header_bytes(tmp_path):
    path = str(tmp_path / "h.bgeo")
    bgeo.write_bgeo(path, np.zeros((2, 3), np.float32))
    data = open(path, "rb").read()
    assert data[:5] == b"BgeoV"
    assert data[-2:] == b"\x00\xff"


def test_sdf_roundtrip_and_sampling(tmp_path):
    n = 24
    dx = 1.0 / n
    grid = (np.arange(n) + 0.5) * dx
    gx, gy, gz = np.meshgrid(grid, grid, grid, indexing="ij")
    center = 0.5 * n * dx
    sdf = np.sqrt((gx - center) ** 2 + (gy - center) ** 2 + (gz - center) ** 2) - 0.3
    path = str(tmp_path / "sphere.sdf")
    sdf_io.write_sdf_file(path, sdf, (0, 0, 0), dx)
    values, origin, rdx = sdf_io.read_sdf_file(path)
    assert values.shape == (n, n, n)
    assert abs(rdx - dx) < 1e-12
    assert np.max(np.abs(values - sdf)) < 1e-5

    pts = sdf_io.read_sdf(path, ppc=8.0, domain_dx=1.0 / 64,
                          offset=(0.3, 0.3, 0.3), span=(0.4, 0.4, 0.4))
    assert len(pts) > 100
    assert np.all(pts >= 0.29) and np.all(pts <= 0.71)
    # particles fill a sphere: center of mass near box center
    assert np.max(np.abs(pts.mean(axis=0) - 0.5)) < 0.02


def test_scene_json_end_to_end(tmp_path):
    scene = {
        "simulation": {"default_dt": 5e-4, "fps": 96, "frames": 1},
        "grid": {"domain_bits": 5, "max_active_blocks": 256},
        "models": [
            {
                "constitutive": "fixed_corotated",
                "shape": {"type": "box"},
                "offset": [0.4, 0.5, 0.4],
                "span": [0.2, 0.2, 0.2],
                "velocity": [0.0, -0.5, 0.0],
                "rho": 1000.0,
                "youngs_modulus": 1e4,
                "poisson_ratio": 0.3,
            },
            {
                "constitutive": "jfluid",
                "shape": {"type": "sphere"},
                "offset": [0.3, 0.2, 0.3],
                "span": [0.15, 0.15, 0.15],
                "velocity": [0.0, 0.0, 0.0],
                "rho": 1000.0,
                "bulk_modulus": 4e4,
                "gamma": 7.15,
                "viscosity": 0.01,
            },
        ],
        "colliders": [
            {"type": "halfspace", "kind": "slip", "origin": [0, 0.15, 0],
             "normal": [0, 1, 0], "friction": 0.2}
        ],
    }
    path = str(tmp_path / "scene.json")
    json.dump(scene, open(path, "w"))
    sc = load_scene(path, tile_chunk=4)
    assert sc.frames == 1
    assert len(sc.materials) == 2
    d0 = sc.engine.diagnostics(sc.state)
    total = sum(
        len(p) * m.mass for p, m in zip(sc.positions, sc.materials)
    )
    assert abs(d0["grid_mass"] - total) < 1e-3 * total
    st = sc.engine.run(sc.state, 1)
    d = sc.engine.diagnostics(st)
    assert abs(d["grid_mass"] - total) < 1e-3 * total


def test_async_io_overlap(tmp_path):
    out = []
    for i in range(5):
        async_io.insert_job(lambda i=i: out.append(i))
    async_io.flush()
    assert out == [0, 1, 2, 3, 4]

    def boom():
        raise RuntimeError("disk full")

    async_io.insert_job(boom)
    with pytest.raises(RuntimeError):
        async_io.flush()


def test_poisson_sampling_blue_noise(tmp_path):
    """mode='poisson' must run weighted sample elimination end-to-end
    (reference read_sdf -> GeneratePoissonSamples, ParticleIO.hpp:32-97):
    at equal count, the worst nearest-neighbor spacing must beat a jittered
    lattice clipped to the same level set."""
    import numpy as np
    from claymore_tpu.io import sdf as sdf_mod

    # synthetic sphere level set
    n = 24
    ax = (np.arange(n) + 0.5) / n - 0.5
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    values = np.sqrt(gx**2 + gy**2 + gz**2) - 0.35

    kw = dict(sdf_dx=1.0 / n, ppc=8.0, domain_dx=1.0 / 32,
              offset=[0.3] * 3, span=[0.4] * 3)
    pois = sdf_mod.sample_sdf(values, mode="poisson", seed=1, **kw)
    assert pois.shape[0] > 200

    # jittered lattice at the same count (the old 'poisson' behavior)
    rng = np.random.default_rng(1)
    h = kw["domain_dx"] / kw["ppc"] ** (1 / 3)
    uni = sdf_mod.sample_sdf(values, mode="uniform", **kw)
    jit = uni + rng.uniform(-0.45, 0.45, uni.shape) * h
    k = min(len(pois), len(jit))
    pois, jit = pois[:k], jit[:k]

    def min_nn(pts):
        d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1)

    # 5th-percentile nearest-neighbor spacing: blue noise >> jittered
    q_pois = np.quantile(min_nn(pois), 0.05)
    q_jit = np.quantile(min_nn(jit), 0.05)
    assert q_pois > 1.5 * q_jit, (q_pois, q_jit)


def test_config5_scene_schema():
    """BASELINE config 5 (100M particles, 1024^3 grid, 8-chip 4x2 mesh):
    the scene file's schema is loader-compatible and its sphere samples to
    ~100M particles at the configured grid (checked arithmetically — the
    scene itself needs 8 real chips and ~7 GB of positions)."""
    import json
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                        "sphere_100m_8dev.json")
    doc = json.load(open(path))
    g = doc["grid"]
    assert g["domain_bits"] == 10
    mesh = doc["device"]["mesh_shape"]
    assert int(np.prod(mesh)) == 8
    m = doc["models"][0]
    assert m["shape"]["type"] == "sphere"
    r = min(m["span"]) / 2
    cells = (1 << g["domain_bits"]) ** 3
    particles = 4.0 / 3.0 * np.pi * r ** 3 * cells * 8.0  # 8 ppc
    assert 90e6 < particles < 110e6, particles
    # grid block capacity covers the occupied sphere blocks + dilation
    blocks = particles / (8 * 64)
    assert blocks / 8 < g["max_active_blocks"], "per-shard pool too small"
