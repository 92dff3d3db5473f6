"""Mesh -> SDF generation (io/meshsdf.py): the reference's SDFGen pipeline
(Externals/SDFGen/makelevelset3.cpp) re-implemented, validated on an
analytic cube mesh."""

import os

import numpy as np

from claymore_tpu.io.meshsdf import mesh_to_sdf, obj_to_sdf_file, read_obj
from claymore_tpu.io.sdf import read_sdf_file, sample_sdf


def unit_cube_mesh(lo=0.0, hi=1.0):
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                  for z in (lo, hi)], float)
    # 12 triangles, outward-consistent winding not required (parity sign)
    f = np.array([
        [0, 1, 3], [0, 3, 2],      # x = lo
        [4, 7, 5], [4, 6, 7],      # x = hi
        [0, 4, 5], [0, 5, 1],      # y = lo
        [2, 3, 7], [2, 7, 6],      # y = hi
        [0, 2, 6], [0, 6, 4],      # z = lo
        [1, 5, 7], [1, 7, 3],      # z = hi
    ])
    return v, f


def test_cube_sdf_sign_and_distance():
    v, f = unit_cube_mesh(0.0, 1.0)
    dx = 0.1
    sd, origin, d = mesh_to_sdf(v, f, dx, padding=3)
    ni, nj, nk = sd.shape
    idx = np.stack(np.meshgrid(np.arange(ni), np.arange(nj), np.arange(nk),
                               indexing="ij"), axis=-1)
    p = origin + idx * dx
    inside = np.all((p > 0) & (p < 1), axis=-1)
    # distance correct vs the analytic cube SDF (inside: -min face dist;
    # outside: distance to the box), within a sweeping tolerance
    q = np.maximum(np.maximum(-p, p - 1.0), 0.0)
    outside_d = np.sqrt((q ** 2).sum(axis=-1))
    inside_d = -np.minimum(np.minimum(p, 1.0 - p).min(axis=-1), 1e9)
    ref = np.where(inside, inside_d, outside_d)
    # sign correct on every cell that is measurably off the surface
    off = np.abs(ref) > 1e-9
    assert np.all((sd < 0)[off] == inside[off])
    err = np.abs(sd - ref)
    assert err[off].max() < 2 * dx, err[off].max()
    # near the surface (the band), distances are exact-ish
    near = off & (np.abs(ref) < 1.5 * dx)
    assert err[near].max() < 1e-6, err[near].max()


def test_obj_roundtrip_and_sampling(tmp_path):
    v, f = unit_cube_mesh(0.2, 0.8)
    obj = os.path.join(tmp_path, "cube.obj")
    with open(obj, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a + 1} {b + 1} {c + 1}\n")
    rv, rf = read_obj(obj)
    assert rv.shape == v.shape and rf.shape == f.shape

    sdfp = os.path.join(tmp_path, "cube.sdf")
    obj_to_sdf_file(obj, sdfp, dx=0.05)
    vals, origin, d = read_sdf_file(sdfp)
    # seed particles inside the level set at sim resolution; all must land
    # inside the (slightly dilated) cube
    pts = sample_sdf(vals, d, ppc=8.0, domain_dx=1.0 / 64,
                     offset=(0.2, 0.2, 0.2), span=(0.6, 0.6, 0.6))
    # the level-set bbox (cube + padding) is scaled into the span, so all
    # samples land inside [offset, offset + span]
    assert len(pts) > 500
    assert pts.min() >= 0.2 and pts.max() <= 0.8
