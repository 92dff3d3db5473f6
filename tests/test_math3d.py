"""SVD and matrix helper tests against float64 numpy references
(reference device SVD: Library/MnBase/Math/Matrix/svd.cuh)."""

import numpy as np
import jax.numpy as jnp

from claymore_tpu.ops import math3d


def random_batch(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (np.eye(3) + scale * rng.standard_normal((n, 3, 3))).astype(np.float32)


def check_svd(a, tol=2e-5):
    u, s, v = math3d.svd3(jnp.asarray(a))
    u, s, v = np.asarray(u), np.asarray(s), np.asarray(v)
    # reconstruction
    rec = np.einsum("nij,nj,nkj->nik", u, s, v)
    assert np.max(np.abs(rec - a)) < tol * max(1.0, np.max(np.abs(a))), (
        np.max(np.abs(rec - a)))
    # proper rotations
    assert np.allclose(np.linalg.det(u), 1.0, atol=1e-4)
    assert np.allclose(np.linalg.det(v), 1.0, atol=1e-4)
    # orthogonality
    eye = np.eye(3)
    assert np.max(np.abs(np.einsum("nij,nik->njk", u, u) - eye)) < 1e-4
    assert np.max(np.abs(np.einsum("nij,nik->njk", v, v) - eye)) < 1e-4
    # singular value magnitudes match numpy (float64)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    assert np.max(np.abs(np.abs(s) - s_ref) / (1.0 + s_ref)) < 1e-4
    # sign convention: det sign carried by last sigma
    sign = np.sign(np.linalg.det(a.astype(np.float64)))
    assert np.allclose(np.sign(s[:, 2]) * (np.abs(s[:, 2]) > 1e-7), sign * (np.abs(s[:, 2]) > 1e-7))


def test_svd_near_identity():
    check_svd(random_batch(512, scale=0.05, seed=1))


def test_svd_general():
    check_svd(random_batch(512, scale=0.8, seed=2))


def test_svd_inverted():
    a = random_batch(256, scale=0.3, seed=3)
    a[:, :, 0] *= -1.0  # flip determinant
    check_svd(a)


def test_svd_identity_and_diagonal():
    a = np.stack([np.eye(3, dtype=np.float32),
                  np.diag(np.array([2.0, 0.5, 1.0], np.float32)),
                  np.diag(np.array([1e-3, 1.0, 3.0], np.float32))])
    check_svd(a, tol=1e-5)


def test_deviatoric_traceless():
    a = jnp.asarray(random_batch(64, 1.0, 4))
    d = math3d.deviatoric(a)
    assert np.max(np.abs(np.asarray(math3d.trace3(d)))) < 1e-4


def test_polar_rotation():
    a = random_batch(64, 0.2, 5)
    r = np.asarray(math3d.polar_rotation(jnp.asarray(a)))
    assert np.allclose(np.linalg.det(r), 1.0, atol=1e-4)
    assert np.max(np.abs(np.einsum("nij,nik->njk", r, r) - np.eye(3))) < 1e-4
