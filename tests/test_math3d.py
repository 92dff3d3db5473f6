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


def test_polar3_newton_matches_svd_rotation():
    """soa3.polar3 (det-scaled Newton, no SVD) vs the SVD rotation,
    over the deformation-gradient range MPM produces."""
    from claymore_tpu.ops import soa3

    for scale, seed in ((0.05, 3), (0.4, 4), (1.0, 5)):
        a = random_batch(512, scale=scale, seed=seed)
        # keep to the non-inverted regime (det > 0), like stable MPM
        d = np.linalg.det(a.astype(np.float64))
        a = a[d > 0.05]
        # float64 truth (NOT svd3: its f32 Jacobi rotation carries ~4e-3
        # error near clustered singular values; polar3 measures ~1e-7)
        u64, _, vt64 = np.linalg.svd(a.astype(np.float64))
        r_ref = u64 @ vt64
        m = soa3.from_dense(jnp.asarray(a))
        r = np.stack(
            [np.asarray(c) for c in soa3.polar3(m)], axis=-1
        ).reshape(-1, 3, 3)
        assert np.max(np.abs(r - r_ref)) < 1e-4, np.max(np.abs(r - r_ref))
        eye = np.eye(3)
        assert np.max(np.abs(np.einsum("nij,nik->njk", r, r) - eye)) < 2e-4


def test_polar3_degenerate_stays_finite():
    """Near-singular X must fail softly (held fixed), not blow up through
    the eta = |det|^{-1/3} scaling (ADVICE r3, soa3.polar3 guard)."""
    from claymore_tpu.ops import soa3

    a = np.zeros((4, 3, 3), np.float32)
    a[0] = 0.0                                    # exactly singular
    a[1] = np.diag([1.0, 1.0, 0.0])               # rank 2
    a[2] = np.diag([1e-8, 1e-8, 1e-8])            # det underflows in f32
    a[3] = np.eye(3)                              # sanity
    r = np.stack([np.asarray(c) for c in soa3.polar3(soa3.from_dense(jnp.asarray(a)))],
                 axis=-1).reshape(-1, 3, 3)
    assert np.all(np.isfinite(r))
    assert np.max(np.abs(r)) < 10.0
    assert np.max(np.abs(r[3] - np.eye(3))) < 1e-6


def test_fixed_corotated_inverted_is_restorative():
    """For det(F) < 0 the FC stress must not vanish at an inverted rest
    state: the contribution magnitude stays comparable to 2 mu |F|."""
    from claymore_tpu.models.materials import FixedCorotated
    from claymore_tpu.ops import soa3

    mat = FixedCorotated(volume=1e-6, e=5e3, nu=0.4)
    _, mu = mat.lame
    n = 8
    # inverted rest states: R0 diag(-1, 1, 1), would give F - polar(F) = 0
    rng = np.random.default_rng(11)
    f = np.tile(np.diag([-1.0, 1.0, 1.0]).astype(np.float32), (n, 1, 1))
    f9 = f.reshape(n, 9).T
    A = tuple(jnp.zeros(n, jnp.float32) for _ in range(9))
    _, contrib = mat.update(4.0, 0.0, A, {"F": jnp.asarray(f9)})
    got = np.stack([np.asarray(c) for c in contrib], axis=-1).reshape(n, 3, 3)
    # with the det<0 guard, |contrib| ~ 2 mu |F - (-R)| V0 > 0
    assert np.min(np.max(np.abs(got), axis=(1, 2))) > 0.5 * mu * mat.volume


def test_fixed_corotated_polar_identity_matches_svd_form():
    """FC contrib via the polar identity == the reference's
    U diag(p) V^T F^T V0 form (constitutive_models.cuh:36-73)."""
    from claymore_tpu.models.materials import FixedCorotated, f9_to_soa
    from claymore_tpu.ops import soa3

    mat = FixedCorotated(volume=1e-6, e=5e3, nu=0.4)
    lam, mu = mat.lame
    rng = np.random.default_rng(7)
    n = 512
    f9 = np.asarray(
        (np.eye(3) + 0.3 * rng.standard_normal((n, 3, 3)))
        .reshape(n, 9).T, dtype=np.float32)
    A = tuple(jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
              for _ in range(9))
    new_fields, contrib = mat.update(4.0, 1e-4, A, {"F": jnp.asarray(f9)})
    # reference formula on the UPDATED F (float64)
    fn = np.asarray(new_fields["F"], np.float64).T.reshape(n, 3, 3)
    # compare in the non-inverted regime only: for det(F) < 0 the polar
    # factor (det -1) intentionally differs from the reference's
    # signed-SVD rotation convention (see soa3.polar3 docstring)
    keep = np.linalg.det(fn) > 0.05
    u, s, vt = np.linalg.svd(fn)
    v = np.swapaxes(vt, 1, 2)
    # fix improper rotations (np svd returns orthogonal, not rotations)
    for arr in (u, v):
        neg = np.linalg.det(arr) < 0
        arr[neg, :, 2] *= -1.0
    s = np.where((np.linalg.det(fn) < 0)[:, None]
                 & (np.arange(3) == 2)[None, :], -s, s)
    J = s[:, 0] * s[:, 1] * s[:, 2]
    p = 2 * mu * (s - 1.0) + (lam * (J - 1.0) * J)[:, None] / s
    P = np.einsum("nij,nj,nkj->nik", u, p, v)
    ref = np.einsum("nij,nkj->nik", P, fn) * mat.volume
    got = np.stack([np.asarray(c, np.float64) for c in contrib],
                   axis=-1).reshape(n, 3, 3)
    got, ref = got[keep], ref[keep]
    assert keep.sum() > n // 2  # the mask must not trivialize the test
    scale_ref = np.maximum(1.0, np.max(np.abs(ref)))
    assert np.max(np.abs(got - ref)) < 2e-5 * scale_ref, (
        np.max(np.abs(got - ref)), scale_ref)
