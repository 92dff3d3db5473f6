"""Batched 3x3 matrix math for the VPU.

TPU-native replacement for the reference's branch-free device SVD and matrix
helpers (reference: Library/MnBase/Math/Matrix/svd.cuh:28,
MatrixUtils.h:29-272).  Instead of translating the bit-twiddled CUDA code we
implement the same McAdams-style pipeline (cyclic Jacobi on A^T A followed by
a Givens QR of A V) with pure vectorized jnp so XLA maps it onto the VPU over
arbitrary batch shapes.  Singular values are *signed*: U and V are proper
rotations (det=+1) and the smallest-magnitude sigma carries the sign of
det(A), which is the convention MPM plasticity models rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 5
_EPS = 1e-12


def _jacobi_rotation(app, aqq, apq):
    """Stable Jacobi rotation (c, s) zeroing the (p, q) entry of a symmetric
    matrix, fully branch-free."""
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < _EPS, 1.0, apq))
    # t = sign(tau) / (|tau| + sqrt(1 + tau^2))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < _EPS, 0.0, t)
    c = jax.lax.rsqrt(1.0 + t * t)
    s = t * c
    return c, s


def _apply_jacobi(b, v, p, q):
    """One cyclic Jacobi step on symmetric ``b`` (batched [..., 3, 3]),
    accumulating the rotation into ``v``."""
    c, s = _jacobi_rotation(b[..., p, p], b[..., q, q], b[..., p, q])
    c = c[..., None]
    s = s[..., None]
    # rotate rows p, q of b
    bp = c * b[..., p, :] - s * b[..., q, :]
    bq = s * b[..., p, :] + c * b[..., q, :]
    b = b.at[..., p, :].set(bp).at[..., q, :].set(bq)
    # rotate cols p, q of b
    bpc = c * b[..., :, p] - s * b[..., :, q]
    bqc = s * b[..., :, p] + c * b[..., :, q]
    b = b.at[..., :, p].set(bpc).at[..., :, q].set(bqc)
    # accumulate into v
    vp = c * v[..., :, p] - s * v[..., :, q]
    vq = s * v[..., :, p] + c * v[..., :, q]
    v = v.at[..., :, p].set(vp).at[..., :, q].set(vq)
    return b, v


def _givens(a, b):
    """(c, s) with [c -s; s c]^T [a; b] = [r; 0], branch-free."""
    r = jnp.sqrt(a * a + b * b)
    inv = jnp.where(r > _EPS, 1.0 / jnp.maximum(r, _EPS), 0.0)
    c = jnp.where(r > _EPS, a * inv, 1.0)
    s = jnp.where(r > _EPS, -b * inv, 0.0)
    return c, s


def _qr_accumulate(m):
    """Givens QR of batched [..., 3, 3] ``m``; returns (q, r) with q a proper
    rotation."""
    q = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    r = m
    for (i, j) in ((1, 0), (2, 0), (2, 1)):
        c, s = _givens(r[..., j, j], r[..., i, j])
        c = c[..., None]
        s = s[..., None]
        rj = c * r[..., j, :] - s * r[..., i, :]
        ri = s * r[..., j, :] + c * r[..., i, :]
        r = r.at[..., j, :].set(rj).at[..., i, :].set(ri)
        qj = c * q[..., j, :] - s * q[..., i, :]
        qi = s * q[..., j, :] + c * q[..., i, :]
        q = q.at[..., j, :].set(qj).at[..., i, :].set(qi)
    return jnp.swapaxes(q, -1, -2), r


def svd3(a):
    """Signed SVD of batched 3x3 matrices: ``a = u @ diag(s) @ v^T``.

    u, v are proper rotations; ``s`` is sorted by decreasing magnitude and
    s[..., 2] carries the sign of det(a).  Matches the semantics of the
    reference device SVD (svd.cuh) without translating it.
    """
    dtype = a.dtype
    b = jnp.swapaxes(a, -1, -2) @ a
    v = jnp.broadcast_to(jnp.eye(3, dtype=dtype), b.shape)
    v = jnp.array(v)
    for _ in range(_JACOBI_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            b, v = _apply_jacobi(b, v, p, q)

    # sort eigenvalues descending, permute v accordingly
    ev = jnp.stack([b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]], axis=-1)
    order = jnp.flip(jnp.argsort(ev, axis=-1), axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    # keep v a proper rotation
    det_v = jnp.linalg.det(v)
    v = v.at[..., :, 2].multiply(jnp.sign(det_v)[..., None])

    av = a @ v
    u, r = _qr_accumulate(av)
    s = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)

    # QR may leave negative diagonals in r for the first two entries; push
    # those signs into u columns so only the last sigma stays signed.
    for k in (0, 1):
        sign = jnp.sign(jnp.where(s[..., k] == 0, 1.0, s[..., k]))
        u = u.at[..., :, k].multiply(sign[..., None])
        s = s.at[..., k].multiply(sign)
        # flipping one column flips det(u); compensate on the last column
        u = u.at[..., :, 2].multiply(sign[..., None])
        s = s.at[..., 2].multiply(sign)
    return u, s, v


def polar_rotation(a):
    """Rotation factor R of the polar decomposition a = R S."""
    u, _, v = svd3(a)
    return u @ jnp.swapaxes(v, -1, -2)


def det3(a):
    return jnp.linalg.det(a)


def trace3(a):
    return a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2]


def deviatoric(a):
    """a - tr(a)/3 * I for batched 3x3."""
    t = trace3(a) / 3.0
    return a - t[..., None, None] * jnp.eye(3, dtype=a.dtype)


def diag_mat(s):
    """[..., 3] -> [..., 3, 3] diagonal."""
    return s[..., :, None] * jnp.eye(3, dtype=s.dtype)


def u_sigma_vt(u, s, v):
    """Recompose u @ diag(s) @ v^T."""
    return (u * s[..., None, :]) @ jnp.swapaxes(v, -1, -2)
