"""Independent dense-grid float64 MPM reference for equivalence testing.

Plain numpy, per-particle loops, dense 3-D grid — deliberately shares no code
with the engine.  Implements the same physics as the reference's fused kernel
chain (Projects/GMPM/mgmpm_kernels.cuh:326-937) so an engine substep can be
checked against it on small scenes (SURVEY.md section 4 test strategy).
"""

from __future__ import annotations

import numpy as np


def signed_svd3(f):
    u, s, vt = np.linalg.svd(f)
    v = vt.T
    if np.linalg.det(u) < 0:
        u[:, 2] *= -1
        s[2] *= -1
    if np.linalg.det(v) < 0:
        v[:, 2] *= -1
        s[2] *= -1
    return u, s, v


def bspline_w(d):
    """d in [0.5, 1.5]: weights for stencil cells base, base+1, base+2."""
    return np.array([
        0.5 * (1.5 - d) ** 2,
        0.75 - (d - 1.0) ** 2,
        0.5 * (d - 0.5) ** 2,
    ])


def fixed_corotated_contrib(f, e, nu, volume):
    lam = e * nu / ((1 + nu) * (1 - 2 * nu))
    mu = e / (2 * (1 + nu))
    u, s, v = signed_svd3(f)
    j = s[0] * s[1] * s[2]
    sl = lam * (j - 1.0)
    p_hat = np.array([
        2 * mu * (s[0] - 1) + sl * s[1] * s[2],
        2 * mu * (s[1] - 1) + sl * s[0] * s[2],
        2 * mu * (s[2] - 1) + sl * s[0] * s[1],
    ])
    p = u @ np.diag(p_hat) @ v.T
    return p @ f.T * volume


def sand_update(f, log_jp, mat):
    """Drucker-Prager projection + StvkHencky stress, float64
    (independent re-derivation of constitutive_models.cuh:239-335)."""
    lam = mat.e * mat.nu / ((1 + mat.nu) * (1 - 2 * mat.nu))
    mu = mat.e / (2 * (1 + mat.nu))
    u, sv, v = signed_svd3(f)
    eps = np.log(np.maximum(np.abs(sv), 1e-4)) - mat.cohesion
    sum_eps = eps.sum()
    trace_eps = sum_eps + log_jp
    eps_hat = eps - trace_eps / 3.0
    hat_norm = np.linalg.norm(eps_hat)
    if trace_eps >= 0.0:
        new_s = np.full(3, np.exp(mat.cohesion))
        new_log_jp = mat.beta * sum_eps + log_jp if mat.volume_correction else log_jp
    else:
        new_log_jp = 0.0
        dg = hat_norm + (3 * lam + 2 * mu) / (2 * mu) * trace_eps * mat.yield_surface
        if dg <= 0:
            h = eps + mat.cohesion
        else:
            h = eps - dg / max(hat_norm, 1e-20) * eps_hat + mat.cohesion
        new_s = np.exp(h)
    f_new = u @ np.diag(new_s) @ v.T
    log_s = np.log(new_s)
    p_hat = (2 * mu * log_s + lam * log_s.sum()) / new_s
    p = u @ np.diag(p_hat) @ v.T
    return f_new, new_log_jp, p @ f_new.T * mat.volume


def nacc_update(f, log_jp, mat):
    """NACC projection + hardening + elasticity, float64 (independent
    re-derivation of constitutive_models.cuh:78-234, Josh-fracture solve)."""
    mu = mat.e / (2 * (1 + mat.nu))
    bm, xi, beta, msqr = mat.bm, mat.xi, mat.beta, mat.msqr
    u, sv, v = signed_svd3(f)
    p0 = bm * (1e-5 + np.sinh(xi * max(-log_jp, 0.0)))
    p_min = -beta * p0
    je = sv[0] * sv[1] * sv[2]
    b_hat = sv * sv
    tr3 = b_hat.sum() / 3.0
    s_hat = mu * je ** (-2.0 / 3.0) * (b_hat - tr3)
    p_trial = -bm * 0.5 * (je - 1.0 / je) * je
    ys_half = 1.5 * (1 + 2 * beta)
    yp_half = msqr * (p_trial - p_min) * (p_trial - p0)
    s_sqr = (s_hat ** 2).sum()
    y = ys_half * s_sqr + yp_half
    new_log_jp = log_jp
    new_s = sv.copy()
    if p_trial > p0 or p_trial < p_min:
        p_tip = p0 if p_trial > p0 else p_min
        je_new = np.sqrt(max(-2 * p_tip / bm + 1.0, 1e-12))
        new_s[:] = je_new ** (1.0 / 3.0)
        if mat.hardening_on:
            new_log_jp = log_jp + np.log(je / je_new)
    elif y >= 1e-4:
        b_coeff = (je ** (2.0 / 3.0) / mu * np.sqrt(max(-yp_half, 0.0) / ys_half)
                   / np.sqrt(max(s_sqr, 1e-20)))
        new_s = np.sqrt(np.maximum(s_hat * b_coeff + tr3, 1e-12))
        if (mat.hardening_on and p0 > 1e-4 and p_trial < p0 - 1e-4
                and p_trial > 1e-4 + p_min):
            p_center = (1 - beta) * p0 / 2
            q_trial = np.sqrt(1.5 * s_sqr)
            d0, d1 = p_center - p_trial, -q_trial
            dn = np.sqrt(d0 * d0 + d1 * d1)
            d0, d1 = d0 / dn, d1 / dn
            cc = msqr * (p_center - p_min) * (p_center - p0)
            bb = msqr * d0 * (2 * p_center - p0 - p_min)
            aa = msqr * d0 * d0 + (1 + 2 * beta) * d1 * d1
            disc = np.sqrt(max(bb * bb - 4 * aa * cc, 0.0))
            l1, l2 = (-bb + disc) / (2 * aa), (-bb - disc) / (2 * aa)
            p1, p2 = p_center + l1 * d0, p_center + l2 * d0
            p_fake = p1 if (p_trial - p_center) * (p1 - p_center) > 0 else p2
            je_fake = np.sqrt(abs(-2 * p_fake / bm + 1.0))
            if je_fake > 1e-4:
                new_log_jp = log_jp + np.log(je / je_fake)
    f_new = u @ np.diag(new_s) @ v.T
    jd = new_s[0] * new_s[1] * new_s[2]
    b = f_new @ f_new.T
    b_dev = b - np.trace(b) / 3.0 * np.eye(3)
    dev_c = mu * max(jd, 1e-12) ** (-2.0 / 3.0)
    i_c = bm * 0.5 * ((jd * jd - 1.0) * 0.5 - np.log(max(jd, 1e-12)))
    return f_new, new_log_jp, (dev_c * b_dev + i_c * np.eye(3)) * mat.volume


def jfluid_contrib(jdet, a, d_inv, volume, bulk, gamma, viscosity):
    voln = jdet * volume
    pressure = bulk * (jdet ** (-gamma) - 1.0)
    sym = (a + a.T) * d_inv * viscosity
    return (sym - pressure * np.eye(3)) * voln


class DenseMPM:
    """Dense-grid explicit MLS-MPM, float64."""

    def __init__(self, cfg, material):
        self.cfg = cfg
        self.mat = material
        n = cfg.domain_size
        self.grid_m = np.zeros((n, n, n))
        self.grid_mom = np.zeros((n, n, n, 3))

    def rasterize(self, pos, v0):
        cfg = self.cfg
        m = self.mat.mass
        for p in range(pos.shape[0]):
            x = pos[p]
            base = np.floor(x * cfg.dx_inv + 0.5).astype(int) - 1
            d = x * cfg.dx_inv - base
            w = [bspline_w(d[k]) for k in range(3)]
            for i in range(3):
                for jj in range(3):
                    for k in range(3):
                        wgt = w[0][i] * w[1][jj] * w[2][k]
                        c = (base[0] + i, base[1] + jj, base[2] + k)
                        self.grid_m[c] += m * wgt
                        self.grid_mom[c] += m * wgt * np.asarray(v0)

    def grid_update(self, dt, gravity):
        cfg = self.cfg
        n = cfg.domain_size
        bs = cfg.block_size
        bound = cfg.bound_blocks
        g = cfg.grid_size
        v = np.zeros_like(self.grid_mom)
        mask = self.grid_m > 0
        v[mask] = self.grid_mom[mask] / self.grid_m[mask][:, None]
        # per-block sticky slab
        idx = np.arange(n) // bs
        near = (idx < bound) | (idx >= g - bound)
        v[near, :, :, 0] = 0.0
        v[:, near, :, 1] = 0.0
        v[:, :, near, 2] = 0.0
        v[mask] += np.asarray(gravity) * dt
        v[~mask] = 0.0
        self.grid_v = v
        sq = np.sum(v * v, axis=-1)
        return np.max(sq[mask]) if mask.any() else 0.0

    def g2p2g(self, pos, fields, dt, next_dt):
        cfg = self.cfg
        mat = self.mat
        d_inv = cfg.d_inv
        m = mat.mass
        new_m = np.zeros_like(self.grid_m)
        new_mom = np.zeros_like(self.grid_mom)
        new_pos = pos.copy()
        new_fields = {k: v.copy() for k, v in fields.items()}
        for p in range(pos.shape[0]):
            x = pos[p].astype(np.float64)
            base = np.floor(x * cfg.dx_inv + 0.5).astype(int) - 1
            d = x * cfg.dx_inv - base
            w = [bspline_w(d[k]) for k in range(3)]
            vel = np.zeros(3)
            amat = np.zeros((3, 3))
            for i in range(3):
                for jj in range(3):
                    for k in range(3):
                        wgt = w[0][i] * w[1][jj] * w[2][k]
                        cell = (base[0] + i, base[1] + jj, base[2] + k)
                        xixp = (np.array(cell)) * cfg.dx - x
                        vi = self.grid_v[cell]
                        vel += wgt * vi
                        amat += wgt * np.outer(vi, xixp)
            xn = x + vel * dt

            if mat.name == "fixed_corotated":
                f = (np.eye(3) + dt * d_inv * amat) @ fields["F"][p]
                contrib = fixed_corotated_contrib(f, mat.e, mat.nu, mat.volume)
                new_fields["F"][p] = f
            elif mat.name == "jfluid":
                jd = fields["J"][p]
                jd = jd + np.trace(amat) * dt * d_inv * jd
                jd = max(jd, 0.1)
                contrib = jfluid_contrib(
                    jd, amat, d_inv, mat.volume, mat.bulk, mat.gamma, mat.viscosity
                )
                new_fields["J"][p] = jd
            elif mat.name == "sand":
                f = (np.eye(3) + dt * d_inv * amat) @ fields["F"][p]
                f, ljp, contrib = sand_update(f, fields["logJp"][p], mat)
                new_fields["F"][p] = f
                new_fields["logJp"][p] = ljp
            elif mat.name == "nacc":
                f = (np.eye(3) + dt * d_inv * amat) @ fields["F"][p]
                f, ljp, contrib = nacc_update(f, fields["logJp"][p], mat)
                new_fields["F"][p] = f
                new_fields["logJp"][p] = ljp
            else:
                raise NotImplementedError(mat.name)

            q = (amat * m - contrib * next_dt) * d_inv
            new_pos[p] = xn
            base2 = np.floor(xn * cfg.dx_inv + 0.5).astype(int) - 1
            d2 = xn * cfg.dx_inv - base2
            w2 = [bspline_w(d2[k]) for k in range(3)]
            for i in range(3):
                for jj in range(3):
                    for k in range(3):
                        wgt = w2[0][i] * w2[1][jj] * w2[2][k]
                        cell = (base2[0] + i, base2[1] + jj, base2[2] + k)
                        xixp = np.array(cell) * cfg.dx - xn
                        new_m[cell] += m * wgt
                        new_mom[cell] += wgt * (m * vel + q @ xixp)
        self.grid_m = new_m
        self.grid_mom = new_mom
        return new_pos, new_fields
