"""Constitutive models.

TPU-native re-implementation of the reference's per-material stress kernels
(reference: Projects/GMPM/constitutive_models.cuh — fixed corotated :36-73,
NACC :78-234, Drucker-Prager sand :239-335; J-fluid is inlined in the
reference G2P2G at Projects/GMPM/mgmpm_kernels.cuh:474-516).

Design: each material is a frozen dataclass of *static* Python parameters
(re-jit on change, mirroring the reference's template instantiation per
material) plus a pure batched ``update`` function
    update(mat, d_inv, dt, A, fields) -> (new_fields, contrib)
where ``A`` is the unscaled APIC moment  A_rc = sum_i W_i v_i_r (x_i - x_p)_c
gathered in G2P, ``fields`` is the material's particle state dict and
``contrib`` is the Kirchhoff-like stress term P F^T V_0 used by the fused
momentum scatter  Q = (A m - contrib * dt_next) * D_inv.

The branchy plasticity projections become jnp.where ladders: both branches
are evaluated vectorized on the VPU, which is the idiomatic (and on TPU the
fast) formulation of the reference's divergent CUDA branches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..ops import math3d

Fields = Dict[str, jnp.ndarray]

_I3 = jnp.eye(3, dtype=jnp.float32)


def lame_parameters(e: float, nu: float) -> Tuple[float, float]:
    lam = e * nu / ((1 + nu) * (1 - 2 * nu))
    mu = e / (2 * (1 + nu))
    return lam, mu


@dataclasses.dataclass(frozen=True)
class Material:
    """Base: common mass/volume bookkeeping (reference particle_buffer.cuh:141-264)."""

    rho: float = 1e3
    volume: float = (1.0 / 256.0) ** 3 / 8.0

    @property
    def mass(self) -> float:
        return self.rho * self.volume

    name: str = "base"
    # particle fields beyond position this material carries
    field_specs: Tuple[Tuple[str, Tuple[int, ...]], ...] = ()

    def init_fields(self, n: int) -> Fields:
        raise NotImplementedError

    def update(self, d_inv, dt, A, fields: Fields):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class JFluid(Material):
    """Weakly-compressible Tait fluid (reference mgmpm_kernels.cuh:474-516)."""

    bulk: float = 4e4
    gamma: float = 7.15
    viscosity: float = 0.01
    name: str = "jfluid"
    field_specs: Tuple[Tuple[str, Tuple[int, ...]], ...] = (("J", ()),)

    def init_fields(self, n: int) -> Fields:
        return {"J": jnp.ones((n,), jnp.float32)}

    def update(self, d_inv, dt, A, fields: Fields):
        J = fields["J"]
        trA = math3d.trace3(A)
        J = J + trA * dt * d_inv * J
        J = jnp.maximum(J, 0.1)
        voln = J * self.volume
        pressure = self.bulk * (jnp.power(J, -self.gamma) - 1.0)
        sym = (A + jnp.swapaxes(A, -1, -2)) * (d_inv * self.viscosity)
        contrib = (sym - pressure[..., None, None] * _I3) * voln[..., None, None]
        return {"J": J}, contrib


@dataclasses.dataclass(frozen=True)
class FixedCorotated(Material):
    """Fixed corotated elasticity (reference constitutive_models.cuh:36-73)."""

    e: float = 5e3
    nu: float = 0.4
    name: str = "fixed_corotated"
    field_specs: Tuple[Tuple[str, Tuple[int, ...]], ...] = (("F", (3, 3)),)

    @property
    def lame(self) -> Tuple[float, float]:
        return lame_parameters(self.e, self.nu)

    def init_fields(self, n: int) -> Fields:
        return {"F": jnp.broadcast_to(_I3, (n, 3, 3)).copy()}

    def update(self, d_inv, dt, A, fields: Fields):
        lam, mu = self.lame
        F = (_I3 + (dt * d_inv) * A) @ fields["F"]
        u, s, v = math3d.svd3(F)
        J = s[..., 0] * s[..., 1] * s[..., 2]
        scaled_lambda = lam * (J - 1.0)
        p_hat = jnp.stack(
            [
                2.0 * mu * (s[..., 0] - 1.0) + scaled_lambda * s[..., 1] * s[..., 2],
                2.0 * mu * (s[..., 1] - 1.0) + scaled_lambda * s[..., 0] * s[..., 2],
                2.0 * mu * (s[..., 2] - 1.0) + scaled_lambda * s[..., 0] * s[..., 1],
            ],
            axis=-1,
        )
        P = math3d.u_sigma_vt(u, p_hat, v)
        contrib = (P @ jnp.swapaxes(F, -1, -2)) * self.volume
        return {"F": F}, contrib


@dataclasses.dataclass(frozen=True)
class Sand(Material):
    """Drucker-Prager sand with StvkHencky elasticity
    (reference constitutive_models.cuh:239-335)."""

    e: float = 5e3
    nu: float = 0.4
    cohesion: float = 0.0
    beta: float = 1.0
    log_jp0: float = 0.0
    friction_angle: float = 30.0
    volume_correction: bool = True
    name: str = "sand"
    field_specs: Tuple[Tuple[str, Tuple[int, ...]], ...] = (
        ("F", (3, 3)),
        ("logJp", ()),
    )

    @property
    def lame(self) -> Tuple[float, float]:
        return lame_parameters(self.e, self.nu)

    @property
    def yield_surface(self) -> float:
        sin_phi = math.sin(self.friction_angle / 180.0 * math.pi)
        return math.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)

    def init_fields(self, n: int) -> Fields:
        return {
            "F": jnp.broadcast_to(_I3, (n, 3, 3)).copy(),
            "logJp": jnp.full((n,), self.log_jp0, jnp.float32),
        }

    def update(self, d_inv, dt, A, fields: Fields):
        lam, mu = self.lame
        F = (_I3 + (dt * d_inv) * A) @ fields["F"]
        log_jp = fields["logJp"]
        u, s, v = math3d.svd3(F)

        eps = jnp.log(jnp.maximum(jnp.abs(s), 1e-4)) - self.cohesion
        sum_eps = jnp.sum(eps, axis=-1)
        trace_eps = sum_eps + log_jp
        eps_hat = eps - (trace_eps / 3.0)[..., None]
        eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1)
        safe_norm = jnp.maximum(eps_hat_norm, 1e-20)

        # case II: project to cone tip
        tip = trace_eps >= 0.0
        s_tip = jnp.full_like(eps, math.exp(self.cohesion))

        # case I/III
        delta_gamma = (
            eps_hat_norm
            + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * trace_eps * self.yield_surface
        )
        h_inside = eps + self.cohesion
        h_project = eps - (delta_gamma / safe_norm)[..., None] * eps_hat + self.cohesion
        h = jnp.where((delta_gamma <= 0.0)[..., None], h_inside, h_project)
        s_cone = jnp.exp(h)

        new_s = jnp.where(tip[..., None], s_tip, s_cone)
        new_log_jp = jnp.where(
            tip,
            (self.beta * sum_eps + log_jp) if self.volume_correction else log_jp,
            0.0,
        )
        F = math3d.u_sigma_vt(u, new_s, v)

        # StvkHencky stress on the projected state
        log_s = jnp.log(new_s)
        trace_log_s = jnp.sum(log_s, axis=-1)
        p_hat = (2.0 * mu * log_s + lam * trace_log_s[..., None]) / new_s
        P = math3d.u_sigma_vt(u, p_hat, v)
        contrib = (P @ jnp.swapaxes(F, -1, -2)) * self.volume
        return {"F": F, "logJp": new_log_jp}, contrib


@dataclasses.dataclass(frozen=True)
class NACC(Material):
    """Non-associated Cam-Clay (reference constitutive_models.cuh:78-234)."""

    e: float = 5e3
    nu: float = 0.4
    beta: float = 0.5
    xi: float = 0.8
    log_jp0: float = -0.01
    friction_angle: float = 45.0
    hardening_on: bool = True
    name: str = "nacc"
    field_specs: Tuple[Tuple[str, Tuple[int, ...]], ...] = (
        ("F", (3, 3)),
        ("logJp", ()),
    )

    @property
    def lame(self) -> Tuple[float, float]:
        return lame_parameters(self.e, self.nu)

    @property
    def bm(self) -> float:
        lam, mu = self.lame
        return 2.0 / 3.0 * mu + lam

    @property
    def msqr(self) -> float:
        sin_phi = math.sin(self.friction_angle / 180.0 * math.pi)
        mohr_columb_friction = math.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)
        m = mohr_columb_friction * 3.0 / math.sqrt(2.0 / 3.0)
        return m * m

    def init_fields(self, n: int) -> Fields:
        return {
            "F": jnp.broadcast_to(_I3, (n, 3, 3)).copy(),
            "logJp": jnp.full((n,), self.log_jp0, jnp.float32),
        }

    def update(self, d_inv, dt, A, fields: Fields):
        lam, mu = self.lame
        del lam  # NACC uses the bulk modulus formulation
        bm, xi, beta, msqr = self.bm, self.xi, self.beta, self.msqr
        F = (_I3 + (dt * d_inv) * A) @ fields["F"]
        log_jp = fields["logJp"]
        u, s, v = math3d.svd3(F)

        p0 = bm * (1e-5 + jnp.sinh(xi * jnp.maximum(-log_jp, 0.0)))
        p_min = -beta * p0
        je_trial = s[..., 0] * s[..., 1] * s[..., 2]

        b_hat = s * s
        trace_b_div3 = jnp.sum(b_hat, axis=-1) / 3.0
        j_pow_mu = mu * jnp.power(je_trial, -2.0 / 3.0)
        s_hat = j_pow_mu[..., None] * (b_hat - trace_b_div3[..., None])
        psi_kappa_dj = bm * 0.5 * (je_trial - 1.0 / je_trial)
        p_trial = -psi_kappa_dj * je_trial

        ys_half = 1.5 * (1.0 + 2.0 * beta)
        yp_half = msqr * (p_trial - p_min) * (p_trial - p0)
        s_hat_sqr = jnp.sum(s_hat * s_hat, axis=-1)
        y = ys_half * s_hat_sqr + yp_half

        # --- case 1/2: project to a tip of the yield surface ---
        hit_max = p_trial > p0
        hit_min = p_trial < p_min
        p_tip = jnp.where(hit_max, p0, p_min)
        je_tip = jnp.sqrt(jnp.maximum(-2.0 * p_tip / bm + 1.0, 1e-12))
        s_tip = jnp.power(je_tip, 1.0 / 3.0)[..., None] * jnp.ones_like(s)

        # --- case 3: yield-surface projection when outside ---
        outside = (~hit_max) & (~hit_min) & (y >= 1e-4)
        safe_shat = jnp.maximum(s_hat_sqr, 1e-20)
        b_s_coeff = (
            jnp.power(je_trial, 2.0 / 3.0)
            / mu
            * jnp.sqrt(jnp.maximum(-yp_half, 0.0) / ys_half)
            / jnp.sqrt(safe_shat)
        )
        s_proj = jnp.sqrt(
            jnp.maximum(s_hat * b_s_coeff[..., None] + trace_b_div3[..., None], 1e-12)
        )

        new_s = jnp.where(
            (hit_max | hit_min)[..., None], s_tip, jnp.where(outside[..., None], s_proj, s)
        )

        # --- hardening (19 Josh fracture paper solve, USE_JOSH_FRACTURE_PAPER) ---
        new_log_jp = log_jp
        if self.hardening_on:
            tip_update = jnp.log(
                jnp.maximum(je_trial, 1e-12) / jnp.maximum(je_tip, 1e-12)
            )
            new_log_jp = jnp.where(hit_max | hit_min, log_jp + tip_update, new_log_jp)

            harden3 = outside & (p0 > 1e-4) & (p_trial < p0 - 1e-4) & (p_trial > 1e-4 + p_min)
            p_center = (1.0 - beta) * p0 / 2.0
            q_trial = jnp.sqrt(1.5 * safe_shat)
            dir0 = p_center - p_trial
            dir1 = -q_trial
            dn = jnp.sqrt(jnp.maximum(dir0 * dir0 + dir1 * dir1, 1e-20))
            dir0, dir1 = dir0 / dn, dir1 / dn
            cc = msqr * (p_center - p_min) * (p_center - p0)
            bb = msqr * dir0 * (2.0 * p_center - p0 - p_min)
            aa = msqr * dir0 * dir0 + (1.0 + 2.0 * beta) * dir1 * dir1
            disc = jnp.sqrt(jnp.maximum(bb * bb - 4.0 * aa * cc, 0.0))
            safe_aa = jnp.where(jnp.abs(aa) < 1e-20, 1e-20, aa)
            l1 = (-bb + disc) / (2.0 * safe_aa)
            l2 = (-bb - disc) / (2.0 * safe_aa)
            p1 = p_center + l1 * dir0
            p2 = p_center + l2 * dir0
            p_fake = jnp.where((p_trial - p_center) * (p1 - p_center) > 0.0, p1, p2)
            je_sqr = -2.0 * p_fake / bm + 1.0
            je_fake = jnp.sqrt(jnp.abs(je_sqr))
            h_update = jnp.log(jnp.maximum(je_trial, 1e-12) / jnp.maximum(je_fake, 1e-12))
            new_log_jp = jnp.where(harden3 & (je_fake > 1e-4), new_log_jp + h_update, new_log_jp)

        F = math3d.u_sigma_vt(u, new_s, v)

        # --- elasticity on renewed F ---
        J = new_s[..., 0] * new_s[..., 1] * new_s[..., 2]
        b = F @ jnp.swapaxes(F, -1, -2)
        b_dev = math3d.deviatoric(b)
        dev_b_coeff = mu * jnp.power(jnp.maximum(J, 1e-12), -2.0 / 3.0)
        i_coeff = bm * 0.5 * ((J * J - 1.0) * 0.5 - jnp.log(jnp.maximum(J, 1e-12)))
        contrib = (
            dev_b_coeff[..., None, None] * b_dev + i_coeff[..., None, None] * _I3
        ) * self.volume
        return {"F": F, "logJp": new_log_jp}, contrib


MATERIALS: Dict[str, Any] = {
    "jfluid": JFluid,
    "fixed_corotated": FixedCorotated,
    "sand": Sand,
    "nacc": NACC,
}


def from_scene(constitutive: str, cfg_volume: float, params: Dict[str, Any]) -> Material:
    """Build a material from claymore scene-JSON keys (reference gmpm.cu:112-139)."""
    if constitutive == "fixed_corotated":
        return FixedCorotated(
            rho=params.get("rho", 1e3),
            volume=params.get("volume", cfg_volume),
            e=params.get("youngs_modulus", 5e3),
            nu=params.get("poisson_ratio", 0.4),
        )
    if constitutive == "jfluid":
        return JFluid(
            rho=params.get("rho", 1e3),
            volume=params.get("volume", cfg_volume),
            bulk=params.get("bulk_modulus", 4e4),
            gamma=params.get("gamma", 7.15),
            viscosity=params.get("viscosity", 0.01),
        )
    if constitutive == "nacc":
        return NACC(
            rho=params.get("rho", 1e3),
            volume=params.get("volume", cfg_volume),
            e=params.get("youngs_modulus", 5e3),
            nu=params.get("poisson_ratio", 0.4),
            beta=params.get("beta", 0.5),
            xi=params.get("xi", 0.8),
        )
    if constitutive == "sand":
        return Sand(
            rho=params.get("rho", 1e3),
            volume=params.get("volume", cfg_volume),
            e=params.get("youngs_modulus", 5e3),
            nu=params.get("poisson_ratio", 0.4),
        )
    raise ValueError(f"unknown constitutive model: {constitutive}")
