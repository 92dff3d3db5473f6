"""Collision objects / boundary conditions.

TPU-native re-implementation of the reference's grid-space collision objects
(reference: Projects/MGSP/boundary_condition.cuh — SignedDistanceGrid
:15-137, animated rigid transform and STICKY/SLIP/SEPARATE projection with
Coulomb friction in detect_and_resolve_collision :159-249).  The per-cell
CUDA loop becomes a vectorized ``resolve(cell_positions, velocities, t)``
over the whole sparse grid pool; the trilinear SDF fetch is a dense gather.

Beyond the reference we add analytic colliders (half-space, sphere, box) —
they share the same projection math and need no SDF asset.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

STICKY = "sticky"
SLIP = "slip"
SEPARATE = "separate"


def _project(vel_rel, n, kind: str, friction: float):
    """Velocity projection in the object frame (reference
    boundary_condition.cuh:197-246).  vel_rel, n: [..., 3, cells]-style
    component-leading stacks ([3, ...])."""
    if kind == STICKY:
        return jnp.zeros_like(vel_rel)

    v_dot_n = jnp.sum(vel_rel * n, axis=0, keepdims=True)
    tangential = vel_rel - n * v_dot_n

    if kind == SLIP:
        out = tangential
        if friction > 0.0:
            vn = jnp.sqrt(jnp.sum(tangential * tangential, axis=0, keepdims=True))
            safe_vn = jnp.maximum(vn, 1e-20)
            slowed = tangential * (1.0 + v_dot_n * friction / safe_vn)
            stop = -v_dot_n * friction >= vn
            out = jnp.where((v_dot_n < 0) & stop, 0.0, jnp.where(v_dot_n < 0, slowed, tangential))
        return out

    if kind == SEPARATE:
        out = jnp.where(v_dot_n < 0, tangential, vel_rel)
        if friction != 0.0:
            vn = jnp.sqrt(jnp.sum(tangential * tangential, axis=0, keepdims=True))
            safe_vn = jnp.maximum(vn, 1e-20)
            slowed = tangential * (1.0 + v_dot_n * friction / safe_vn)
            stop = -v_dot_n * friction >= vn
            out = jnp.where(
                v_dot_n < 0,
                jnp.where(stop, 0.0, slowed),
                vel_rel,
            )
        return out
    raise ValueError(f"unknown boundary type {kind}")


def _project_soa(vr, n, kind: str, friction: float):
    """Component-tuple form of ``_project`` (3-tuples of same-shape arrays),
    Mosaic-lowerable: pure elementwise where-ladders, so it can run inside
    the Pallas grid kernel (reference resolves collisions inside its grid
    kernel too, MGSP/mgmpm_kernels.cuh:363)."""
    if kind == STICKY:
        return tuple(jnp.zeros_like(c) for c in vr)

    v_dot_n = vr[0] * n[0] + vr[1] * n[1] + vr[2] * n[2]
    tang = tuple(vr[k] - n[k] * v_dot_n for k in range(3))

    if kind == SLIP:
        if friction <= 0.0:
            return tang
        vn = jnp.sqrt(tang[0] ** 2 + tang[1] ** 2 + tang[2] ** 2)
        safe_vn = jnp.maximum(vn, 1e-20)
        scl = 1.0 + v_dot_n * friction / safe_vn
        stop = (-v_dot_n * friction) >= vn
        approaching = v_dot_n < 0
        return tuple(
            jnp.where(
                approaching,
                jnp.where(stop, 0.0, tang[k] * scl),
                tang[k],
            )
            for k in range(3)
        )

    if kind == SEPARATE:
        approaching = v_dot_n < 0
        if friction == 0.0:
            return tuple(
                jnp.where(approaching, tang[k], vr[k]) for k in range(3)
            )
        vn = jnp.sqrt(tang[0] ** 2 + tang[1] ** 2 + tang[2] ** 2)
        safe_vn = jnp.maximum(vn, 1e-20)
        scl = 1.0 + v_dot_n * friction / safe_vn
        stop = (-v_dot_n * friction) >= vn
        return tuple(
            jnp.where(
                approaching,
                jnp.where(stop, 0.0, tang[k] * scl),
                vr[k],
            )
            for k in range(3)
        )
    raise ValueError(f"unknown boundary type {kind}")


def _rot_xyz_scalars(omega, t):
    """Rx(ox t) Ry(oy t) Rz(oz t) as nine row-major scalars (traced), the
    in-kernel form of ``_rot_xyz``."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    cx, sx = jnp.cos(omega[0] * t), jnp.sin(omega[0] * t)
    cy, sy = jnp.cos(omega[1] * t), jnp.sin(omega[1] * t)
    cz, sz = jnp.cos(omega[2] * t), jnp.sin(omega[2] * t)
    rx = (one, zero, zero, zero, cx, -sx, zero, sx, cx)
    ry = (cy, zero, sy, zero, one, zero, -sy, zero, cy)
    rz = (cz, -sz, zero, sz, cz, zero, zero, zero, one)

    def mm(a, b):
        return tuple(
            sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
            for i in range(3)
            for j in range(3)
        )

    return mm(mm(rx, ry), rz)


def _rot_xyz(omega, t):
    """R = Rx(ox t) @ Ry(oy t) @ Rz(oz t) as a [3, 3] jnp matrix
    (reference rot_angle_to_matrix chain, boundary_condition.cuh:163-178)."""
    ax, ay, az = (omega[0] * t, omega[1] * t, omega[2] * t)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, 0, 0], [0, 0, 0]], jnp.float32)
    rx = jnp.stack([
        jnp.stack([jnp.float32(1), jnp.float32(0), jnp.float32(0)]),
        jnp.stack([jnp.float32(0), cx, -sx]),
        jnp.stack([jnp.float32(0), sx, cx]),
    ])
    ry = jnp.stack([
        jnp.stack([cy, jnp.float32(0), sy]),
        jnp.stack([jnp.float32(0), jnp.float32(1), jnp.float32(0)]),
        jnp.stack([-sy, jnp.float32(0), cy]),
    ])
    rz = jnp.stack([
        jnp.stack([cz, -sz, jnp.float32(0)]),
        jnp.stack([sz, cz, jnp.float32(0)]),
        jnp.stack([jnp.float32(0), jnp.float32(0), jnp.float32(1)]),
    ])
    return rx @ ry @ rz


@dataclasses.dataclass(frozen=True)
class RigidMotion:
    """Animated rigid transform x(t) = R(t) s(t) X + b(t)
    (reference boundary_condition.cuh:150-158)."""

    trans: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    trans_vel: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    omega: Tuple[float, float, float] = (0.0, 0.0, 0.0)   # rotation rates
    scale: float = 1.0
    dsdt: float = 0.0

    @property
    def is_static(self) -> bool:
        return (
            self.trans_vel == (0.0, 0.0, 0.0)
            and self.omega == (0.0, 0.0, 0.0)
            and self.dsdt == 0.0
        )


class ColliderBase:
    """Shared animated-transform machinery.  Subclasses implement
    ``sdf_and_normal(x_mat)`` in material space."""

    kind: str
    friction: float
    motion: RigidMotion

    def __init__(self, kind=STICKY, friction=0.0, motion: Optional[RigidMotion] = None):
        assert kind in (STICKY, SLIP, SEPARATE)
        self.kind = kind
        self.friction = float(friction)
        self.motion = motion or RigidMotion()

    def sdf_and_normal(self, x):
        raise NotImplementedError

    def resolve(self, xw, vel, t):
        """xw: [B, 3, bv] world cell positions; vel: [B, 3, bv]; t: scalar.
        Returns projected velocities (reference detect_and_resolve_collision,
        boundary_condition.cuh:159-249)."""
        mo = self.motion
        xw = jnp.moveaxis(xw, 1, 0)                       # [3, B, bv]
        v = jnp.moveaxis(vel, 1, 0)

        b = jnp.asarray(mo.trans, jnp.float32) + jnp.asarray(mo.trans_vel, jnp.float32) * t
        x_mt = xw - b[:, None, None]
        s = 1.0 + mo.dsdt * t
        x0 = x_mt / s
        omega = jnp.asarray(mo.omega, jnp.float32)
        r = _rot_xyz(omega, t)                            # [3, 3]
        # material coords: X = R^T x0 (then object's own scale/offset inside sdf)
        x_mat = jnp.einsum("ji,jbc->ibc", r, x0)

        sd, n_mat = self.sdf_and_normal(x_mat)            # [B, bv], [3, B, bv]
        hit = sd <= 0.0

        # object velocity field at x (world space)
        v_obj = (
            jnp.stack([
                omega[1] * x_mt[2] - omega[2] * x_mt[1],
                omega[2] * x_mt[0] - omega[0] * x_mt[2],
                omega[0] * x_mt[1] - omega[1] * x_mt[0],
            ])
            + x_mt * (mo.dsdt / max(mo.scale, 1e-20))
            + jnp.asarray(mo.trans_vel, jnp.float32)[:, None, None]
        )

        n_world = jnp.einsum("ij,jbc->ibc", r, n_mat)
        v_rel = v - v_obj
        v_proj = _project(v_rel, n_world, self.kind, self.friction) + v_obj
        v_new = jnp.where(hit[None], v_proj, v)
        return jnp.moveaxis(v_new, 0, 1)

    def resolve_soa(self, x3, v3, t):
        """Component-tuple resolve: ``x3``/``v3`` are 3-tuples of same-shape
        arrays (any shape), ``t`` a traced scalar.  Pure elementwise math —
        runs inside the Pallas grid kernel for analytic colliders (the
        reference resolves collisions inside its grid-velocity kernel,
        MGSP/mgmpm_kernels.cuh:363).  Only defined when the subclass
        implements ``sdf_and_normal_soa`` (SDF-grid colliders need gathers
        and keep the XLA path)."""
        mo = self.motion
        off = tuple(
            jnp.float32(mo.trans[k]) + jnp.float32(mo.trans_vel[k]) * t
            for k in range(3)
        )
        x_mt = tuple(x3[k] - off[k] for k in range(3))
        s = 1.0 + mo.dsdt * t
        x0 = tuple(c / s for c in x_mt)
        rotating = mo.omega != (0.0, 0.0, 0.0)
        if rotating:
            r = _rot_xyz_scalars(
                tuple(jnp.float32(c) for c in mo.omega), t)
            # material coords: X = R^T x0
            x_mat = tuple(
                r[0 + k] * x0[0] + r[3 + k] * x0[1] + r[6 + k] * x0[2]
                for k in range(3)
            )
        else:
            x_mat = x0

        sd, n_mat = self.sdf_and_normal_soa(x_mat)
        hit = sd <= 0.0

        om = mo.omega
        v_obj = tuple(
            om[(k + 1) % 3] * x_mt[(k + 2) % 3]
            - om[(k + 2) % 3] * x_mt[(k + 1) % 3]
            + x_mt[k] * (mo.dsdt / max(mo.scale, 1e-20))
            + mo.trans_vel[k]
            for k in range(3)
        )
        if rotating:
            n_world = tuple(
                r[3 * k] * n_mat[0] + r[3 * k + 1] * n_mat[1]
                + r[3 * k + 2] * n_mat[2]
                for k in range(3)
            )
        else:
            n_world = n_mat
        v_rel = tuple(v3[k] - v_obj[k] for k in range(3))
        v_proj = _project_soa(v_rel, n_world, self.kind, self.friction)
        return tuple(
            jnp.where(hit, v_proj[k] + v_obj[k], v3[k]) for k in range(3)
        )

    @property
    def pallas_ok(self) -> bool:
        """True when this collider can run inside the Pallas grid kernel."""
        return hasattr(self, "sdf_and_normal_soa")


class HalfSpace(ColliderBase):
    """Analytic plane collider: sdf = (x - origin) . normal."""

    def __init__(self, origin, normal, kind=SLIP, friction=0.0, motion=None):
        super().__init__(kind, friction, motion)
        self.origin = tuple(float(c) for c in origin)
        n = np.asarray(normal, np.float64)
        n = n / np.linalg.norm(n)
        self.normal = tuple(float(c) for c in n)

    def sdf_and_normal(self, x):
        o = jnp.asarray(self.origin, jnp.float32)[:, None, None]
        n = jnp.asarray(self.normal, jnp.float32)[:, None, None]
        sd = jnp.sum((x - o) * n, axis=0)
        return sd, jnp.broadcast_to(n, x.shape)

    def sdf_and_normal_soa(self, x3):
        o, n = self.origin, self.normal
        sd = sum((x3[k] - o[k]) * n[k] for k in range(3))
        return sd, tuple(jnp.full_like(sd, n[k]) for k in range(3))


class Sphere(ColliderBase):
    """Analytic sphere collider."""

    def __init__(self, center, radius, kind=SEPARATE, friction=0.0, motion=None):
        super().__init__(kind, friction, motion)
        self.center = tuple(float(c) for c in center)
        self.radius = float(radius)

    def sdf_and_normal(self, x):
        c = jnp.asarray(self.center, jnp.float32)[:, None, None]
        d = x - c
        r = jnp.sqrt(jnp.sum(d * d, axis=0))
        sd = r - self.radius
        n = d / jnp.maximum(r, 1e-20)[None]
        return sd, n

    def sdf_and_normal_soa(self, x3):
        d = tuple(x3[k] - self.center[k] for k in range(3))
        r = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        inv = 1.0 / jnp.maximum(r, 1e-20)
        return r - self.radius, tuple(dk * inv for dk in d)


class Box(ColliderBase):
    """Analytic AABB collider (material space)."""

    def __init__(self, lo, hi, kind=STICKY, friction=0.0, motion=None):
        super().__init__(kind, friction, motion)
        self.lo = tuple(float(c) for c in lo)
        self.hi = tuple(float(c) for c in hi)

    def sdf_and_normal(self, x):
        lo = jnp.asarray(self.lo, jnp.float32)[:, None, None]
        hi = jnp.asarray(self.hi, jnp.float32)[:, None, None]
        center = (lo + hi) / 2
        half = (hi - lo) / 2
        d = jnp.abs(x - center) - half
        outside = jnp.maximum(d, 0.0)
        sd = jnp.sqrt(jnp.sum(outside * outside, axis=0)) + jnp.minimum(
            jnp.max(d, axis=0), 0.0
        )
        # normal: axis of maximum penetration / exit
        sgn = jnp.sign(x - center)
        amax = jnp.argmax(d, axis=0)
        n = jnp.stack([(amax == k).astype(jnp.float32) * sgn[k] for k in range(3)])
        nn = jnp.sqrt(jnp.sum(n * n, axis=0))
        return sd, n / jnp.maximum(nn, 1e-20)[None]

    def sdf_and_normal_soa(self, x3):
        lo, hi = self.lo, self.hi
        center = tuple((lo[k] + hi[k]) / 2 for k in range(3))
        half = tuple((hi[k] - lo[k]) / 2 for k in range(3))
        d = tuple(jnp.abs(x3[k] - center[k]) - half[k] for k in range(3))
        out = tuple(jnp.maximum(dk, 0.0) for dk in d)
        dmax = jnp.maximum(jnp.maximum(d[0], d[1]), d[2])
        sd = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2) + jnp.minimum(
            dmax, 0.0)
        # argmax via compare-ladder (matches jnp.argmax's first-max tie rule)
        is0 = d[0] >= dmax
        is1 = jnp.logical_not(is0) & (d[1] >= dmax)
        is2 = jnp.logical_not(is0) & jnp.logical_not(is1)
        sel = (is0, is1, is2)
        n = tuple(
            jnp.where(sel[k], jnp.sign(x3[k] - center[k]), 0.0)
            for k in range(3)
        )
        nn = jnp.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
        inv = 1.0 / jnp.maximum(nn, 1e-20)
        return sd, tuple(nk * inv for nk in n)


class SignedDistanceCollider(ColliderBase):
    """Dense SDF-grid collider (reference SignedDistanceGrid,
    boundary_condition.cuh:15-137): trilinear value+gradient interpolation on
    a node grid spanning the simulation domain."""

    def __init__(
        self,
        sdf: np.ndarray,
        dx: float,
        kind=STICKY,
        friction: float = 0.0,
        motion: Optional[RigidMotion] = None,
        gradients: Optional[np.ndarray] = None,
        bound_cells: int = 8,
    ):
        super().__init__(kind, friction, motion)
        sdf = np.asarray(sdf, np.float32)
        if gradients is None:
            gx, gy, gz = np.gradient(sdf, dx)
            gradients = np.stack([gx, gy, gz], axis=0)
        self.values = jnp.asarray(sdf)
        self.grads = jnp.asarray(gradients.astype(np.float32))
        self.dx = float(dx)
        self.bound_cells = int(bound_cells)

    @classmethod
    def from_claymore_files(cls, prefix: str, resolution, dx: float,
                            kind=STICKY, friction: float = 0.0,
                            motion: Optional[RigidMotion] = None,
                            bound_cells: int = 8):
        """Load the reference's collider asset format: four raw float32
        files ``{prefix}_sdf.bin`` and ``{prefix}_grad_{0,1,2}.bin``, each
        resolution.prod() values in C row-major (z innermost) order
        (reference init_from_signed_distance_file + the fill loop's
        idx = i*NY*NZ + j*NZ + k, boundary_condition.cuh:253-320)."""
        res = tuple(int(r) for r in resolution)

        def read(suffix):
            arr = np.fromfile(f"{prefix}{suffix}", dtype=np.float32)
            assert arr.size == res[0] * res[1] * res[2], (
                f"{prefix}{suffix}: {arr.size} values, expected {res}"
            )
            return arr.reshape(res)

        sdf = read("_sdf.bin")
        grads = np.stack([read(f"_grad_{c}.bin") for c in range(3)], axis=0)
        return cls(sdf, dx, kind=kind, friction=friction, motion=motion,
                   gradients=grads, bound_cells=bound_cells)

    # ------------------------------------------------------------------
    # Pallas fast path: pre-sampled per-cell cache (VERDICT r4 item 7)
    # ------------------------------------------------------------------
    # The reference resolves SDF collisions INSIDE its grid kernel
    # (MGSP/mgmpm_kernels.cuh:363) via per-cell trilinear fetches.  Mosaic
    # has no gather, but the grid update only ever evaluates the SDF at
    # CELL positions — so for a static collider the (sd, normal) of every
    # cell is a constant field.  ``build_oct_cache`` samples it once at
    # engine build into a pool-layout array [num_oct_keys + 1, 16, 128]
    # (rows (c, cx) with c = (sd, nx, ny, nz), lanes (z8, cy, cz)); the
    # grid kernel then consumes ``cache[partition.keys]`` rows — one row
    # gather per substep, no in-kernel gather.  bf16 storage: sd/normals
    # are floating-point, so the hit test and projection see ~2^-9
    # relative error — far below the cell-size discretization of the
    # collider itself.

    def oct_cache_ok(self, cfg) -> bool:
        """Static transforms only (an animated transform can't be baked
        into a static cell sample), and domains whose full-key cache stays
        small (db=8 -> 32768 keys x 4 KB bf16 = 134 MB; 1024^3 domains
        keep the XLA path)."""
        return self.motion.is_static and cfg.num_oct_keys <= 65536

    def build_oct_cache(self, cfg, dtype=None):
        """``dtype=None`` reuses whatever cache exists for this domain
        (tests pin float32 for exact oracle equivalence; the shipping
        default is bfloat16), building bf16 if none does."""
        cache = getattr(self, "_oct_cache", None)
        dom = (cfg.domain_bits, cfg.block_bits)
        if cache is not None and self._oct_cache_key[:2] == dom and (
            dtype is None or str(dtype) == self._oct_cache_key[2]
        ):
            return cache
        if dtype is None:
            dtype = jnp.bfloat16
        key = dom + (str(dtype),)
        import jax as _jax

        g = cfg.grid_size
        gzo = cfg.grid_size_zo
        nok = cfg.num_oct_keys
        bs = cfg.block_size
        lane = jnp.arange(128, dtype=jnp.int32)
        z8, cy, cz = lane >> 4, (lane >> 2) & 3, lane & 3
        cxi = jnp.arange(4, dtype=jnp.int32)[:, None]         # [4, 1]

        @_jax.jit
        def sample(keys):                                     # [K] oct keys
            bx = keys // (g * gzo)
            by = (keys // gzo) % g
            bzo = keys % gzo
            x = (bx[:, None, None] * bs + cxi[None]).astype(jnp.float32)
            y = (by[:, None, None] * bs + cy[None, None]).astype(jnp.float32)
            z = ((bzo[:, None, None] * 8 + z8[None, None]) * bs
                 + cz[None, None]).astype(jnp.float32)
            shape = (keys.shape[0], 4, 128)
            xw = jnp.stack([jnp.broadcast_to(a, shape)
                            for a in (x, y, z)]) * cfg.dx     # [3, K, 4, 128]
            # bake in the static transform exactly as resolve() applies it
            # (is_static means zero RATES; the constant offset still holds)
            off = jnp.asarray(self.motion.trans, jnp.float32)
            xw = xw - off[:, None, None, None]
            sd, nr = self.sdf_and_normal(xw.reshape(3, -1, 128))
            sd = sd.reshape(keys.shape[0], 4, 128)
            nr = nr.reshape(3, keys.shape[0], 4, 128)
            rows = jnp.concatenate(
                [sd[:, None], jnp.moveaxis(nr, 0, 1)], axis=1)  # [K, 4, 4, 128]
            return rows.reshape(keys.shape[0], 16, 128).astype(dtype)

        chunk = 2048
        try:
            parts = [
                np.asarray(sample(jnp.arange(k0, min(k0 + chunk, nok),
                                             dtype=jnp.int32)))
                for k0 in range(0, nok, chunk)
            ]
        except _jax.errors.TracerArrayConversionError as e:
            raise RuntimeError(
                "SignedDistanceCollider.build_oct_cache must run EAGERLY "
                "before the substep traces (the engines build it at "
                "construction); it cannot be built inside jit"
            ) from e
        # sentinel row (key = num_oct_keys): sd = +1 -> never hits
        sent = np.zeros((1, 16, 128), parts[0].dtype)
        sent[0, 0:4] = 1.0
        cache = jnp.asarray(np.concatenate(parts + [sent], axis=0))
        self._oct_cache = cache
        self._oct_cache_key = key
        return cache

    def sdf_and_normal(self, x):
        n = self.values.shape[0]
        xc = x / self.dx
        c0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, n - 2)
        fr = xc - c0.astype(jnp.float32)
        sd = jnp.zeros(x.shape[1:], jnp.float32)
        nr = jnp.zeros_like(x)
        for i in (0, 1):
            wx = jnp.where(i == 0, 1.0 - fr[0], fr[0])
            for j in (0, 1):
                wy = jnp.where(j == 0, 1.0 - fr[1], fr[1])
                for k in (0, 1):
                    wz = jnp.where(k == 0, 1.0 - fr[2], fr[2])
                    w = wx * wy * wz
                    sd = sd + w * self.values[c0[0] + i, c0[1] + j, c0[2] + k]
                    nr = nr + w[None] * self.grads[:, c0[0] + i, c0[1] + j, c0[2] + k]
        # outside the valid interior band: no collision (reference query_sdf,
        # boundary_condition.cuh:138-143)
        lo = self.bound_cells * self.dx
        hi = (n - self.bound_cells) * self.dx
        inside = jnp.all((x >= lo) & (x < hi), axis=0)
        sd = jnp.where(inside, sd, 1.0)
        norm = jnp.sqrt(jnp.sum(nr * nr, axis=0))
        return sd, nr / jnp.maximum(norm, 1e-20)[None]
