"""Bundle adjustment: batched Gauss-Newton with dense-blocked sparse Schur
complement, usable for local BA, global BA, and (sharded over the point
axis) distributed BA.

Re-design of `Optimizer::LocalBundleAdjustment` / `BundleAdjustment`
(`src/Optimizer.cc:675-1139, 47-323`): g2o's BlockSolver_6_3 with
LinearSolverEigen becomes explicit tensor math —

  per-obs Jacobians  J_c [E,3,6], J_p [E,3,3]      (E = C·N, dense slots)
  Hcc (block-diag)   [C,6,6]   segment-sum by camera
  Hpp (block-diag)   [P,3,3]   segment-sum by point, 3x3 closed-form inverse
  A = Hcp           [C,P,6,3]  scatter by (camera, point), chunked over P
  S = Hcc − A Hpp⁻¹ Aᵀ        reduced camera system, one einsum per chunk
  δc from dense Cholesky of S; δp by back-substitution.

The chunked P-loop is the distribution axis: each device owns a point shard
and the S/rhs accumulation is a `psum` (parallel/dist_ba.py). The schedule
follows the reference: 5 iterations, chi2 outlier pass, 10 more iterations
(`src/Optimizer.cc:965-1007`), with Huber IRLS instead of explicit edge
removal inside each phase.

Observations use the map's native dense layout: for each of C cameras, N
keypoint slots with a global point id (−1 = none) — no COO lists, no
dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls


class BAProblem(NamedTuple):
    cam_pose: jax.Array    # [C, 7] Tcw
    cam_valid: jax.Array   # [C] bool
    cam_fixed: jax.Array   # [C] bool — frontier/anchor cameras
    pt_xyz: jax.Array      # [P, 3]
    pt_valid: jax.Array    # [P] bool (points eligible for update)
    obs_pt: jax.Array      # [C, N] int32 global point id, -1 = none
    obs_uv: jax.Array      # [C, N, 2]
    obs_ur: jax.Array      # [C, N] virtual right u, <0 = mono
    obs_inv_sigma2: jax.Array  # [C, N]
    obs_valid: jax.Array   # [C, N] bool


class BAResult(NamedTuple):
    cam_pose: jax.Array
    pt_xyz: jax.Array
    obs_inlier: jax.Array  # [C, N] bool — final chi2-gated classification
    chi2: jax.Array        # [] total inlier chi2
    pl_coeff: Optional[jax.Array] = None  # [L, 4] optimized plane landmarks
                                          # (only with plane_free)


class PlaneFreeBlock(NamedTuple):
    """Free plane vertices for global BA (the reference's VertexPlane with
    azimuth/elevation/distance oplus, `src/Optimizer.cc:210-250`,
    `src/g2oAddition/Plane3D.h:68-93`): plane landmarks are 3-DoF blocks
    marginalized by Schur like points."""
    pl_coeff: jax.Array    # [L, 4] world Hessian planes (initial estimates)
    pl_free: jax.Array     # [L] bool — planes eligible for update
    obs_pl: jax.Array      # [C, F] int32 plane landmark id, -1 = none
    obs_meas: jax.Array    # [C, F, 4] measured camera-frame coeffs
    obs_valid: jax.Array   # [C, F] bool


def plane_tangent_basis(n: jax.Array):
    """Orthonormal basis (e1, e2) of the tangent plane at unit normal n —
    the chart for the azimuth/elevation part of the minimal plane
    parameterization (`src/g2oAddition/Plane3D.h:68-93`)."""
    ax = jnp.abs(n[..., 0])
    a = jnp.where(ax[..., None] < 0.9,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype),
                                   n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype),
                                   n.shape))
    e1 = jnp.cross(n, a)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-9)
    e2 = jnp.cross(n, e1)
    return e1, e2


def plane_retract(coeff: jax.Array, delta: jax.Array) -> jax.Array:
    """coeff [..,4] ⊕ delta [..,3]: rotate the unit normal in its tangent
    chart, shift the distance (first-order-equivalent to the reference's
    azimuth/elevation/distance oplus)."""
    n = coeff[..., :3]
    d = coeff[..., 3]
    e1, e2 = plane_tangent_basis(n)
    n2 = n + e1 * delta[..., 0:1] + e2 * delta[..., 1:2]
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-9)
    return jnp.concatenate([n2, (d + delta[..., 2])[..., None]], axis=-1)


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate/determinant) — elementwise
    VPU math instead of batched LU."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    M = jnp.stack([jnp.stack([A11, A12, A13], -1),
                   jnp.stack([A21, A22, A23], -1),
                   jnp.stack([A31, A32, A33], -1)], -2)
    return M * inv_det[..., None, None]


def _residuals(prob: BAProblem, cam_pose, pt_xyz, cam):
    """Per-observation residuals r [C,N,3] and Jacobians J_c [C,N,3,6],
    J_p [C,N,3,3] (point Jacobian in world coords)."""
    fx, fy, cx, cy, bf = cam
    C, N = prob.obs_pt.shape
    pid = jnp.clip(prob.obs_pt, 0, pt_xyz.shape[0] - 1)
    pw = pt_xyz[pid]                               # [C, N, 3]
    R = lie.quat_to_rotmat(cam_pose[:, :4])        # [C, 3, 3]
    xc = jnp.einsum("cij,cnj->cni", R, pw) + cam_pose[:, None, 4:7]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    stereo = prob.obs_ur >= 0.0
    r = jnp.stack([prob.obs_uv[..., 0] - u,
                   prob.obs_uv[..., 1] - v,
                   jnp.where(stereo, prob.obs_ur - ur, 0.0)], axis=-1)

    zero = jnp.zeros_like(z)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur = du + jnp.stack([zero, zero, bf * iz2], axis=-1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[..., None], dur, 0.0)],
                      axis=-2)                     # [C,N,3,3]
    # camera: d xc/d delta = [-[xc]x | I]; residual = obs - proj
    dxc = jnp.concatenate([
        -lie.so3_hat(xc),
        jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape + (3,))],
        axis=-1)                                   # [C,N,3,6]
    J_c = -jnp.einsum("cnij,cnjk->cnik", dproj, dxc)
    # point: d xc/d xw = R
    J_p = -jnp.einsum("cnij,cjk->cnik", dproj, R)
    behind = xc[..., 2] < 1e-3
    return r, J_c, J_p, stereo, behind


def _plane_terms(cam_pose, plane_w, meas_c, valid, cfg: SolverConfig):
    """Per-camera plane-factor contributions (fixed plane landmarks, the
    GBA plane edges of `src/Optimizer.cc:210-250`): returns
    (Hcc_add [C,6,6], bc_add [C,6], chi2 [C,F]). Residual/Jacobian math as
    in solvers/pose_opt._plane_residual_jac."""
    R = lie.quat_to_rotmat(cam_pose[:, :4])              # [C,3,3]
    n_w = plane_w[..., :3]                               # [C,F,3]
    d_w = plane_w[..., 3]
    n_c = jnp.einsum("cij,cfj->cfi", R, n_w)
    d_c = d_w - jnp.einsum("cfi,ci->cf", n_c, cam_pose[:, 4:7])
    n_m = meas_c[..., :3]
    d_m = meas_c[..., 3]
    # sign alignment of the measurement to the predicted normal
    flip = jnp.einsum("cfi,cfi->cf", n_c, n_m) < 0
    n_m = jnp.where(flip[..., None], -n_m, n_m)
    d_m = jnp.where(flip, -d_m, d_m)

    r_ang = jnp.cross(n_c, n_m)                          # [C,F,3]
    r_dst = d_c - d_m                                    # [C,F]
    chi2 = (cfg.plane_angle_info * jnp.sum(r_ang * r_ang, -1)
            + cfg.plane_dist_info * r_dst * r_dst)
    hub = jnp.minimum(1.0, jnp.sqrt(cfg.plane_chi2
                                    / jnp.maximum(chi2, 1e-12)))
    w = valid.astype(jnp.float32) * hub * (chi2 <= 4 * cfg.plane_chi2)

    dnc_dw = -lie.so3_hat(n_c)                           # [C,F,3,3]
    dra_dnc = -lie.so3_hat(n_m)
    J_ang_w = jnp.einsum("cfij,cfjk->cfik", dra_dnc, dnc_dw)
    J_ang = jnp.concatenate([J_ang_w, jnp.zeros_like(J_ang_w)], -1)  # [C,F,3,6]
    J_dst = jnp.concatenate([jnp.zeros_like(n_c), -n_c], -1)        # [C,F,6]

    Hcc = (cfg.plane_angle_info
           * jnp.einsum("cfri,cf,cfrj->cij", J_ang, w, J_ang)
           + cfg.plane_dist_info
           * jnp.einsum("cfi,cf,cfj->cij", J_dst, w, J_dst))
    bc = -(cfg.plane_angle_info
           * jnp.einsum("cfri,cf,cfr->ci", J_ang, w, r_ang)
           + cfg.plane_dist_info
           * jnp.einsum("cfi,cf,cf->ci", J_dst, w, r_dst))
    cost = jnp.sum(jnp.where(valid, jnp.minimum(chi2, cfg.plane_chi2), 0.0))
    return Hcc, bc, cost


def _plane_free_terms(cam_pose, pl_coeff, pf: PlaneFreeBlock,
                      cfg: SolverConfig):
    """Residuals/Jacobians of plane edges with FREE plane vertices
    (EdgePlane: error = (Tcw ∘ plane_w) ⊖ meas, both endpoints optimizable —
    `src/g2oAddition/EdgePlane.h:29-45`). Returns per-obs pieces:
      r_ang [C,F,3], r_dst [C,F], w [C,F] (validity+Huber, info NOT folded),
      J_cam_ang [C,F,3,6], J_cam_dst [C,F,6],
      J_pl_ang [C,F,3,3], J_pl_dst [C,F,3], cost [].
    Plane tangent = (u1, u2, dd) in the normal's tangent basis + distance."""
    L = pl_coeff.shape[0]
    pidx = jnp.clip(pf.obs_pl, 0, L - 1)
    plane_w = pl_coeff[pidx]                              # [C,F,4]
    valid = (pf.obs_valid & (pf.obs_pl >= 0))

    R = lie.quat_to_rotmat(cam_pose[:, :4])               # [C,3,3]
    t = cam_pose[:, 4:7]
    n_w = plane_w[..., :3]
    d_w = plane_w[..., 3]
    n_c = jnp.einsum("cij,cfj->cfi", R, n_w)
    d_c = d_w - jnp.einsum("cfi,ci->cf", n_c, t)
    n_m = pf.obs_meas[..., :3]
    d_m = pf.obs_meas[..., 3]
    flip = jnp.einsum("cfi,cfi->cf", n_c, n_m) < 0
    n_m = jnp.where(flip[..., None], -n_m, n_m)
    d_m = jnp.where(flip, -d_m, d_m)

    r_ang = jnp.cross(n_c, n_m)                           # [C,F,3]
    r_dst = d_c - d_m                                     # [C,F]
    chi2 = (cfg.plane_angle_info * jnp.sum(r_ang * r_ang, -1)
            + cfg.plane_dist_info * r_dst * r_dst)
    hub = jnp.minimum(1.0, jnp.sqrt(cfg.plane_chi2
                                    / jnp.maximum(chi2, 1e-12)))
    w = valid.astype(jnp.float32) * hub * (chi2 <= 4 * cfg.plane_chi2)

    # camera Jacobians (left retraction; see solvers/pose_opt.py derivation)
    dnc_dw = -lie.so3_hat(n_c)                            # [C,F,3,3]
    dra_dnc = -lie.so3_hat(n_m)                           # [C,F,3,3]
    J_cam_ang = jnp.concatenate(
        [jnp.einsum("cfij,cfjk->cfik", dra_dnc, dnc_dw),
         jnp.zeros(n_c.shape[:-1] + (3, 3), n_c.dtype)], -1)  # [C,F,3,6]
    J_cam_dst = jnp.concatenate([jnp.zeros_like(n_c), -n_c], -1)  # [C,F,6]

    # plane Jacobians: d n_c/d(u1,u2) = R [e1 e2]; d d_c/d u = −tᵀR[e1 e2]
    # (from d_c = d_w − (R n_w)·t), d d_c/d dd = 1, d r_ang/d n_c = −[n_m]ₓ
    e1, e2 = plane_tangent_basis(n_w)
    RE = jnp.stack([jnp.einsum("cij,cfj->cfi", R, e1),
                    jnp.einsum("cij,cfj->cfi", R, e2)], -1)   # [C,F,3,2]
    J_ang_u = jnp.einsum("cfij,cfjk->cfik", dra_dnc, RE)      # [C,F,3,2]
    J_pl_ang = jnp.concatenate(
        [J_ang_u, jnp.zeros(J_ang_u.shape[:-1] + (1,), J_ang_u.dtype)], -1)
    J_dst_u = -jnp.einsum("ci,cfik->cfk", t, RE)              # [C,F,2]
    J_pl_dst = jnp.concatenate(
        [J_dst_u, jnp.ones(J_dst_u.shape[:-1] + (1,), J_dst_u.dtype)], -1)

    cost = jnp.sum(jnp.where(valid, jnp.minimum(chi2, cfg.plane_chi2), 0.0))
    return r_ang, r_dst, w, J_cam_ang, J_cam_dst, J_pl_ang, J_pl_dst, cost


def _weights(r, stereo, behind, prob, active, cfg: SolverConfig):
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
    w_rob = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    w = (prob.obs_inv_sigma2 * w_rob * active.astype(jnp.float32)
         * (1.0 - behind.astype(jnp.float32)))
    return w, chi2


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "n_iters1",
                                             "n_iters2", "pt_chunk"))
@f32_matmuls
def bundle_adjust(prob: BAProblem, plane_block=None, *,
                  plane_free: Optional[PlaneFreeBlock] = None,
                  cam: Tuple[float, ...],
                  cfg: SolverConfig, n_iters1: int = 5, n_iters2: int = 10,
                  pt_chunk: int = 4096, damping: float = 1e-3) -> BAResult:
    """Two-phase BA (iters1, outlier gate, iters2).

    `plane_block` optionally adds plane factors as
    (plane_w [C,F,4], meas_c [C,F,4], valid [C,F]) with the planes held
    fixed — the pose-constraining part of the reference's GBA plane edges
    (and the local-BA block it left #ifdef'd out).

    `plane_free` instead makes plane landmarks free 3-DoF vertices
    marginalized by Schur alongside the points — full GBA parity with
    `src/Optimizer.cc:210-250` (VertexPlane + EdgePlane)."""
    C, N = prob.obs_pt.shape
    P = prob.pt_xyz.shape[0]
    pt_chunk = min(pt_chunk, P)
    n_chunks = -(-P // pt_chunk)
    P_pad = n_chunks * pt_chunk

    obs_ok0 = (prob.obs_valid & (prob.obs_pt >= 0)
               & prob.cam_valid[:, None])
    pl0 = (plane_free.pl_coeff if plane_free is not None
           else jnp.zeros((1, 4), jnp.float32))

    def total_chi2(cam_pose, pt_xyz, pl_coeff, active):
        r, _, _, stereo, behind = _residuals(prob, cam_pose, pt_xyz, cam)
        c2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
        # robustified cost (Huber) so the accept test matches the solve
        delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
        c2r = jnp.where(c2 <= delta2, c2,
                        2.0 * jnp.sqrt(delta2 * c2) - delta2)
        w = active.astype(jnp.float32) * (1.0 - behind.astype(jnp.float32))
        total = jnp.sum(c2r * w)
        if plane_block is not None:
            _, _, pcost = _plane_terms(cam_pose, *plane_block, cfg)
            total = total + pcost
        if plane_free is not None:
            pcost = _plane_free_terms(cam_pose, pl_coeff, plane_free,
                                      cfg)[-1]
            total = total + pcost
        return total

    def gn_iter(state, active, damping):
        cam_pose, pt_xyz, pl_coeff = state
        r, J_c, J_p, stereo, behind = _residuals(prob, cam_pose, pt_xyz, cam)
        w, _ = _weights(r, stereo, behind, prob, active, cfg)

        free_cam = (prob.cam_valid & (~prob.cam_fixed)).astype(jnp.float32)
        w_c = w * free_cam[:, None]

        Hcc = jnp.einsum("cnri,cn,cnrj->cij", J_c, w_c, J_c)
        bc = -jnp.einsum("cnri,cn,cnr->ci", J_c, w_c, r)
        if plane_block is not None:
            Hp, bp_c, _ = _plane_terms(cam_pose, *plane_block, cfg)
            fc = free_cam[:, None, None]
            Hcc = Hcc + Hp * fc
            bc = bc + bp_c * free_cam[:, None]
        if plane_free is not None:
            L = pl_coeff.shape[0]
            (r_ang, r_dst, w_pl, Jca, Jcd, Jpa, Jpd,
             _) = _plane_free_terms(cam_pose, pl_coeff, plane_free, cfg)
            ai, di = cfg.plane_angle_info, cfg.plane_dist_info
            w_plc = w_pl * free_cam[:, None]
            # camera block
            Hcc = Hcc + (ai * jnp.einsum("cfri,cf,cfrj->cij", Jca, w_plc, Jca)
                         + di * jnp.einsum("cfi,cf,cfj->cij", Jcd, w_plc, Jcd))
            bc = bc - (ai * jnp.einsum("cfri,cf,cfr->ci", Jca, w_plc, r_ang)
                       + di * jnp.einsum("cfi,cf,cf->ci", Jcd, w_plc, r_dst))
            # plane block (scatter over the small L axis)
            Hll_obs = (ai * jnp.einsum("cfri,cf,cfrj->cfij", Jpa, w_pl, Jpa)
                       + di * jnp.einsum("cfi,cf,cfj->cfij", Jpd, w_pl, Jpd))
            bl_obs = -(ai * jnp.einsum("cfri,cf,cfr->cfi", Jpa, w_pl, r_ang)
                       + di * jnp.einsum("cfi,cf,cf->cfi", Jpd, w_pl, r_dst))
            pl_tgt = jnp.where(plane_free.obs_valid
                               & (plane_free.obs_pl >= 0),
                               plane_free.obs_pl, L).reshape(-1)
            Hll = jnp.zeros((L + 1, 3, 3), jnp.float32).at[pl_tgt].add(
                Hll_obs.reshape(-1, 3, 3))[:L]
            bl = jnp.zeros((L + 1, 3), jnp.float32).at[pl_tgt].add(
                bl_obs.reshape(-1, 3))[:L]
            # cross block A_cl [C, L, 6, 3]
            Acl_obs = (ai * jnp.einsum("cfri,cf,cfrj->cfij", Jca, w_plc, Jpa)
                       + di * jnp.einsum("cfi,cf,cfj->cfij", Jcd, w_plc, Jpd))
            cidx_pl = jnp.broadcast_to(
                jnp.arange(C)[:, None], plane_free.obs_pl.shape).reshape(-1)
            Acl = jnp.zeros((C, L + 1, 6, 3), jnp.float32).at[
                cidx_pl, pl_tgt].add(Acl_obs.reshape(-1, 6, 3))[:, :L]
            Hll = Hll + (damping + 1e-6) * jnp.eye(3, dtype=jnp.float32)
            Hll_inv = jnp.where(plane_free.pl_free[:, None, None],
                                _inv3x3(Hll), 0.0)
        # point system over all P (padded slot P for drop)
        pid = prob.obs_pt
        flat_pid = jnp.where(active, pid, P).reshape(-1)
        JtWJ_p = jnp.einsum("cnri,cn,cnrj->cnij", J_p, w, J_p).reshape(-1, 3, 3)
        JtWr_p = jnp.einsum("cnri,cn,cnr->cni", J_p, w, r).reshape(-1, 3)
        Hpp = jnp.zeros((P + 1, 3, 3), jnp.float32).at[flat_pid].add(JtWJ_p)[:P]
        bp = -jnp.zeros((P + 1, 3), jnp.float32).at[flat_pid].add(JtWr_p)[:P]
        # damp + invert (points with no obs get identity -> delta 0 since bp 0)
        Hpp = Hpp + (damping + 1e-6) * jnp.eye(3, dtype=jnp.float32)
        Hpp_inv = _inv3x3(Hpp)
        pt_free = prob.pt_valid
        Hpp_inv = jnp.where(pt_free[:, None, None], Hpp_inv, 0.0)
        # pad the point axis to a whole number of chunks so the scan's
        # dynamic slices stay aligned with the per-chunk obs masks
        if P_pad != P:
            Hpp_inv = jnp.pad(Hpp_inv, ((0, P_pad - P), (0, 0), (0, 0)))
            bp = jnp.pad(bp, ((0, P_pad - P), (0, 0)))

        # Y = J_cᵀ W J_p per obs  [C,N,6,3]
        Y = jnp.einsum("cnri,cn,cnrj->cnij", J_c, w_c, J_p)

        # accumulation of S and rhs over the point axis. Two regimes:
        #  * dense: scatter A = Hcp ONCE into [C, P, 6, 3] when it fits
        #    (local BA; one 32k-row scatter per iteration instead of one
        #    per chunk — TPU scatters are the expensive op here)
        #  * chunked: global BA / distributed sharding, bounded memory
        dense_A = C * P_pad * 18 * 4 <= 192 * 1024 * 1024

        cidx = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
        S0 = jnp.zeros((C, C, 6, 6), jnp.float32)
        S0 = S0.at[jnp.arange(C), jnp.arange(C)].set(Hcc)
        if plane_free is not None:
            # marginalize the plane blocks (L is small — dense einsums)
            S0 = S0 - jnp.einsum("clij,ljk,dlmk->cdim", Acl, Hll_inv, Acl)
            bc = bc - jnp.einsum("clij,ljk,lk->ci", Acl, Hll_inv, bl)

        if dense_A:
            tgt_full = jnp.where(active, pid, P_pad)
            A_full = jnp.zeros((C, P_pad + 1, 6, 3), jnp.float32
                               ).at[cidx.reshape(-1), tgt_full.reshape(-1)
                                    ].add(Y.reshape(-1, 6, 3))[:, :P_pad]

        def chunk_body(carry, k):
            S, rhs = carry
            p0 = k * pt_chunk
            if dense_A:
                A = jax.lax.dynamic_slice(
                    A_full, (0, p0, 0, 0), (C, pt_chunk, 6, 3))
            else:
                local = pid - p0
                in_chunk = active & (local >= 0) & (local < pt_chunk)
                tgt = jnp.where(in_chunk, local, pt_chunk)
                A = jnp.zeros((C, pt_chunk + 1, 6, 3), jnp.float32
                              ).at[cidx.reshape(-1), tgt.reshape(-1)].add(
                    Y.reshape(-1, 6, 3))[:, :pt_chunk]
            Hinv_k = jax.lax.dynamic_slice(Hpp_inv, (p0, 0, 0),
                                           (pt_chunk, 3, 3))
            bp_k = jax.lax.dynamic_slice(bp, (p0, 0), (pt_chunk, 3))
            AH = jnp.einsum("cpij,pjk->cpik", A, Hinv_k)
            # S update as ONE MXU matmul: fold (cam,row) and (point,col)
            AH2 = AH.transpose(0, 2, 1, 3).reshape(C * 6, pt_chunk * 3)
            A2 = A.transpose(0, 2, 1, 3).reshape(C * 6, pt_chunk * 3)
            S2 = jnp.dot(AH2, A2.T, preferred_element_type=jnp.float32)
            S = S - S2.reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
            rhs = rhs - (AH2 @ bp_k.reshape(-1)).reshape(C, 6)
            return (S, rhs), None

        (S, rhs), _ = jax.lax.scan(chunk_body, (S0, bc), jnp.arange(n_chunks))

        # anchor fixed/invalid cameras: identity rows
        free = free_cam
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            jnp.eye(6) * (1.0 - free)[:, None, None])
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            jnp.eye(6) * damping)
        rhs = rhs * free[:, None]

        M = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        delta_c = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(C, 6)
        good = jnp.all(jnp.isfinite(delta_c))
        delta_c = jnp.where(good, delta_c, 0.0)

        # back-substitute points: δp = Hpp⁻¹ (bp − Aᵀ δc), chunked
        def back_body(_, k):
            p0 = k * pt_chunk
            if dense_A:
                A = jax.lax.dynamic_slice(
                    A_full, (0, p0, 0, 0), (C, pt_chunk, 6, 3))
            else:
                local = pid - p0
                in_chunk = active & (local >= 0) & (local < pt_chunk)
                tgt = jnp.where(in_chunk, local, pt_chunk)
                A = jnp.zeros((C, pt_chunk + 1, 6, 3), jnp.float32
                              ).at[cidx.reshape(-1), tgt.reshape(-1)].add(
                    Y.reshape(-1, 6, 3))[:, :pt_chunk]
            Hinv_k = jax.lax.dynamic_slice(Hpp_inv, (p0, 0, 0),
                                           (pt_chunk, 3, 3))
            bp_k = jax.lax.dynamic_slice(bp, (p0, 0), (pt_chunk, 3))
            A2 = A.transpose(0, 2, 1, 3).reshape(C * 6, pt_chunk * 3)
            t = bp_k - (delta_c.reshape(-1) @ A2).reshape(pt_chunk, 3)
            dp = jnp.einsum("pij,pj->pi", Hinv_k, t)
            return None, dp

        _, dp_chunks = jax.lax.scan(back_body, None, jnp.arange(n_chunks))
        delta_p = dp_chunks.reshape(P_pad, 3)[:P]
        delta_p = jnp.where(good & pt_free[:, None], delta_p, 0.0)
        # clamp wild point moves (robustness against ill-conditioned Hpp)
        delta_p = jnp.clip(delta_p, -10.0, 10.0)

        # back-substitute planes: δl = Hll⁻¹ (bl − A_clᵀ δc)
        if plane_free is not None:
            t_l = bl - jnp.einsum("clij,ci->lj", Acl, delta_c)
            delta_l = jnp.einsum("lij,lj->li", Hll_inv, t_l)
            delta_l = jnp.where(good & plane_free.pl_free[:, None],
                                jnp.clip(delta_l, -2.0, 2.0), 0.0)
            pl_coeff = plane_retract(pl_coeff, delta_l)

        cam_pose = jax.vmap(lie.se3_retract)(cam_pose, delta_c)
        pt_xyz = pt_xyz + delta_p
        return (cam_pose, pt_xyz, pl_coeff)

    def run_phase(state, active, iters):
        """Levenberg-Marquardt schedule: accept a step only if the
        robustified chi2 decreases; otherwise raise the damping (the g2o
        behavior the reference relies on, `src/Optimizer.cc:965-1007`).
        Early-exits on relative cost convergence — g2o's own termination —
        which typically ends local BA in 3-5 iterations. The current cost
        is CARRIED (one chi2 evaluation per iteration, not two)."""
        def cond(carry):
            _, _, it, stall, _ = carry
            return (it < iters) & (stall < 2)

        def body(carry):
            st, lam, it, stall, c_cur = carry
            cand = gn_iter(st, active, lam)
            c_new = total_chi2(*cand, active)
            accept = (c_new < c_cur) & jnp.isfinite(c_new)
            st = jax.tree.map(lambda a, b: jnp.where(accept, b, a), st, cand)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                            jnp.minimum(lam * 5.0, 1e3))
            improved = accept & (c_cur - c_new
                                 >= 1e-4 * jnp.maximum(c_cur, 1e-9))
            # two consecutive non-improving iterations (incl. rejected
            # steps — a converged window rejects everything) end the phase
            stall = jnp.where(improved, 0, stall + 1)
            c_cur = jnp.where(accept, c_new, c_cur)
            return (st, lam, it + 1, stall, c_cur)

        c0 = total_chi2(*state, active)
        state, _, _, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.float32(damping), 0, jnp.int32(0),
                         c0))
        return state

    state = (prob.cam_pose, prob.pt_xyz, pl0)
    state = run_phase(state, obs_ok0, n_iters1)

    # outlier reclassification between phases (chi2 gate + positive depth)
    r, _, _, stereo, behind = _residuals(prob, state[0], state[1], cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    thr = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = obs_ok0 & (chi2 <= thr) & (~behind)

    state = run_phase(state, inlier, n_iters2)

    r, _, _, stereo, behind = _residuals(prob, state[0], state[1], cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    inlier = obs_ok0 & (chi2 <= thr) & (~behind)
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return BAResult(cam_pose=state[0], pt_xyz=state[1],
                    obs_inlier=inlier, chi2=total,
                    pl_coeff=state[2] if plane_free is not None else None)


# --------------------------------------------------------------------------
# COO-layout bundle adjustment: the local-BA fast path.
#
# The dense [C, N] observation layout above carries every keypoint slot of
# every window keyframe through every LM iteration; at local-BA rate that is
# mostly padding (half the slots are untracked) over a point table that is
# mostly out-of-window. Here observations are a compacted edge list [E] over
# a window-compacted point table [Pw] — same math, same LM schedule, same
# two-phase outlier gate, ~4x fewer scatter rows and ~16x smaller Schur
# scatter targets. pipeline/local_mapping.py builds the compact problem
# on-device (argsort compaction — no host round-trip).
# --------------------------------------------------------------------------


class BACooProblem(NamedTuple):
    cam_pose: jax.Array    # [C, 7] Tcw
    cam_valid: jax.Array   # [C] bool
    cam_fixed: jax.Array   # [C] bool
    pt_xyz: jax.Array      # [Pw, 3] window-compacted points
    pt_valid: jax.Array    # [Pw] bool
    obs_cam: jax.Array     # [E] int32 camera index
    obs_pt: jax.Array      # [E] int32 window-local point index
    obs_uv: jax.Array      # [E, 2]
    obs_ur: jax.Array      # [E] virtual right u, <0 = mono
    obs_inv_sigma2: jax.Array  # [E]
    obs_valid: jax.Array   # [E] bool


def _residuals_coo(cam_pose, pt_xyz, prob: "BACooProblem", cam,
                   gather_oh=None):
    """Per-edge residuals r [E,3] and Jacobians J_c [E,3,6], J_p [E,3,3].

    `gather_oh` = (camohT [E,C], ptohT [E,Pw]) one-hot gather operands:
    row gathers on TPU serialize (~0.4 us/row — the same wall as the
    patch gather, NOTES_R4), so the edge-wise pose/point lookups run as
    one-hot matmuls on the MXU instead (exact: operands are 0/1), and the
    per-edge rotation matrices come from C=32 quaternion conversions
    broadcast through the same matmul rather than E=8192 conversions.
    Measured: 1.41 -> 0.23 ms for the residual+Jacobian stage at
    C=32/Pw=2048/E=8192 (dev/bench_ba_parts.py)."""
    fx, fy, cx, cy, bf = cam
    if gather_oh is not None:
        camohT, ptohT = gather_oh
        R_c = lie.quat_to_rotmat(cam_pose[:, :4])   # [C, 3, 3]
        camblk = jnp.concatenate(
            [R_c.reshape(-1, 9), cam_pose[:, 4:7]], axis=-1)
        eblk = jnp.dot(camohT, camblk,
                       preferred_element_type=jnp.float32)   # [E, 12]
        R = eblk[:, :9].reshape(-1, 3, 3)
        tr = eblk[:, 9:12]
        pw = jnp.dot(ptohT, pt_xyz,
                     preferred_element_type=jnp.float32)     # [E, 3]
    else:
        pw = pt_xyz[prob.obs_pt]                    # [E, 3]
        poses = cam_pose[prob.obs_cam]              # [E, 7]
        R = lie.quat_to_rotmat(poses[:, :4])        # [E, 3, 3]
        tr = poses[:, 4:7]
    xc = jnp.einsum("eij,ej->ei", R, pw) + tr
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    urr = u - bf * iz
    stereo = prob.obs_ur >= 0.0
    r = jnp.stack([prob.obs_uv[:, 0] - u, prob.obs_uv[:, 1] - v,
                   jnp.where(stereo, prob.obs_ur - urr, 0.0)], axis=-1)
    zero = jnp.zeros_like(z)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur = du + jnp.stack([zero, zero, bf * iz2], axis=-1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[:, None], dur, 0.0)],
                      axis=-2)                      # [E,3,3]
    dxc = jnp.concatenate([-lie.so3_hat(xc), jnp.broadcast_to(
        jnp.eye(3, dtype=xc.dtype), xc.shape + (3,))], axis=-1)  # [E,3,6]
    J_c = -jnp.einsum("eij,ejk->eik", dproj, dxc)
    J_p = -jnp.einsum("eij,ejk->eik", dproj, R)
    behind = xc[:, 2] < 1e-3
    return r, J_c, J_p, stereo, behind


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "n_iters1",
                                             "n_iters2", "ftol",
                                             "edge_kernel",
                                             "edge_interpret"))
@f32_matmuls
def bundle_adjust_coo(prob: BACooProblem, plane_block=None, *,
                      cam: Tuple[float, ...], cfg: SolverConfig,
                      n_iters1: int = 5, n_iters2: int = 10,
                      damping: float = 1e-3, ftol: float = 1e-4,
                      edge_kernel: Optional[bool] = None,
                      edge_interpret: bool = False) -> BAResult:
    """Two-phase LM BA on the COO layout. `plane_block` =
    (plane_w [C,F,4], meas_c [C,F,4], valid [C,F]) adds fixed-plane camera
    factors as in `bundle_adjust`. Returns BAResult with obs_inlier [E].

    `edge_kernel` overrides the cfg/backend choice of the fused Pallas
    per-edge pass (solvers/ba_edge_pallas.py); `edge_interpret` runs that
    kernel under the Pallas interpreter (CPU parity tests)."""
    C = prob.cam_pose.shape[0]
    Pw = prob.pt_xyz.shape[0]
    E = prob.obs_cam.shape[0]
    free_cam = (prob.cam_valid & (~prob.cam_fixed)).astype(jnp.float32)
    obs_ok0 = prob.obs_valid & (prob.obs_pt >= 0) \
        & prob.cam_valid[prob.obs_cam]

    # ---- TPU scatter elimination: the Hcc/Hpp/Hcp accumulations are
    # scatter-adds over E edges, which XLA serializes on TPU (measured
    # ~7 ms/LM-iteration at E=16k). Each (cam, point) pair carries at
    # most one edge, so a [C, Pw] edge-index LUT built ONCE per call
    # turns every in-loop accumulation into vectorized gathers (Hpp, A)
    # or small one-hot matmuls on the MXU (Hcc, bc). Duplicate (c, p)
    # edges (transient after fusion) resolve to one edge — the reference
    # never has duplicate (KF, point) observations at all. ----
    tgt0 = jnp.where(obs_ok0, prob.obs_pt, Pw)
    lut = jnp.full((C, Pw + 1), E, jnp.int32).at[
        prob.obs_cam, tgt0].set(jnp.arange(E, dtype=jnp.int32),
                                mode="drop")[:, :Pw]        # [C, Pw]
    cam_onehot = (prob.obs_cam[None, :]
                  == jnp.arange(C, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)                     # [C, E]
    # point one-hot [Pw, E]: Hpp/bp assembly as ONE MXU matmul instead of
    # the [C, Pw]-row LUT gather (measured 1.95 ms/LM-iteration at
    # Pw=4096/E=16k — gathers on TPU pay per index row, matmuls don't).
    # Built once per call; ~270 MB f32 in HBM, read once per iteration
    # (~0.35 ms at HBM bandwidth).
    pt_onehot = (tgt0[None, :] == jnp.arange(Pw, dtype=jnp.int32)[:, None]
                 ).astype(jnp.float32)                      # [Pw, E]
    # transposed copies for the edge-wise gathers inside _residuals_coo
    # (materialized once per call; a dot_general contraction on the other
    # orientation would re-layout the 64 MB operand every iteration)
    camohT = cam_onehot.T                                   # [E, C]
    ptohT = (tgt0[:, None] == jnp.arange(Pw, dtype=jnp.int32)[None, :]
             ).astype(jnp.float32)                          # [E, Pw]
    gather_oh = (camohT, ptohT)

    def _pad_e(x):
        return jnp.concatenate(
            [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)

    # ---- fused Pallas per-edge pass (TPU): the residual/Jacobian/Gram
    # chain below is ~20 tiny XLA kernels and per-kernel issue latency
    # dominates (dev/bench_ba_parts.py). One kernel computes the packed
    # payloads; the one-hot reductions stay on the MXU. ----
    use_edge = (edge_kernel if edge_kernel is not None
                else (cfg.use_pallas_ba_edges and E % 128 == 0
                      and jax.default_backend() == "tpu"))
    if use_edge:
        from eao_fusion_tpu.solvers import ba_edge_pallas
        fm_e = jnp.dot(free_cam[None, :], cam_onehot,
                       preferred_element_type=jnp.float32)      # [1, E]
        ein_static = jnp.concatenate(
            [prob.obs_uv.T, prob.obs_ur[None, :],
             prob.obs_inv_sigma2[None, :], fm_e], axis=0)       # [5, E]

        def build_ein(cam_pose, pt_xyz):
            R_c = lie.quat_to_rotmat(cam_pose[:, :4])
            camblk = jnp.concatenate(
                [R_c.reshape(-1, 9), cam_pose[:, 4:7]], axis=-1)
            eblk = jnp.dot(camblk.T, cam_onehot,
                           preferred_element_type=jnp.float32)  # [12, E]
            pwt = jnp.dot(pt_xyz.T, pt_onehot,
                          preferred_element_type=jnp.float32)   # [3, E]
            return jnp.concatenate([eblk, pwt, ein_static], axis=0)

    def robust_chi2(cam_pose, pt_xyz, active):
        if use_edge:
            ein = build_ein(cam_pose, pt_xyz)
            c2r_masked, _, _ = ba_edge_pallas.edge_pass_chi2(
                ein, active.astype(jnp.float32), cam=cam,
                chi2_mono=cfg.chi2_mono, chi2_stereo=cfg.chi2_stereo,
                interpret=edge_interpret)
            total = jnp.sum(c2r_masked)
        else:
            r, _, _, stereo, behind = _residuals_coo(
                cam_pose, pt_xyz, prob, cam, gather_oh)
            c2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
            delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
            c2r = jnp.where(c2 <= delta2, c2,
                            2.0 * jnp.sqrt(delta2 * c2) - delta2)
            w = (active.astype(jnp.float32)
                 * (1.0 - behind.astype(jnp.float32)))
            total = jnp.sum(c2r * w)
        if plane_block is not None:
            total = total + _plane_terms(cam_pose, *plane_block, cfg)[-1]
        return total

    def gn_iter(cam_pose, pt_xyz, active, lam):
        if use_edge:
            ein = build_ein(cam_pose, pt_xyz)
            payc_t, payp_t, y_t = ba_edge_pallas.edge_pass_full(
                ein, active.astype(jnp.float32), cam=cam,
                chi2_mono=cfg.chi2_mono, chi2_stereo=cfg.chi2_stereo,
                interpret=edge_interpret)
            acc_c = jax.lax.dot_general(
                cam_onehot, payc_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [C, 42]
            acc = jax.lax.dot_general(
                pt_onehot, payp_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [Pw, 12]
            Y = y_t.T.reshape(E, 6, 3)
        else:
            r, J_c, J_p, stereo, behind = _residuals_coo(
                cam_pose, pt_xyz, prob, cam, gather_oh)
            c2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
            delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
            w_rob = jnp.minimum(
                1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
            w = (prob.obs_inv_sigma2 * w_rob * active.astype(jnp.float32)
                 * (1.0 - behind.astype(jnp.float32)))

            # One packed Gram pass for every normal-equation block.
            # free_cam is 0/1, so pre-masking J_c applies the
            # fixed-camera gate to all J_c-bearing terms at once
            # (f^2 = f): Hcc, bc, and the cross block Y all come out
            # with the w_c = w * free_cam weighting the unpacked version
            # used, while Hpp/bp keep plain w.
            fm = jnp.dot(camohT, free_cam[:, None],
                         preferred_element_type=jnp.float32)    # [E, 1]
            J_cf = J_c * fm[:, :, None]
            J_all = jnp.concatenate([J_cf, J_p], axis=-1)       # [E,3,9]
            G = jnp.einsum("eri,e,erj->eij", J_all, w, J_all,
                           preferred_element_type=jnp.float32)  # [E,9,9]
            g = jnp.einsum("eri,e,er->ei", J_all, w, r,
                           preferred_element_type=jnp.float32)  # [E,9]

            # camera blocks: ONE [C, E] @ [E, 42] one-hot MXU matmul
            pay_c = jnp.concatenate(
                [G[:, :6, :6].reshape(E, 36), g[:, :6]], axis=-1)
            acc_c = jnp.dot(cam_onehot, pay_c,
                            preferred_element_type=jnp.float32)  # [C,42]
            # point blocks: ONE [Pw, E] @ [E, 12] one-hot matmul
            pay_p = jnp.concatenate(
                [G[:, 6:, 6:].reshape(E, 9), g[:, 6:]], axis=-1)
            acc = jnp.dot(pt_onehot, pay_p,
                          preferred_element_type=jnp.float32)   # [Pw,12]
            Y = G[:, :6, 6:]                                    # [E,6,3]

        Hcc = acc_c[:, :36].reshape(C, 6, 6)
        bc = -acc_c[:, 36:]
        if plane_block is not None:
            Hp, bp_c, _ = _plane_terms(cam_pose, *plane_block, cfg)
            Hcc = Hcc + Hp * free_cam[:, None, None]
            bc = bc + bp_c * free_cam[:, None]

        Hpp = acc[:, :9].reshape(Pw, 3, 3)
        bp = -acc[:, 9:]
        Hpp = Hpp + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)
        Hpp_inv = jnp.where(prob.pt_valid[:, None, None], _inv3x3(Hpp), 0.0)

        # A = Hcp, gathered (not scattered) into the dense [C, Pw] grid
        A = _pad_e(Y)[lut]                                      # [C,Pw,6,3]
        AH = jnp.einsum("cpij,pjk->cpik", A, Hpp_inv)
        AH2 = AH.transpose(0, 2, 1, 3).reshape(C * 6, Pw * 3)
        A2 = A.transpose(0, 2, 1, 3).reshape(C * 6, Pw * 3)
        S = -jnp.dot(AH2, A2.T, preferred_element_type=jnp.float32
                     ).reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
        S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
        rhs = bc - (AH2 @ bp.reshape(-1)).reshape(C, 6)

        S = S * free_cam[:, None, None, None] * free_cam[None, :, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            jnp.eye(6) * ((1.0 - free_cam)[:, None, None])
            + jnp.eye(6) * lam)
        rhs = rhs * free_cam[:, None]
        M = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        delta_c = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(C, 6)
        good = jnp.all(jnp.isfinite(delta_c))
        delta_c = jnp.where(good, delta_c, 0.0)

        # back-substitute through the SAME [C*6, Pw*3] layout used for
        # the Schur product (one matvec over the existing A2 instead of a
        # fresh cpij einsum, which forced XLA into a second layout pass)
        t = bp - (A2.T @ delta_c.reshape(-1)).reshape(Pw, 3)
        delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, t)
        delta_p = jnp.clip(jnp.where(good & prob.pt_valid[:, None],
                                     delta_p, 0.0), -10.0, 10.0)
        return (jax.vmap(lie.se3_retract)(cam_pose, delta_c),
                pt_xyz + delta_p)

    def run_phase(cam_pose, pt_xyz, active, iters):
        """LM accept/reject with the current cost CARRIED (one chi2
        evaluation per iteration, not two — c_old is c_new of the last
        accepted step). Terminates after two consecutive iterations
        without meaningful improvement — including REJECTED steps: a
        converged window rejects every step (any move worsens chi2), and
        without counting rejections the loop burns the full iteration
        budget at ~7 ms/iteration on a v5e (g2o's equivalent exit is the
        lambda blow-up bound)."""
        def cond(carry):
            _, _, _, it, stall, _ = carry
            return (it < iters) & (stall < 2)

        def body(carry):
            cp, ps, lam, it, stall, c_cur = carry
            cp2, ps2 = gn_iter(cp, ps, active, lam)
            c_new = robust_chi2(cp2, ps2, active)
            accept = (c_new < c_cur) & jnp.isfinite(c_new)
            cp = jnp.where(accept, cp2, cp)
            ps = jnp.where(accept, ps2, ps)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                            jnp.minimum(lam * 5.0, 1e3))
            improved = accept & (c_cur - c_new
                                 >= ftol * jnp.maximum(c_cur, 1e-9))
            stall = jnp.where(improved, 0, stall + 1)
            c_cur = jnp.where(accept, c_new, c_cur)
            return (cp, ps, lam, it + 1, stall, c_cur)

        c0 = robust_chi2(cam_pose, pt_xyz, active)
        cp, ps, _, _, _, _ = jax.lax.while_loop(
            cond, body, (cam_pose, pt_xyz, jnp.float32(damping), 0,
                         jnp.int32(0), c0))
        return cp, ps

    def classify(cam_pose, pt_xyz, thr):
        """Raw chi2 + behind-camera flag for the between-phase outlier
        gate (`src/Optimizer.cc:965-1007` edge reclassification)."""
        if use_edge:
            ein = build_ein(cam_pose, pt_xyz)
            _, chi2, behind_f = ba_edge_pallas.edge_pass_chi2(
                ein, obs_ok0.astype(jnp.float32), cam=cam,
                chi2_mono=cfg.chi2_mono, chi2_stereo=cfg.chi2_stereo,
                interpret=edge_interpret)
            behind = behind_f > 0.5
        else:
            r, _, _, _, behind = _residuals_coo(cam_pose, pt_xyz, prob,
                                                cam, gather_oh)
            chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
        return obs_ok0 & (chi2 <= thr) & (~behind), chi2

    thr = jnp.where(prob.obs_ur >= 0.0, cfg.chi2_stereo, cfg.chi2_mono)

    cam_pose, pt_xyz = run_phase(prob.cam_pose, prob.pt_xyz, obs_ok0,
                                 n_iters1)
    inlier, _ = classify(cam_pose, pt_xyz, thr)

    cam_pose, pt_xyz = run_phase(cam_pose, pt_xyz, inlier, n_iters2)
    inlier, chi2 = classify(cam_pose, pt_xyz, thr)
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return BAResult(cam_pose=cam_pose, pt_xyz=pt_xyz,
                    obs_inlier=inlier, chi2=total)
