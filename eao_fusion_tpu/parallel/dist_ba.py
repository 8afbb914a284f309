"""Distributed bundle adjustment: observation-sharded Schur complement.

The TPU-native counterpart of the reference's single-threaded g2o BA
(SURVEY.md §2.4, §5.7). Map points are sharded over the ``lm`` mesh axis
and — the part that makes compute actually scale — observations are
PRE-PARTITIONED by point shard into per-device COO lists, so every device
computes residuals/Jacobians only for the observations touching its own
point shard (~E/n per device instead of all E). Each LM iteration:

  1. local: per-obs Jacobians for the device's observation list,
     Hpp/bp (local point shard), A = Hcp (local), partial Hcc/bc,
     partial S_k = Hcc_k − A Hpp⁻¹ Aᵀ, partial robust chi2.
  2. `psum` over ``lm``: the reduced camera system S, rhs, and the total
     cost — the collectives that ride ICI (DCN across hosts).
  3. replicated dense Cholesky solve for the camera update δc.
  4. local back-substitution for the shard's δp.
  5. replicated LM accept/reject on the psum'd robust chi2 — the same
     schedule as the production solver (`solvers/ba.py` run_phase), unlike
     a fixed-iteration GN.

Two-phase structure matches the reference (`src/Optimizer.cc:965-1007`):
iters1, chi2 outlier reclassification, iters2.

Implemented with `shard_map` so the collective structure is explicit and
the same code runs on any mesh size (8-device CPU mesh in tests, pod slice
in production).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls
from eao_fusion_tpu.solvers.ba import (BAProblem, BAResult, PlaneFreeBlock,
                                       _inv3x3, _plane_free_terms,
                                       _residuals, plane_retract)


class ShardedObs(NamedTuple):
    """Per-device observation lists, bucketed by point shard: leading axis
    is the ``lm`` mesh axis; each row holds only the observations whose
    point lives on that device (padded with valid=False)."""
    cam: jax.Array        # [D, E] int32 camera index
    pid_local: jax.Array  # [D, E] int32 point index within the shard
    uv: jax.Array         # [D, E, 2]
    ur: jax.Array         # [D, E]
    inv_sigma2: jax.Array  # [D, E]
    valid: jax.Array      # [D, E] bool


def partition_observations(prob: BAProblem, n_dev: int,
                           pad_multiple: int = 512) -> ShardedObs:
    """Bucket the dense [C, N] observation table by point shard. Host-side
    numpy (runs at GBA rate, not per frame). Each device receives ~E/n
    observations; the padded width is the max shard load rounded up."""
    P_total = prob.pt_xyz.shape[0]
    assert P_total % n_dev == 0, (P_total, n_dev)
    P_loc = P_total // n_dev

    obs_ok = np.asarray(prob.obs_valid & (prob.obs_pt >= 0)
                        & prob.cam_valid[:, None])
    pid = np.asarray(prob.obs_pt)
    uv = np.asarray(prob.obs_uv)
    ur = np.asarray(prob.obs_ur)
    is2 = np.asarray(prob.obs_inv_sigma2)

    cam_i, slot = np.nonzero(obs_ok)
    p = pid[cam_i, slot]
    shard = p // P_loc
    counts = np.bincount(shard, minlength=n_dev)
    E = int(max(counts.max(), 1))
    E = -(-E // pad_multiple) * pad_multiple

    cam_a = np.zeros((n_dev, E), np.int32)
    lp_a = np.zeros((n_dev, E), np.int32)
    uv_a = np.zeros((n_dev, E, 2), np.float32)
    ur_a = np.full((n_dev, E), -1.0, np.float32)
    is2_a = np.ones((n_dev, E), np.float32)
    ok_a = np.zeros((n_dev, E), bool)
    order = np.argsort(shard, kind="stable")
    off = 0
    for d in range(n_dev):
        k = counts[d]
        sel = order[off:off + k]
        off += k
        cam_a[d, :k] = cam_i[sel]
        lp_a[d, :k] = p[sel] - d * P_loc
        uv_a[d, :k] = uv[cam_i[sel], slot[sel]]
        ur_a[d, :k] = ur[cam_i[sel], slot[sel]]
        is2_a[d, :k] = is2[cam_i[sel], slot[sel]]
        ok_a[d, :k] = True
    return ShardedObs(cam=jnp.asarray(cam_a), pid_local=jnp.asarray(lp_a),
                      uv=jnp.asarray(uv_a), ur=jnp.asarray(ur_a),
                      inv_sigma2=jnp.asarray(is2_a), valid=jnp.asarray(ok_a))


def _obs_residuals(cam_pose, pt_s, obs: ShardedObs, cam):
    """Per-obs residuals r [E,3], J_c [E,3,6], J_p [E,3,3] on one device
    (obs fields already squeezed to [E, ...])."""
    fx, fy, cx, cy, bf = cam
    pw = pt_s[obs.pid_local]                        # [E, 3]
    poses = cam_pose[obs.cam]                       # [E, 7]
    R = lie.quat_to_rotmat(poses[:, :4])            # [E, 3, 3]
    xc = jnp.einsum("eij,ej->ei", R, pw) + poses[:, 4:7]
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    urr = u - bf * iz
    stereo = obs.ur >= 0.0
    r = jnp.stack([obs.uv[:, 0] - u, obs.uv[:, 1] - v,
                   jnp.where(stereo, obs.ur - urr, 0.0)], axis=-1)
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


@f32_matmuls
def distributed_bundle_adjust(prob: BAProblem, mesh: Mesh, *,
                              plane_free=None,
                              cam: Tuple[float, ...], cfg: SolverConfig,
                              n_iters: int = 10, n_iters1: int = 0,
                              damping: float = 1e-3,
                              obs: "ShardedObs" = None) -> BAResult:
    """Point axis of `prob.pt_xyz` / `pt_valid` must be divisible by the
    size of the mesh's ``lm`` axis. When n_iters1 > 0 runs the production
    two-phase schedule (n_iters1, outlier gate, n_iters). `plane_free`
    (PlaneFreeBlock) adds free plane vertices; the plane system is small
    and REPLICATED — its terms enter after the psum so every device adds
    them exactly once."""
    C, N = prob.obs_pt.shape
    P_total = prob.pt_xyz.shape[0]
    n_dev = mesh.shape["lm"]
    P_loc = P_total // n_dev
    if obs is None:
        # host-side numpy partition — callers that trace/lower this
        # function (the weak-scaling guard tests) pass a precomputed one
        obs = partition_observations(prob, n_dev)

    free_cam = (prob.cam_valid & (~prob.cam_fixed)).astype(jnp.float32)
    pl0 = (plane_free.pl_coeff if plane_free is not None
           else jnp.zeros((1, 4), jnp.float32))

    def shard_fn(pt_xyz_s, pt_valid_s, cam_pose, pl_coeff, cam_o, pid_o,
                 uv_o, ur_o, is2_o, ok_o):
        """Runs per device: pt_*/obs rows are the local shard, the rest
        replicated."""
        o = ShardedObs(cam=cam_o[0], pid_local=pid_o[0], uv=uv_o[0],
                       ur=ur_o[0], inv_sigma2=is2_o[0], valid=ok_o[0])

        def robust_chi2(cam_pose, pt_s, pl, active):
            r, _, _, stereo, behind = _obs_residuals(cam_pose, pt_s, o, cam)
            c2 = jnp.sum(r * r, axis=-1) * o.inv_sigma2
            delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
            c2r = jnp.where(c2 <= delta2, c2,
                            2.0 * jnp.sqrt(delta2 * c2) - delta2)
            w = active.astype(jnp.float32) * (1.0 - behind.astype(jnp.float32))
            total = jax.lax.psum(jnp.sum(c2r * w), "lm")
            if plane_free is not None:
                # replicated plane cost added once, outside the psum
                total = total + _plane_free_terms(cam_pose, pl, plane_free,
                                                  cfg)[-1]
            return total

        def gn_iter(cam_pose, pt_s, pl, active, lam):
            r, J_c, J_p, stereo, behind = _obs_residuals(cam_pose, pt_s,
                                                         o, cam)
            c2 = jnp.sum(r * r, axis=-1) * o.inv_sigma2
            delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
            w_rob = jnp.minimum(1.0, jnp.sqrt(
                delta2 / jnp.maximum(c2, 1e-12)))
            w = (o.inv_sigma2 * w_rob * active.astype(jnp.float32)
                 * (1.0 - behind.astype(jnp.float32)))
            w_c = w * free_cam[o.cam]

            Hcc = jnp.zeros((C, 6, 6), jnp.float32).at[o.cam].add(
                jnp.einsum("eri,e,erj->eij", J_c, w_c, J_c))
            bc = -jnp.zeros((C, 6), jnp.float32).at[o.cam].add(
                jnp.einsum("eri,e,er->ei", J_c, w_c, r))

            tgt = jnp.where(o.valid & active, o.pid_local, P_loc)
            Hpp = jnp.zeros((P_loc + 1, 3, 3), jnp.float32).at[tgt].add(
                jnp.einsum("eri,e,erj->eij", J_p, w, J_p))[:P_loc]
            bp = -jnp.zeros((P_loc + 1, 3), jnp.float32).at[tgt].add(
                jnp.einsum("eri,e,er->ei", J_p, w, r))[:P_loc]
            Hpp = Hpp + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)
            Hpp_inv = jnp.where(pt_valid_s[:, None, None],
                                _inv3x3(Hpp), 0.0)

            Y = jnp.einsum("eri,e,erj->eij", J_c, w_c, J_p)   # [E,6,3]
            A = jnp.zeros((C, P_loc + 1, 6, 3), jnp.float32).at[
                o.cam, tgt].add(Y)[:, :P_loc]
            AH = jnp.einsum("cpij,pjk->cpik", A, Hpp_inv)
            # fold (cam,row) x (point,col) into ONE MXU matmul
            AH2 = AH.transpose(0, 2, 1, 3).reshape(C * 6, P_loc * 3)
            A2 = A.transpose(0, 2, 1, 3).reshape(C * 6, P_loc * 3)
            S_part = -jnp.dot(AH2, A2.T, preferred_element_type=jnp.float32
                              ).reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
            S_part = S_part.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
            rhs_part = bc - (AH2 @ bp.reshape(-1)).reshape(C, 6)

            # ---- THE collective: reduce the camera system over shards ----
            S = jax.lax.psum(S_part, "lm")
            rhs = jax.lax.psum(rhs_part, "lm")

            if plane_free is not None:
                # replicated plane system (L is small), added once AFTER
                # the psum so no device double-counts it; planes are
                # Schur-marginalized 3-DoF blocks exactly as in ba.py
                L = pl.shape[0]
                (r_ang, r_dst, w_pl, Jca, Jcd, Jpa, Jpd,
                 _) = _plane_free_terms(cam_pose, pl, plane_free, cfg)
                ai, di = cfg.plane_angle_info, cfg.plane_dist_info
                w_plc = w_pl * free_cam[:, None]
                Hcc_pl = (ai * jnp.einsum("cfri,cf,cfrj->cij",
                                          Jca, w_plc, Jca)
                          + di * jnp.einsum("cfi,cf,cfj->cij",
                                            Jcd, w_plc, Jcd))
                bc_pl = -(ai * jnp.einsum("cfri,cf,cfr->ci",
                                          Jca, w_plc, r_ang)
                          + di * jnp.einsum("cfi,cf,cf->ci",
                                            Jcd, w_plc, r_dst))
                Hll_obs = (ai * jnp.einsum("cfri,cf,cfrj->cfij",
                                           Jpa, w_pl, Jpa)
                           + di * jnp.einsum("cfi,cf,cfj->cfij",
                                             Jpd, w_pl, Jpd))
                bl_obs = -(ai * jnp.einsum("cfri,cf,cfr->cfi",
                                           Jpa, w_pl, r_ang)
                           + di * jnp.einsum("cfi,cf,cf->cfi",
                                             Jpd, w_pl, r_dst))
                pl_tgt = jnp.where(plane_free.obs_valid
                                   & (plane_free.obs_pl >= 0),
                                   plane_free.obs_pl, L).reshape(-1)
                Hll = jnp.zeros((L + 1, 3, 3), jnp.float32).at[pl_tgt].add(
                    Hll_obs.reshape(-1, 3, 3))[:L]
                bl = jnp.zeros((L + 1, 3), jnp.float32).at[pl_tgt].add(
                    bl_obs.reshape(-1, 3))[:L]
                Acl_obs = (ai * jnp.einsum("cfri,cf,cfrj->cfij",
                                           Jca, w_plc, Jpa)
                           + di * jnp.einsum("cfi,cf,cfj->cfij",
                                             Jcd, w_plc, Jpd))
                cidx_pl = jnp.broadcast_to(
                    jnp.arange(C)[:, None],
                    plane_free.obs_pl.shape).reshape(-1)
                Acl = jnp.zeros((C, L + 1, 6, 3), jnp.float32).at[
                    cidx_pl, pl_tgt].add(Acl_obs.reshape(-1, 6, 3))[:, :L]
                Hll = Hll + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)
                Hll_inv = jnp.where(plane_free.pl_free[:, None, None],
                                    _inv3x3(Hll), 0.0)
                S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_pl)
                S = S - jnp.einsum("clij,ljk,dlmk->cdim",
                                   Acl, Hll_inv, Acl)
                rhs = rhs + bc_pl - jnp.einsum("clij,ljk,lk->ci",
                                               Acl, Hll_inv, bl)

            S = S * free_cam[:, None, None, None] \
                * free_cam[None, :, None, None]
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                jnp.eye(6) * ((1.0 - free_cam)[:, None, None])
                + jnp.eye(6) * lam)
            rhs = rhs * free_cam[:, None]
            M = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            delta_c = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(C, 6)
            good = jnp.all(jnp.isfinite(delta_c))
            delta_c = jnp.where(good, delta_c, 0.0)

            t = bp - jnp.einsum("cpij,ci->pj", A, delta_c)
            delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, t)
            delta_p = jnp.clip(jnp.where(good & pt_valid_s[:, None],
                                         delta_p, 0.0), -10.0, 10.0)
            if plane_free is not None:
                t_l = bl - jnp.einsum("clij,ci->lj", Acl, delta_c)
                delta_l = jnp.einsum("lij,lj->li", Hll_inv, t_l)
                delta_l = jnp.where(good & plane_free.pl_free[:, None],
                                    jnp.clip(delta_l, -2.0, 2.0), 0.0)
                pl = plane_retract(pl, delta_l)
            return (jax.vmap(lie.se3_retract)(cam_pose, delta_c),
                    pt_s + delta_p, pl)

        def run_phase(cam_pose, pt_s, pl, active, iters):
            """Production LM schedule (accept/reject + early exit), with
            the cost reduced over the mesh so all devices branch
            identically."""
            def cond(carry):
                _, _, _, _, it, stall = carry
                return (it < iters) & (stall < 2)

            def body(carry):
                cp, ps, pl, lam, it, stall = carry
                cp2, ps2, pl2 = gn_iter(cp, ps, pl, active, lam)
                c_old = robust_chi2(cp, ps, pl, active)
                c_new = robust_chi2(cp2, ps2, pl2, active)
                accept = (c_new < c_old) & jnp.isfinite(c_new)
                cp = jnp.where(accept, cp2, cp)
                ps = jnp.where(accept, ps2, ps)
                pl = jnp.where(accept, pl2, pl)
                lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                                jnp.minimum(lam * 5.0, 1e3))
                improved = accept & (c_old - c_new
                                     >= 1e-4 * jnp.maximum(c_old, 1e-9))
                # count non-improving iterations (incl. rejected steps) so
                # converged problems exit instead of burning the budget;
                # the chi2 is psum-reduced so all devices branch the same
                stall = jnp.where(improved, 0, stall + 1)
                return (cp, ps, pl, lam, it + 1, stall)

            cp, ps, pl, _, _, _ = jax.lax.while_loop(
                cond, body,
                (cam_pose, pt_s, pl, jnp.float32(damping), 0,
                 jnp.int32(0)))
            return cp, ps, pl

        active = o.valid
        if n_iters1 > 0:
            cam_pose, pt_xyz_s, pl_coeff = run_phase(
                cam_pose, pt_xyz_s, pl_coeff, active, n_iters1)
            # outlier reclassification between phases (chi2 gate)
            r, _, _, stereo, behind = _obs_residuals(cam_pose, pt_xyz_s,
                                                     o, cam)
            c2 = jnp.sum(r * r, axis=-1) * o.inv_sigma2
            thr = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
            active = active & (c2 <= thr) & (~behind)
        cam_pose, pt_xyz_s, pl_coeff = run_phase(
            cam_pose, pt_xyz_s, pl_coeff, active, n_iters)
        return cam_pose, pt_xyz_s, pl_coeff

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("lm"), P("lm"), P(), P(),
                  P("lm"), P("lm"), P("lm"), P("lm"), P("lm"), P("lm")),
        out_specs=(P(), P("lm"), P()),
        check_vma=False)

    cam_pose, pt_xyz, pl_out = shard(
        prob.pt_xyz, prob.pt_valid, prob.cam_pose, pl0,
        obs.cam, obs.pid_local, obs.uv, obs.ur,
        obs.inv_sigma2, obs.valid)

    # final classification (replicated, dense layout for parity with ba.py)
    obs_ok = prob.obs_valid & (prob.obs_pt >= 0) & prob.cam_valid[:, None]
    r, _, _, stereo, behind = _residuals(prob, cam_pose, pt_xyz, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    thr = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = obs_ok & (chi2 <= thr) & (~behind)
    return BAResult(cam_pose=cam_pose, pt_xyz=pt_xyz, obs_inlier=inlier,
                    chi2=jnp.sum(jnp.where(inlier, chi2, 0.0)),
                    pl_coeff=pl_out if plane_free is not None else None)
