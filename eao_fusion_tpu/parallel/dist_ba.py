"""Distributed bundle adjustment: landmark-sharded Schur complement.

The TPU-native counterpart of the reference's single-threaded g2o BA
(SURVEY.md §2.4, §5.7): map points are sharded over the ``lm`` mesh axis;
every device holds the (small) replicated camera block and its own point
shard plus the observations that touch it. Each GN iteration:

  1. local: per-obs Jacobians for the device's point shard,
     Hpp/bp (local), A = Hcp (local), partial Hcc/bc,
     partial S_k = Hcc_k − A Hpp⁻¹ Aᵀ.
  2. `psum` over ``lm``: the reduced camera system S, rhs — this is the
     collective that rides ICI (DCN across hosts).
  3. replicated dense Cholesky solve for the camera update δc.
  4. local back-substitution for the shard's δp.

Implemented with `shard_map` so the collective structure is explicit and
the same code runs on any mesh size (8-device CPU mesh in tests, pod slice
in production).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers.ba import BAProblem, BAResult, _residuals, _weights


def distributed_bundle_adjust(prob: BAProblem, mesh: Mesh, *,
                              cam: Tuple[float, ...], cfg: SolverConfig,
                              n_iters: int = 10,
                              damping: float = 1e-3) -> BAResult:
    """Point axis of `prob.pt_xyz` / `pt_valid` must be divisible by the
    size of the mesh's ``lm`` axis. Observations are replicated and gated
    per shard by point id."""
    C, N = prob.obs_pt.shape
    P_total = prob.pt_xyz.shape[0]
    n_dev = mesh.shape["lm"]
    assert P_total % n_dev == 0, (P_total, n_dev)
    P_loc = P_total // n_dev

    obs_ok = prob.obs_valid & (prob.obs_pt >= 0) & prob.cam_valid[:, None]
    free_cam = (prob.cam_valid & (~prob.cam_fixed)).astype(jnp.float32)

    def shard_fn(pt_xyz_s, pt_valid_s, cam_pose, obs_pt, obs_uv, obs_ur,
                 obs_is2, active):
        """Runs per device: pt_* are the local shard, the rest replicated."""
        shard_i = jax.lax.axis_index("lm")
        p0 = shard_i * P_loc

        def gn_iter(i, state):
            cam_pose, pt_s = state
            # residuals against the LOCAL shard: remap global pid -> local
            local = obs_pt - p0
            mine = active & (local >= 0) & (local < P_loc)
            lp = jnp.clip(local, 0, P_loc - 1)

            sub = BAProblem(
                cam_pose=cam_pose, cam_valid=prob.cam_valid,
                cam_fixed=prob.cam_fixed, pt_xyz=pt_s, pt_valid=pt_valid_s,
                obs_pt=lp, obs_uv=obs_uv, obs_ur=obs_ur,
                obs_inv_sigma2=obs_is2, obs_valid=mine)
            r, J_c, J_p, stereo, behind = _residuals(sub, cam_pose, pt_s, cam)
            w, _ = _weights(r, stereo, behind, sub, mine, cfg)
            w_c = w * free_cam[:, None]

            Hcc = jnp.einsum("cnri,cn,cnrj->cij", J_c, w_c, J_c)
            bc = -jnp.einsum("cnri,cn,cnr->ci", J_c, w_c, r)

            flat_pid = jnp.where(mine, lp, P_loc).reshape(-1)
            JtWJ = jnp.einsum("cnri,cn,cnrj->cnij", J_p, w, J_p).reshape(-1, 3, 3)
            JtWr = jnp.einsum("cnri,cn,cnr->cni", J_p, w, r).reshape(-1, 3)
            Hpp = jnp.zeros((P_loc + 1, 3, 3), jnp.float32
                            ).at[flat_pid].add(JtWJ)[:P_loc]
            bp = -jnp.zeros((P_loc + 1, 3), jnp.float32
                            ).at[flat_pid].add(JtWr)[:P_loc]
            Hpp = Hpp + (damping + 1e-6) * jnp.eye(3, dtype=jnp.float32)
            Hpp_inv = jnp.where(pt_valid_s[:, None, None],
                                jnp.linalg.inv(Hpp), 0.0)

            Y = jnp.einsum("cnri,cn,cnrj->cnij", J_c, w_c, J_p)
            cidx = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
            tgt = jnp.where(mine, lp, P_loc)
            A = jnp.zeros((C, P_loc + 1, 6, 3), jnp.float32
                          ).at[cidx.reshape(-1), tgt.reshape(-1)].add(
                Y.reshape(-1, 6, 3))[:, :P_loc]
            AH = jnp.einsum("cpij,pjk->cpik", A, Hpp_inv)
            S_part = -jnp.einsum("cpik,dplk->cdil", AH, A)
            S_part = S_part.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
            rhs_part = bc - jnp.einsum("cpik,pk->ci", AH, bp)

            # ---- THE collective: reduce the camera system over shards ----
            S = jax.lax.psum(S_part, "lm")
            rhs = jax.lax.psum(rhs_part, "lm")

            S = S * free_cam[:, None, None, None] * free_cam[None, :, None, None]
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                jnp.eye(6) * ((1.0 - free_cam)[:, None, None])
                + jnp.eye(6) * damping)
            rhs = rhs * free_cam[:, None]
            M = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            delta_c = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(C, 6)
            good = jnp.all(jnp.isfinite(delta_c))
            delta_c = jnp.where(good, delta_c, 0.0)

            t = bp - jnp.einsum("cpij,ci->pj", A, delta_c)
            delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, t)
            delta_p = jnp.clip(jnp.where(good & pt_valid_s[:, None],
                                         delta_p, 0.0), -1.0, 1.0)
            cam_pose = jax.vmap(lie.se3_retract)(cam_pose, delta_c)
            return cam_pose, pt_s + delta_p

        cam_pose, pt_s = jax.lax.fori_loop(0, n_iters, gn_iter,
                                           (cam_pose, pt_xyz_s))
        return cam_pose, pt_s

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("lm"), P("lm"), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P("lm")),
        check_vma=False)

    cam_pose, pt_xyz = shard(prob.pt_xyz, prob.pt_valid, prob.cam_pose,
                             prob.obs_pt, prob.obs_uv, prob.obs_ur,
                             prob.obs_inv_sigma2, obs_ok)

    # final classification (replicated)
    r, _, _, stereo, behind = _residuals(prob, cam_pose, pt_xyz, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    thr = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = obs_ok & (chi2 <= thr) & (~behind)
    return BAResult(cam_pose=cam_pose, pt_xyz=pt_xyz, obs_inlier=inlier,
                    chi2=jnp.sum(jnp.where(inlier, chi2, 0.0)))
