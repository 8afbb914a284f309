"""Sim3 pose-graph optimization (essential graph).

Re-design of `Optimizer::OptimizeEssentialGraph` (`src/Optimizer.cc:1141`):
vertices are keyframe Sim3 poses S_iw (world -> kf, scale 1 for RGBD),
edges carry relative measurements S_ji; residual e = log(S_ji ∘ S_iw ∘
S_jw⁻¹) ∈ R⁷. Batched GN: per-edge Jacobians by forward-mode autodiff at
the retraction origin, dense normal equations over the 7K free parameters
(K ≤ a few hundred keyframes -> a couple-thousand-dim Cholesky, trivial on
the MXU), anchor keyframes held fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls


class PoseGraphProblem(NamedTuple):
    poses: jax.Array      # [K, 8] sim3 S_iw
    pose_valid: jax.Array  # [K] bool
    fixed: jax.Array      # [K] bool
    edge_i: jax.Array     # [E] int32
    edge_j: jax.Array     # [E] int32
    edge_meas: jax.Array  # [E, 8] measured S_ji
    edge_weight: jax.Array  # [E] float32 (0 = disabled)


def _edge_residual(si, sj, meas):
    """e = log(meas ∘ S_iw ∘ S_jw⁻¹)."""
    rel = lie.sim3_compose(meas, lie.sim3_compose(si, lie.sim3_inverse(sj)))
    return lie.sim3_log(rel)


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
@f32_matmuls
def optimize_pose_graph(prob: PoseGraphProblem, *, n_iters: int = 20,
                        fix_scale: bool = True, damping: float = 1e-4
                        ) -> jax.Array:
    """Returns optimized poses [K, 8]."""
    K = prob.poses.shape[0]
    E = prob.edge_i.shape[0]
    dof = 7

    def gn_iter(it, poses):
        si = poses[prob.edge_i]
        sj = poses[prob.edge_j]

        def res_tau(ti, tj, si, sj, meas):
            return _edge_residual(lie.sim3_retract(si, ti),
                                  lie.sim3_retract(sj, tj), meas)

        z = jnp.zeros((E, dof))
        r = jax.vmap(_edge_residual)(si, sj, prob.edge_meas)     # [E, 7]
        Ji = jax.vmap(jax.jacfwd(res_tau, argnums=0))(
            z, z, si, sj, prob.edge_meas)                        # [E, 7, 7]
        Jj = jax.vmap(jax.jacfwd(res_tau, argnums=1))(
            z, z, si, sj, prob.edge_meas)

        w = prob.edge_weight
        free = (prob.pose_valid & (~prob.fixed)).astype(jnp.float32)
        wi = w * free[prob.edge_i]
        wj = w * free[prob.edge_j]

        H = jnp.zeros((K, K, dof, dof))
        b = jnp.zeros((K, dof))
        H = H.at[prob.edge_i, prob.edge_i].add(
            jnp.einsum("eri,e,erj->eij", Ji, wi, Ji))
        H = H.at[prob.edge_j, prob.edge_j].add(
            jnp.einsum("eri,e,erj->eij", Jj, wj, Jj))
        H = H.at[prob.edge_i, prob.edge_j].add(
            jnp.einsum("eri,e,erj->eij", Ji, wi * wj / jnp.maximum(w, 1e-9), Jj))
        H = H.at[prob.edge_j, prob.edge_i].add(
            jnp.einsum("eri,e,erj->eij", Jj, wi * wj / jnp.maximum(w, 1e-9), Ji))
        b = b.at[prob.edge_i].add(-jnp.einsum("eri,e,er->ei", Ji, wi, r))
        b = b.at[prob.edge_j].add(-jnp.einsum("eri,e,er->ei", Jj, wj, r))

        # anchor fixed/invalid vertices
        anchor = 1.0 - free
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(dof) * (damping + 1e3 * anchor)[:, None, None]
            * jnp.ones((K, 1, 1)))
        b = b * free[:, None]

        M = H.transpose(0, 2, 1, 3).reshape(K * dof, K * dof)
        delta = jnp.linalg.solve(M, b.reshape(-1)).reshape(K, dof)
        good = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(good, delta, 0.0)
        if fix_scale:
            delta = delta.at[:, 6].set(0.0)
        return jax.vmap(lie.sim3_retract)(poses, delta)

    return jax.lax.fori_loop(0, n_iters, gn_iter, prob.poses)


def sim3_refine(pa: jax.Array, pb: jax.Array, w: jax.Array, g0: jax.Array,
                n_iters: int = 10, fix_scale: bool = True) -> jax.Array:
    """GN refinement of g: pb ≈ g(pa) on weighted 3D pairs — the role of
    `Optimizer::OptimizeSim3` (`src/Optimizer.cc:1437`) with 3D residuals."""
    def res(tau, g):
        gg = lie.sim3_retract(g, tau)
        return (lie.sim3_apply(gg, pa) - pb) * w[:, None]

    def body(i, g):
        z = jnp.zeros((7,))
        r = res(z, g).reshape(-1)
        J = jax.jacfwd(res)(z, g).reshape(-1, 7)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        b = -J.T @ r
        delta = jnp.linalg.solve(H, b)
        if fix_scale:
            delta = delta.at[6].set(0.0)
        return lie.sim3_retract(g, jnp.where(jnp.all(jnp.isfinite(delta)),
                                             delta, 0.0))

    return jax.lax.fori_loop(0, n_iters, body, g0)
