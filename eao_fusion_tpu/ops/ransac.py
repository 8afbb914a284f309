"""Batched-hypothesis RANSAC solvers: Horn closed-form SE3/Sim3 alignment
and 2D-3D PnP.

Re-design of `src/Sim3Solver.cc` (Horn 3-point Sim3 inside adaptive RANSAC)
and `src/PnPsolver.cc` (EPnP inside adaptive RANSAC, used only by
relocalization `src/Tracking.cc:2830-2856`): instead of sequential adaptive
iteration, all hypotheses are drawn and evaluated at once (vmap -> argmax
inlier count), sized to the worst case (SURVEY.md §7.3). The PnP hypothesis
generator is a 6-point DLT with orthonormalization — same role as EPnP
here, since relocalization polishes the winner with the full pose GN.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls


def horn_align(pa: jax.Array, pb: jax.Array, w: jax.Array,
               with_scale: bool = False) -> jax.Array:
    """Weighted closed-form alignment pb ≈ s R pa + t.

    pa, pb: [N, 3]; w: [N] weights. Returns sim3 [8] (s=1 if !with_scale).
    Horn's method via SVD of the weighted covariance."""
    wn = w / jnp.maximum(w.sum(), 1e-9)
    ca = jnp.sum(pa * wn[:, None], axis=0)
    cb = jnp.sum(pb * wn[:, None], axis=0)
    A = pa - ca
    B = pb - cb
    cov = jnp.einsum("n,ni,nj->ij", wn, B, A)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ S @ Vt
    if with_scale:
        var_a = jnp.sum(wn * jnp.sum(A * A, axis=-1))
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_a, 1e-12)
    else:
        s = jnp.asarray(1.0)
    t = cb - s * (R @ ca)
    q = lie.rotmat_to_quat(R)
    return jnp.concatenate([q, t, s[None]])


def _dlt_pnp(pw: jax.Array, xn: jax.Array) -> jax.Array:
    """6-point DLT pose: world points pw [6,3], normalized image coords
    xn [6,2] (K⁻¹ u). Returns Tcw [7]."""
    X, Y, Z = pw[:, 0], pw[:, 1], pw[:, 2]
    u, v = xn[:, 0], xn[:, 1]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, one, zero, zero, zero, zero,
                    -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one,
                    -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2])                    # [12, 12]
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    # resolve the global sign of P so that det(M) > 0 (M = s·R, s > 0)
    M = P[:, :3]
    sgn = jnp.where(jnp.linalg.det(M) < 0, -1.0, 1.0)
    P = sgn * P
    M = P[:, :3]
    U, D, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.eye(3).at[2, 2].set(jnp.sign(det)) @ Vt2
    s = jnp.maximum(jnp.mean(D), 1e-12)
    t = P[:, 3] / s
    return lie.se3_from_Rt(R, t)


class PnPResult(NamedTuple):
    pose: jax.Array        # [7] Tcw
    inliers: jax.Array     # [N] bool
    n_inliers: jax.Array   # [] int32


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses"))
@f32_matmuls
def ransac_pnp(pw: jax.Array, uv: jax.Array, valid: jax.Array,
               key: jax.Array, *, cam: Tuple[float, float, float, float],
               n_hypotheses: int = 192, reproj_th: float = 4.0) -> PnPResult:
    """2D-3D pose RANSAC: world points pw [N,3] vs pixels uv [N,2]."""
    fx, fy, cx, cy = cam
    n = pw.shape[0]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(n_hypotheses, 6), replace=True,
                            p=p)

    def hyp(sel):
        pose = _dlt_pnp(pw[sel], xn[sel])
        xc = lie.se3_apply(pose, pw)
        proj = lie.project(cam, xc)
        err = jnp.linalg.norm(proj - uv, axis=-1)
        inl = (err < reproj_th) & (xc[:, 2] > 0.05) & valid
        return pose, jnp.sum(inl.astype(jnp.int32))

    poses, counts = jax.vmap(hyp)(idx)
    best = jnp.argmax(counts)
    pose = poses[best]
    xc = lie.se3_apply(pose, pw)
    err = jnp.linalg.norm(lie.project(cam, xc) - uv, axis=-1)
    inl = (err < reproj_th) & (xc[:, 2] > 0.05) & valid
    return PnPResult(pose=pose, inliers=inl,
                     n_inliers=jnp.sum(inl.astype(jnp.int32)))


class RansacResult(NamedTuple):
    transform: jax.Array   # [8] sim3 (pb ≈ s R pa + t)
    inliers: jax.Array     # [N] bool
    n_inliers: jax.Array   # [] int32


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "with_scale"))
@f32_matmuls
def ransac_align(pa: jax.Array, pb: jax.Array, valid: jax.Array,
                 key: jax.Array, *, n_hypotheses: int = 128,
                 inlier_th: float = 0.10, with_scale: bool = False
                 ) -> RansacResult:
    """3D-3D RANSAC: sample minimal triples, Horn per hypothesis, pick the
    hypothesis with most 3D-distance inliers, refit on its inliers."""
    n = pa.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(n_hypotheses, 3), replace=True,
                            p=p)

    def hyp(tri):
        g = horn_align(pa[tri], pb[tri], jnp.ones(3), with_scale)
        pred = lie.sim3_apply(g, pa)
        err = jnp.linalg.norm(pred - pb, axis=-1)
        inl = (err < inlier_th) & valid
        return g, jnp.sum(inl.astype(jnp.int32))

    gs, counts = jax.vmap(hyp)(idx)
    best = jnp.argmax(counts)
    g0 = gs[best]
    # refit on inliers (one reweighted Horn pass)
    pred = lie.sim3_apply(g0, pa)
    err = jnp.linalg.norm(pred - pb, axis=-1)
    inl = (err < inlier_th) & valid
    g = horn_align(pa, pb, inl.astype(jnp.float32), with_scale)
    pred = lie.sim3_apply(g, pa)
    err = jnp.linalg.norm(pred - pb, axis=-1)
    inl = (err < inlier_th) & valid
    return RansacResult(transform=g, inliers=inl,
                        n_inliers=jnp.sum(inl.astype(jnp.int32)))
