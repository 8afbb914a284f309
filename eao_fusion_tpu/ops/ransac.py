"""Batched-hypothesis RANSAC solvers: Horn closed-form SE3/Sim3 alignment.

Re-design of `src/Sim3Solver.cc` (Horn 3-point Sim3 inside adaptive RANSAC)
and the 3D-3D alignment needs of relocalization: instead of sequential
adaptive iteration, all hypotheses are drawn and evaluated at once
(vmap -> argmax inlier count), sized to the worst case (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie


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


class RansacResult(NamedTuple):
    transform: jax.Array   # [8] sim3 (pb ≈ s R pa + t)
    inliers: jax.Array     # [N] bool
    n_inliers: jax.Array   # [] int32


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "with_scale"))
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
