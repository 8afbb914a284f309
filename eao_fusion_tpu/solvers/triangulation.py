"""Two-view triangulation with ORB-SLAM2's acceptance checks.

Re-design of the triangulation core of `LocalMapping::CreateNewMapPoints`
(`src/LocalMapping.cc:211-456`) and `Initializer::Triangulate/CheckRT`:
batched DLT over all candidate pairs at once, with parallax / positive
depth / reprojection / scale-consistency gates as masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls


def triangulate_dlt(tcw1: jax.Array, tcw2: jax.Array, xn1: jax.Array,
                    xn2: jax.Array) -> jax.Array:
    """DLT triangulation. xn1, xn2: [N, 2] normalized image coords (K⁻¹ u).
    Returns world points [N, 3]."""
    P1 = lie.se3_matrix(tcw1)[:3]                       # [3, 4]
    P2 = lie.se3_matrix(tcw2)[:3]

    def one(a, b):
        A = jnp.stack([
            a[0] * P1[2] - P1[0],
            a[1] * P1[2] - P1[1],
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(xn1, xn2)


class TriangulationResult(NamedTuple):
    xyz: jax.Array     # [N, 3] world points
    ok: jax.Array      # [N] acceptance mask


@functools.partial(jax.jit, static_argnames=("cam",))
@f32_matmuls
def triangulate_checked(tcw1: jax.Array, tcw2: jax.Array, uv1: jax.Array,
                        uv2: jax.Array, valid: jax.Array,
                        inv_sigma2_1: jax.Array, inv_sigma2_2: jax.Array,
                        *, cam: Tuple[float, float, float, float],
                        min_parallax_cos: float = 0.9998,
                        chi2: float = 5.991) -> TriangulationResult:
    """Triangulate matched pixel pairs with the reference's gates."""
    fx, fy, cx, cy = cam
    xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], -1)
    xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], -1)
    xw = triangulate_dlt(tcw1, tcw2, xn1, xn2)

    xc1 = lie.se3_apply(tcw1, xw)
    xc2 = lie.se3_apply(tcw2, xw)
    pos_depth = (xc1[:, 2] > 0.02) & (xc2[:, 2] > 0.02)

    # parallax between viewing rays
    c1 = lie.se3_inverse(tcw1)[4:7]
    c2 = lie.se3_inverse(tcw2)[4:7]
    r1 = xw - c1
    r2 = xw - c2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)
    parallax_ok = cosp < min_parallax_cos

    e1 = lie.project(cam, xc1) - uv1
    e2 = lie.project(cam, xc2) - uv2
    rep_ok = ((jnp.sum(e1 * e1, -1) * inv_sigma2_1 < chi2)
              & (jnp.sum(e2 * e2, -1) * inv_sigma2_2 < chi2))

    ok = valid & pos_depth & parallax_ok & rep_ok & jnp.all(
        jnp.isfinite(xw), axis=-1)
    return TriangulationResult(xyz=xw, ok=ok)
