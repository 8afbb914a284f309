"""Plane segmentation from organized depth: PEAC-style windowed fitting with
data-parallel label-propagation merging.

Re-design of `include/PEAC/AHCPlaneFitter.hpp` (agglomerative hierarchical
clustering with a sequential min-heap, `PlaneFitter::run` :209-246) for the
TPU (SURVEY.md §7.3): the image is tiled into 10x10-px windows whose plane
fits come from accumulated first/second moments + a closed-form symmetric
3x3 eigensolve (the same math as PEAC's `eig33sym.hpp`, vectorized over all
windows at once). The sequential AHC merge is replaced by connected-
component labeling over the window graph — alternating compatible-neighbor
min-label steps with pointer-jumping — followed by a per-component refit
from summed moments. Pixel-level refinement assigns every pixel to the
nearest compatible plane (PEAC's `refineDetails`).

Outputs fixed-capacity FramePlanes: camera-frame Hessian coeffs, support
counts, and a strided boundary-point sample (the reference voxel-downsamples
plane points to a 5 cm grid, `src/Frame.cc:417-443`; a strided pixel grid
gives the same spatial-spread role with static shapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import CameraConfig, PlaneConfig
from eao_fusion_tpu.types import FramePlanes


def eigh3_smallest(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Smallest eigenvalue + eigenvector of symmetric [..., 3, 3] matrices.

    Closed-form trigonometric eigenvalues + cross-product eigenvectors —
    vectorizes on the VPU without QR iteration."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-20))
    # det(B)/2 with B = (A - qI)/p
    ip = 1.0 / p
    c00, c11, c22 = b00 * ip, b11 * ip, b22 * ip
    c01, c02, c12 = a01 * ip, a02 * ip, a12 * ip
    detB = (c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: lam0 <= lam1 <= lam2
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector for lam0: cross of two rows of (A - lam0 I)
    r0 = jnp.stack([a00 - lam0, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam0, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam0], axis=-1)
    v01 = jnp.cross(r0, r1)
    v02 = jnp.cross(r0, r2)
    v12 = jnp.cross(r1, r2)
    n01 = jnp.sum(v01 * v01, axis=-1)
    n02 = jnp.sum(v02 * v02, axis=-1)
    n12 = jnp.sum(v12 * v12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    v = jnp.take_along_axis(
        jnp.stack([v01, v02, v12], axis=-2),
        best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    # (near-)isotropic matrices: any unit vector is an eigenvector
    degenerate = jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-18
    v = jnp.where(degenerate[..., None],
                  jnp.array([0.0, 0.0, 1.0], dtype=v.dtype), v)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return lam0, v


def backproject_depth(depth: jax.Array, cam: CameraConfig) -> jax.Array:
    """[H, W] depth -> [H, W, 3] camera-frame organized cloud."""
    H, W = depth.shape
    us = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    vs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = (us - cam.cx) / cam.fx * depth
    y = (vs - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def _window_moments(cloud: jax.Array, valid: jax.Array, win: int):
    """Per-window count, sum, and outer-product sums. Returns arrays with
    leading dim G = (H//win)*(W//win)."""
    H, W, _ = cloud.shape
    gh, gw = H // win, W // win
    c = cloud[:gh * win, :gw * win].reshape(gh, win, gw, win, 3)
    m = valid[:gh * win, :gw * win].reshape(gh, win, gw, win, 1)
    c = jnp.where(m, c, 0.0)
    n = m.sum(axis=(1, 3)).reshape(gh * gw)
    s = c.sum(axis=(1, 3)).reshape(gh * gw, 3)
    cw = c.transpose(0, 2, 1, 3, 4).reshape(gh * gw, win * win, 3)
    pp = jnp.einsum("gki,gkj->gij", cw, cw)
    return n, s, pp, gh, gw


def _fit_from_moments(n, s, pp):
    """Plane fit from (count, sum, sum-outer): normal + d + mse."""
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    mu = s / nf[:, None]
    cov = pp / nf[:, None, None] - jnp.einsum("gi,gj->gij", mu, mu)
    mse, normal = eigh3_smallest(cov)
    d = -jnp.sum(normal * mu, axis=-1)
    # orient normals toward the camera (n·p < 0 for p in front): flip so d>0
    flip = d < 0
    normal = jnp.where(flip[:, None], -normal, normal)
    d = jnp.where(flip, -d, d)
    return normal, d, jnp.maximum(mse, 0.0), mu


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def segment_planes(depth: jax.Array, *, cam: CameraConfig,
                   cfg: PlaneConfig) -> FramePlanes:
    H, W = depth.shape
    win = cfg.window
    cloud = backproject_depth(depth, cam)
    valid = (depth > 0.1) & (depth < 10.0)

    n, s, pp, gh, gw = _window_moments(cloud, valid[..., None], win)
    normal, d, mse, mu = _fit_from_moments(n, s, pp)
    depth_w = jnp.maximum(mu[:, 2], 0.3)
    # depth-adaptive planarity gate (stereo noise grows ~ z^2)
    mse_ok = mse < cfg.mse_max * depth_w * depth_w
    planar = (n >= int(0.8 * win * win)) & mse_ok
    G = gh * gw

    # ---- connected components over compatible neighbors ----------------
    def compatible(i_lbl, j_off):
        """For each window, whether it may merge with the neighbor at grid
        offset j_off (pairwise normal + point-to-plane gates)."""
        nrm = normal.reshape(gh, gw, 3)
        dd = d.reshape(gh, gw)
        muv = mu.reshape(gh, gw, 3)
        pl = planar.reshape(gh, gw)
        dy, dx = j_off
        nrm2 = jnp.roll(nrm, (-dy, -dx), axis=(0, 1))
        mu2 = jnp.roll(muv, (-dy, -dx), axis=(0, 1))
        pl2 = jnp.roll(pl, (-dy, -dx), axis=(0, 1))
        # border wrap -> invalid
        ys = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
        inb = ((ys + dy >= 0) & (ys + dy < gh) & (xs + dx >= 0)
               & (xs + dx < gw))
        ang = jnp.sum(nrm * nrm2, axis=-1) > cfg.merge_normal_dot
        dist = jnp.abs(jnp.sum(nrm * (mu2 - muv), axis=-1)) < cfg.merge_dist
        return (pl & pl2 & inb & ang & dist).reshape(G)

    offs = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    comp = jnp.stack([compatible(None, o) for o in offs])      # [4, G]
    nbr_idx = jnp.stack([
        (jnp.arange(G) + dx + dy * gw) for dy, dx in offs])     # [4, G]
    nbr_idx = jnp.clip(nbr_idx, 0, G - 1)

    labels0 = jnp.where(planar, jnp.arange(G, dtype=jnp.int32), G)

    def sweep(lbl, _):
        nb = lbl[nbr_idx]                                      # [4, G]
        nb = jnp.where(comp, nb, G)
        lbl = jnp.minimum(lbl, jnp.min(nb, axis=0))
        # pointer jumping x2 (labels index windows, G = invalid sink)
        ext = jnp.concatenate([lbl, jnp.int32(G)[None]])
        lbl = ext[jnp.clip(lbl, 0, G)]
        ext = jnp.concatenate([lbl, jnp.int32(G)[None]])
        lbl = ext[jnp.clip(lbl, 0, G)]
        lbl = jnp.where(planar, lbl, G)
        return lbl, None

    labels, _ = jax.lax.scan(sweep, labels0, None, length=cfg.n_merge_sweeps)

    # ---- per-component refit -------------------------------------------
    seg_n = jnp.zeros((G + 1,), jnp.float32).at[labels].add(
        n.astype(jnp.float32))[:G]
    seg_s = jnp.zeros((G + 1, 3), jnp.float32).at[labels].add(s)[:G]
    seg_pp = jnp.zeros((G + 1, 3, 3), jnp.float32).at[labels].add(pp)[:G]
    seg_normal, seg_d, seg_mse, seg_mu = _fit_from_moments(
        seg_n.astype(jnp.int32), seg_s, seg_pp)
    ok = seg_n >= cfg.min_support_px

    # top-k components by support
    Pk = cfg.max_planes_per_frame
    score = jnp.where(ok, seg_n, 0.0)
    top_val, top_idx = jax.lax.top_k(score, Pk)
    p_valid = top_val > 0.0
    p_coeff = jnp.concatenate([seg_normal[top_idx],
                               seg_d[top_idx][:, None]], axis=-1)
    p_count = seg_n[top_idx].astype(jnp.int32)

    # ---- pixel refinement + boundary sampling ---------------------------
    # strided sample grid (every `stride` px) stands in for the reference's
    # 5 cm voxel filter
    stride = 8
    sub = cloud[::stride, ::stride]                            # [h, w, 3]
    sub_ok = valid[::stride, ::stride]
    h2, w2, _ = sub.shape
    pts = sub.reshape(-1, 3)
    pts_ok = sub_ok.reshape(-1)
    # distance of each sample to each plane
    dist = jnp.abs(pts @ p_coeff[:, :3].T + p_coeff[None, :, 3])  # [S, Pk]
    close = (dist < 0.03) & pts_ok[:, None] & p_valid[None, :]
    B = cfg.max_boundary_points
    # pick up to B supporting samples per plane (by smallest distance);
    # approx_max_k uses the TPU-native approximate selection (exact order
    # is irrelevant for boundary sampling)
    sel_score = jnp.where(close, -dist, -1e9)                  # [S, Pk]
    top_b, idx_b = jax.lax.approx_max_k(sel_score.T, B)        # [Pk, B]
    b_valid = top_b > -1e8
    boundary = pts[idx_b]                                      # [Pk, B, 3]

    return FramePlanes(coeffs=p_coeff, n_inliers=p_count,
                       valid=p_valid & (p_count > 0),
                       boundary=boundary, boundary_valid=b_valid)
