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
    x, y, z = backproject_depth_channels(depth, cam)
    return jnp.stack([x, y, z], axis=-1)


def backproject_depth_channels(depth: jax.Array, cam: CameraConfig):
    """[H, W] depth -> three [H, W] channel images (x, y, z).

    Kept channel-separate on purpose: a [H, W, 3] cloud puts 3 in the TPU
    lane dimension, which pads to the full 128-lane tile — ~40x wasted
    HBM traffic on every elementwise pass (measured 2.4 ms for the window
    moments in that layout vs ~0.3 ms channel-planar)."""
    H, W = depth.shape
    us = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    vs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = (us - cam.cx) / cam.fx * depth
    y = (vs - cam.cy) / cam.fy * depth
    return x, y, depth


def _window_moments(x: jax.Array, y: jax.Array, z: jax.Array,
                    valid: jax.Array, win: int):
    """Per-window count, sum, and outer-product sums via per-channel 2D
    window reductions (layout-friendly: every reduction runs on a plain
    [H, W] image; the tiny [G, 3]/[G, 3, 3] assemblies happen at window
    granularity). Returns arrays with leading dim G = (H//win)*(W//win)."""
    H, W = x.shape
    gh, gw = H // win, W // win
    G = gh * gw
    Hc, Wc = gh * win, gw * win
    m = valid[:Hc, :Wc].astype(jnp.float32)
    xm = x[:Hc, :Wc] * m
    ym = y[:Hc, :Wc] * m
    zm = z[:Hc, :Wc] * m

    # All ten window sums as ONE pair of MXU matmuls with 0/1 block
    # indicators: wsum(a) = R a C, R [gh, Hc], C [Wc, gw]. The naive
    # reshape(gh, win, gw, win).sum((1, 3)) lowers to strided relayouts
    # (win=10 straddles the 8x128 tile) and measured 1.9 ms/frame; the
    # matmul form is ~400 MFLOP total — MXU noise.
    R = (jax.lax.broadcasted_iota(jnp.int32, (gh, Hc), 1) // win
         == jax.lax.broadcasted_iota(jnp.int32, (gh, Hc), 0)
         ).astype(jnp.float32)
    C = (jax.lax.broadcasted_iota(jnp.int32, (Wc, gw), 0) // win
         == jax.lax.broadcasted_iota(jnp.int32, (Wc, gw), 1)
         ).astype(jnp.float32)
    chans = jnp.stack([m, xm, ym, zm, xm * xm, ym * ym, zm * zm,
                       xm * ym, xm * zm, ym * zm])               # [10, Hc, Wc]
    # precision='float32' forces f32 OPERANDS (preferred_element_type only
    # sets the accumulator dtype): bf16 operand truncation (~0.2%) gets
    # amplified by the cov = pp/n - mu*mu^T cancellation into mse noise on
    # the order of the planarity gate itself. ~400 MFLOP, f32 cost is noise.
    w = jnp.einsum("hH,cHW,Wg->chg", R, chans, C,
                   precision="float32",
                   preferred_element_type=jnp.float32).reshape(10, G)
    n = w[0]
    s = jnp.stack([w[1], w[2], w[3]], axis=-1)                   # [G, 3]
    pp = jnp.stack([
        jnp.stack([w[4], w[7], w[8]], axis=-1),
        jnp.stack([w[7], w[5], w[9]], axis=-1),
        jnp.stack([w[8], w[9], w[6]], axis=-1)], axis=-2)        # [G, 3, 3]
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
    cx, cy, cz = backproject_depth_channels(depth, cam)
    valid = (depth > 0.1) & (depth < 10.0)

    n, s, pp, gh, gw = _window_moments(cx, cy, cz, valid, win)
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
    comp2d = jnp.stack([compatible(None, o) for o in offs]
                       ).reshape(4, gh, gw)

    labels0 = jnp.where(planar, jnp.arange(G, dtype=jnp.int32), G)
    iota_g = jnp.arange(G, dtype=jnp.int32)

    # Sweeps are gather-free: neighbor labels come from 2D rolls of the
    # (gh, gw) grid, and the two pointer jumps per sweep are one-hot MXU
    # matmuls. precision='float32' is REQUIRED for exactness: labels run up
    # to G (3072 at 640x480/win=10) and are only exactly representable for
    # int < 2^24 with f32 OPERANDS — at the TPU default bf16 operand
    # precision labels above 256 round to wrong window indices.
    def sweep(lbl, _):
        mn = lbl.reshape(gh, gw)
        for k, (dy, dx) in enumerate(offs):
            nb = jnp.roll(mn, (-dy, -dx), axis=(0, 1))
            mn = jnp.minimum(mn, jnp.where(comp2d[k], nb, G))
        lbl = mn.reshape(G)
        for _ in range(2):          # pointer jumping (G = invalid sink)
            oh = (lbl[:, None] == iota_g[None, :]).astype(jnp.float32)
            jumped = jnp.dot(oh, lbl.astype(jnp.float32),
                             precision="float32",
                             preferred_element_type=jnp.float32)
            lbl = jnp.where(lbl >= G, G, jumped.astype(jnp.int32))
        lbl = jnp.where(planar, lbl, G)
        return lbl, None

    labels, _ = jax.lax.scan(sweep, labels0, None, length=cfg.n_merge_sweeps)

    # ---- per-component refit (moment accumulation as ONE indicator
    # matmul instead of three scatters) -----------------------------------
    oh_lbl = (labels[:, None] == iota_g[None, :]).astype(jnp.float32)  # [G,G]
    mom = jnp.concatenate([n[:, None].astype(jnp.float32), s,
                           pp.reshape(G, 9)], axis=1)          # [G, 13]
    seg = jnp.dot(oh_lbl.T, mom, precision="float32",
                  preferred_element_type=jnp.float32)
    seg_n = seg[:, 0]
    seg_s = seg[:, 1:4]
    seg_pp = seg[:, 4:13].reshape(G, 3, 3)
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
    pts = jnp.stack([cx[::stride, ::stride].reshape(-1),
                     cy[::stride, ::stride].reshape(-1),
                     cz[::stride, ::stride].reshape(-1)], axis=-1)  # [S, 3]
    pts_ok = valid[::stride, ::stride].reshape(-1)
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
