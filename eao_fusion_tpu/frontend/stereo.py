"""Stereo lane: left/right ORB extraction + epipolar stereo matching.

TPU re-design of `Frame::ComputeStereoMatches` (`src/Frame.cc:841-1014`,
the path behind `System::TrackStereo` `src/System.cc:196`): instead of a
per-row candidate table walked keypoint-by-keypoint, the coarse match is ONE
masked [N, N] Hamming matrix on the MXU (row band, octave band, disparity
range and validity as a boolean mask), and the subpixel refinement runs the
reference's 11x11 sliding-window SAD correlation for ALL keypoints at once —
batched dynamic-slice windows from the pyramid at each left keypoint's
octave (the level-major slot layout of `extract_from_pyramid` makes the
per-octave grouping static).

Semantics kept from the reference:
  - candidate gates: |vR - vL| <= 2*scale(octave_R), octave within ±1,
    uR in [uL - maxD, uL + 3] with maxD = bf/baseline (`src/Frame.cc:867-911`)
  - best Hamming < TH_HIGH, then center-pixel-subtracted L1 correlation over
    incR in [-5, 5] at the left keypoint's octave (`src/Frame.cc:925-966`)
  - parabola subpixel (reject |deltaR| > 1 and window-edge minima)
    (`src/Frame.cc:971-981`)
  - disparity in [0, maxD) with the 0.01 clamp, depth = bf/disparity
    (`src/Frame.cc:986-999`)
  - median SAD outlier rejection at 1.5 * 1.4 * median (`src/Frame.cc:1003`)
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import CameraConfig, ORBConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.ops import hamming
from eao_fusion_tpu.ops import image as image_ops
from eao_fusion_tpu.types import FrameFeatures

_W = 5     # correlation half-window (11x11 patch), `src/Frame.cc:936`
_L = 5     # incR search radius, `src/Frame.cc:942`
TH_HIGH = 100


def _correlate_level(pyr_l: jax.Array, pyr_r: jax.Array,
                     su: jax.Array, sv: jax.Array, sur: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sliding-window SAD for one octave. su/sv/sur are integer pixel
    coords in THIS level's images. Returns (best_inc float32 incl. subpixel
    delta, best_sad, ok)."""
    rows, cols = pyr_r.shape
    side = 2 * _W + 1

    def win_l(args):
        v, u = args
        return jax.lax.dynamic_slice(pyr_l, (v - _W, u - _W), (side, side))

    def strip_r(args):
        v, u0 = args
        return jax.lax.dynamic_slice(pyr_r, (v - _W, u0 - _L - _W),
                                     (side, side + 2 * _L))

    il = jax.vmap(win_l)((sv, su))                         # [B, 11, 11]
    ir = jax.vmap(strip_r)((sv, sur))                      # [B, 11, 21]
    ilc = il - il[:, _W, _W][:, None, None]
    # 11 shifted windows, each centered by ITS center pixel
    # (`src/Frame.cc:949-952`)
    dists = []
    for o in range(2 * _L + 1):
        win = ir[:, :, o:o + side]
        winc = win - ir[:, _W, o + _W][:, None, None]
        dists.append(jnp.abs(ilc - winc).sum(axis=(1, 2)))
    d = jnp.stack(dists, axis=1)                           # [B, 11]
    bi = jnp.argmin(d, axis=1)
    at = lambda idx: jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    d1, d2, d3 = at(jnp.maximum(bi - 1, 0)), at(bi), at(jnp.minimum(bi + 1, 2 * _L))
    denom = d1 + d3 - 2.0 * d2
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      (d1 - d3) / (2.0 * jnp.maximum(denom, 1e-9)), 0.0)
    ok = ((bi > 0) & (bi < 2 * _L)                       # not at window edge
          # flat correlation valley (denom ~ 0) -> deltaR is infinite in the
          # reference and rejected by its |deltaR|>1 gate (src/Frame.cc:974);
          # reject instead of substituting delta=0
          & (denom > 1e-9)
          & (jnp.abs(delta) <= 1.0)
          # in-bounds (reference iniu/endu check + slice validity)
          & (sv - _W >= 0) & (sv + _W < rows)
          & (su - _W >= 0) & (su + _W < pyr_l.shape[1])
          & (sur - _L - _W >= 0) & (sur + _L + _W < cols))
    return (bi - _L).astype(jnp.float32) + delta, d2, ok


def stereo_match(feats_l: FrameFeatures, feats_r: FrameFeatures,
                 pyr_l: List[jax.Array], pyr_r: List[jax.Array], *,
                 orb_cfg: ORBConfig, cam_cfg: CameraConfig
                 ) -> Tuple[jax.Array, jax.Array]:
    """Left->right stereo match. Returns (depth [N], uright [N]) for the
    left features (-1 / 0 where unmatched)."""
    sf = extractor.scale_factors(orb_cfg)
    max_d = cam_cfg.bf / cam_cfg.baseline        # = fx (`src/Frame.cc:870`)

    # ---- coarse match: one masked Hamming matrix -----------------------
    dist = hamming.hamming_matrix(feats_l.desc_pm1, feats_r.desc_pm1)
    band = 2.0 * jnp.asarray(sf)[feats_r.level] + 0.5      # row radius
    dv = jnp.abs(feats_l.uv[:, 1][:, None] - feats_r.uv[:, 1][None, :])
    dl = jnp.abs(feats_l.level[:, None] - feats_r.level[None, :])
    ur = feats_r.uv[:, 0][None, :]
    ul = feats_l.uv[:, 0][:, None]
    feas = ((dv <= band[None, :]) & (dl <= 1)
            & (ur >= ul - max_d) & (ur <= ul + 3.0)
            & feats_l.valid[:, None] & feats_r.valid[None, :])
    dist = jnp.where(feas, dist, hamming.N_BITS)
    best_r = jnp.argmin(dist, axis=1)
    best_d = jnp.min(dist, axis=1)
    matched = best_d < TH_HIGH

    # ---- subpixel correlation at each left keypoint's octave -----------
    # slots are level-major with static budgets: process per octave with
    # static slices (no data-dependent level indexing into the pyramid)
    budgets = extractor.features_per_level(orb_cfg)
    u_r0 = feats_r.uv[best_r, 0]                           # [N]
    inc_parts, sad_parts, ok_parts = [], [], []
    off = 0
    for l, b in enumerate(budgets):
        if b == 0:
            continue
        inv = 1.0 / sf[l]
        sl = slice(off, off + b)
        su = jnp.round(feats_l.uv[sl, 0] * inv).astype(jnp.int32)
        sv = jnp.round(feats_l.uv[sl, 1] * inv).astype(jnp.int32)
        sur = jnp.round(u_r0[sl] * inv).astype(jnp.int32)
        inc, sad, ok = _correlate_level(pyr_l[l], pyr_r[l], su, sv, sur)
        inc_parts.append(sf[l] * (sur.astype(jnp.float32) + inc))
        sad_parts.append(sad)
        ok_parts.append(ok)
        off += b
    best_ur = jnp.concatenate(inc_parts)                   # level-0 coords
    sad = jnp.concatenate(sad_parts)
    ok = jnp.concatenate(ok_parts) & matched

    disparity = feats_l.uv[:, 0] - best_ur
    ok = ok & (disparity >= 0.0) & (disparity < max_d)
    disparity = jnp.maximum(disparity, 0.01)               # `src/Frame.cc:991`

    # ---- median SAD rejection (`src/Frame.cc:1002-1014`) ----------------
    n_ok = jnp.sum(ok)
    sorted_sad = jnp.sort(jnp.where(ok, sad, jnp.inf))
    median = sorted_sad[jnp.clip(n_ok // 2, 0, sad.shape[0] - 1)]
    ok = ok & (sad < 1.5 * 1.4 * median)

    depth = jnp.where(ok, cam_cfg.bf / disparity, 0.0)
    uright = jnp.where(ok, feats_l.uv[:, 0] - disparity, -1.0)
    return depth, uright


@functools.partial(jax.jit, static_argnames=("orb_cfg", "cam_cfg"))
def extract_stereo_features(left: jax.Array, right: jax.Array, *,
                            orb_cfg: ORBConfig,
                            cam_cfg: CameraConfig) -> FrameFeatures:
    """Full stereo front end: extract ORB on both rectified images (the
    reference forks two extraction threads, `src/Frame.cc:113-114`; here
    the two pyramids batch through the same kernels) and fill the left
    features' depth/uright channels by epipolar matching."""
    pyr_l = image_ops.build_pyramid(left, orb_cfg.n_levels,
                                    orb_cfg.scale_factor)
    pyr_r = image_ops.build_pyramid(right, orb_cfg.n_levels,
                                    orb_cfg.scale_factor)
    feats_l = extractor.extract_from_pyramid(pyr_l, orb_cfg=orb_cfg)
    feats_r = extractor.extract_from_pyramid(pyr_r, orb_cfg=orb_cfg)
    depth, uright = stereo_match(feats_l, feats_r, pyr_l, pyr_r,
                                 orb_cfg=orb_cfg, cam_cfg=cam_cfg)
    return feats_l._replace(depth=depth, uright=uright)
