"""ORB feature extractor: pyramid -> FAST -> orientation -> steered BRIEF.

TPU re-design of `src/ORBextractor.cc` operator() (:1043-1105): all levels
are processed with static shapes fixed by the config; per-level keypoint
budgets follow the reference's geometric allocation
(`src/ORBextractor.cc:208-222`); selection is per-cell + global top-k
instead of the quadtree (see ops/fast.py); descriptors use our own frozen
pattern (see ops/orb.py).

The public entry `extract_features(img, depth)` is pure and jittable; RGBD
depth lookup reproduces `Frame::ComputeStereoFromRGBD` (`src/Frame.cc:1016`):
depth at the keypoint pixel, virtual right coord uR = u - bf/z.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import CameraConfig, ORBConfig
from eao_fusion_tpu.ops import fast as fast_ops
from eao_fusion_tpu.ops import image as image_ops
from eao_fusion_tpu.ops import orb as orb_ops
from eao_fusion_tpu.types import FrameFeatures


def features_per_level(cfg: ORBConfig, total: Optional[int] = None) -> List[int]:
    """Geometric keypoint budget per level (most at level 0), summing to
    `total` (defaults to max_keypoints so the output arrays are full)."""
    total = total or cfg.max_keypoints
    inv = 1.0 / cfg.scale_factor
    raw = np.array([inv ** l for l in range(cfg.n_levels)])
    alloc = np.floor(total * raw / raw.sum()).astype(int)
    alloc[0] += total - alloc.sum()
    return [int(a) for a in alloc]


def extract_from_pyramid(pyramid: List[jax.Array], *,
                         orb_cfg: ORBConfig) -> FrameFeatures:
    """Detection + orientation + description over a prebuilt pyramid.
    Returns FrameFeatures with the depth channel unset (depth=0,
    uright=-1). Keypoint slots are laid out level-major with the static
    per-level budgets of `features_per_level` — the stereo matcher
    (frontend/stereo.py) relies on that layout for per-octave correlation
    windows."""
    budgets = features_per_level(orb_cfg)

    # phase 1 — per-level detection (static shapes per level)
    uv_all, resp_all, lvl_all, yx_all, img_all = [], [], [], [], []
    for l, (level_img, budget) in enumerate(zip(pyramid, budgets)):
        if budget == 0:
            continue
        img_all.append(level_img)
        scale = orb_cfg.scale_factor ** l
        cell = max(int(round(orb_cfg.cell_size / scale)), 8)
        # FAST thresholds are specified in 0-255 intensity units (reference
        # yaml); images here are [0,1].
        yx, score = fast_ops.detect_level(
            level_img, float(orb_cfg.ini_th_fast) / 255.0,
            float(orb_cfg.min_th_fast) / 255.0,
            cell=cell, top_per_cell=3, n_out=budget, border=orb_ops.BORDER)
        uv0 = jnp.stack([yx[:, 1].astype(jnp.float32) * scale,
                         yx[:, 0].astype(jnp.float32) * scale], axis=-1)
        uv_all.append(uv0)
        resp_all.append(score)
        lvl_all.append(jnp.full((budget,), l, jnp.int32))
        yx_all.append(yx)

    uv = jnp.concatenate(uv_all)
    response = jnp.concatenate(resp_all)
    level = jnp.concatenate(lvl_all)
    valid = response > 0.0

    # phase 2 — batched orientation + description for ALL keypoints at
    # once. Patch extraction stays per level as vmapped dynamic_slice
    # (lowers to a slice-gather, which the TPU DMA engines handle ~15x
    # faster than an arbitrary element gather from a flattened pyramid);
    # everything downstream runs on the concatenated [N, PATCH, PATCH]
    # batch in single passes.
    patches = jnp.concatenate([
        orb_ops.extract_patches(img, yx)
        for img, yx in zip(img_all, yx_all)])
    angle = orb_ops.orientations(patches)
    blurred = orb_ops.blur_patches(patches, orb_cfg.blur_sigma, 3)
    desc_packed, desc_pm1 = orb_ops.descriptors_from_patches(blurred, angle)

    n = uv.shape[0]
    pm1 = jnp.where(valid[:, None], desc_pm1, jnp.int8(0))
    return FrameFeatures(uv=uv, response=response, level=level, angle=angle,
                         desc_packed=desc_packed, desc_pm1=pm1, valid=valid,
                         depth=jnp.zeros((n,), jnp.float32),
                         uright=jnp.full((n,), -1.0, jnp.float32))


@functools.partial(jax.jit, static_argnames=("orb_cfg", "cam_cfg", "with_depth"))
def extract_features(img: jax.Array,
                     depth: Optional[jax.Array] = None,
                     *,
                     orb_cfg: ORBConfig,
                     cam_cfg: CameraConfig,
                     with_depth: bool = True) -> FrameFeatures:
    """img: [H, W] float32 grayscale in [0,1]. depth: [H, W] float32 meters
    (0 = invalid) or None for monocular."""
    pyramid = image_ops.build_pyramid(img, orb_cfg.n_levels,
                                      orb_cfg.scale_factor)
    feats = extract_from_pyramid(pyramid, orb_cfg=orb_cfg)
    uv, valid = feats.uv, feats.valid
    n = uv.shape[0]
    if with_depth and depth is not None:
        h, w = depth.shape
        ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
        d = depth[vi, ui]
        has_d = (d > 0.0) & valid
        d = jnp.where(has_d, d, 0.0)
        uright = jnp.where(has_d, uv[:, 0] - cam_cfg.bf / jnp.maximum(d, 1e-6),
                           -1.0)
    else:
        return feats
    return feats._replace(depth=d, uright=uright)


def scale_factors(cfg: ORBConfig) -> np.ndarray:
    return np.array([cfg.scale_factor ** l for l in range(cfg.n_levels)],
                    np.float32)
