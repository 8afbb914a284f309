"""FAST-9/16 corner detection, fully vectorized for the TPU VPU.

Re-design of the reference's per-cell scalar FAST with threshold fallback
(`src/ORBextractor.cc:765` ComputeKeyPointsOctTree) as whole-image masked
tensor ops: the segment test over all 16 arc starts is a static 16x9 AND
reduction over shifted copies of the image; the corner score is the exact
"max threshold that still passes" formulation (max over arcs of the min arc
margin); NMS is a 3x3 max-pool compare.

The reference's quadtree redistribution (`DistributeOctTree`,
`src/ORBextractor.cc:539`) is replaced by a shape-static per-cell top-k +
global top-k selection (SURVEY.md §2.3 item 1) which yields the same
spatial-spread behavior with deterministic shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, OpenCV's FAST-16 ordering, as (dy, dx).
CIRCLE_OFFSETS = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)

ARC_LEN = 9  # FAST-9: need 9 contiguous circle pixels all brighter/darker


def _shifted_stack(img: jax.Array) -> jax.Array:
    """[16, H, W] stack of the circle-neighbor images (edge-padded)."""
    p = 3
    padded = jnp.pad(img, p, mode="edge")
    h, w = img.shape
    return jnp.stack(
        [jax.lax.dynamic_slice(padded, (p + int(dy), p + int(dx)), (h, w))
         for dy, dx in CIRCLE_OFFSETS], axis=0)


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score(img: jax.Array, threshold: float) -> jax.Array:
    """FAST-9 corner score map [H, W] f32; 0 where not a corner.

    Score is the exact FAST definition: the largest t' >= threshold for which
    the segment test still passes = max over 16 arc starts of the minimum
    margin within the 9-arc (bright margins circle-center, dark center-circle).
    """
    c = _shifted_stack(img)          # [16, H, W]
    center = img[None]
    bright = c - center              # margin for "brighter" test
    dark = center - c                # margin for "darker" test

    # wrap-around: duplicate the first ARC_LEN-1 entries
    def arc_best(margin):
        m2 = jnp.concatenate([margin, margin[:ARC_LEN - 1]], axis=0)
        # sliding min over windows of 9: tree-reduce the static unroll
        best = jnp.full(img.shape, -jnp.inf, img.dtype)
        for s in range(16):
            arc_min = m2[s]
            for k in range(1, ARC_LEN):
                arc_min = jnp.minimum(arc_min, m2[s + k])
            best = jnp.maximum(best, arc_min)
        return best

    score = jnp.maximum(arc_best(bright), arc_best(dark))
    return jnp.where(score >= threshold, score, 0.0)


@jax.jit
def nms3x3(score: jax.Array) -> jax.Array:
    """Keep strict local maxima of a 3x3 neighborhood (ties broken by
    keeping the first in raster order via epsilon on shifted copies)."""
    m = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max,
                              (3, 3), (1, 1), "SAME")
    return jnp.where((score >= m) & (score > 0.0), score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("cell", "top_per_cell", "n_out", "border"))
def select_keypoints(score: jax.Array, cell: int, top_per_cell: int,
                     n_out: int, border: int) -> Tuple[jax.Array, jax.Array]:
    """Spatially-distributed top-k selection.

    Partition the score map into `cell`-px tiles, take `top_per_cell` best
    responses per tile, then the global best `n_out` of those candidates.
    Returns (yx [n_out, 2] int32, score [n_out] f32); empty slots score 0.
    """
    h, w = score.shape
    # border + validity mask
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = ((ys >= border) & (ys < h - border) &
          (xs >= border) & (xs < w - border))
    s = jnp.where(ok, score, 0.0)

    gh, gw = h // cell, w // cell
    tiles = s[:gh * cell, :gw * cell].reshape(gh, cell, gw, cell)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    vals, idx = jax.lax.top_k(tiles, top_per_cell)      # [G, top]
    # tile-local -> global coords
    gy = (jax.lax.broadcasted_iota(jnp.int32, (gh * gw, top_per_cell), 0)
          // gw) * cell
    gx = (jax.lax.broadcasted_iota(jnp.int32, (gh * gw, top_per_cell), 0)
          % gw) * cell
    yy = gy + idx // cell
    xx = gx + idx % cell
    vals = vals.reshape(-1)
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)
    k = min(n_out, vals.shape[0])
    best, bi = jax.lax.top_k(vals, k)
    out_y = yy[bi]
    out_x = xx[bi]
    if k < n_out:
        pad = n_out - k
        best = jnp.concatenate([best, jnp.zeros(pad, best.dtype)])
        out_y = jnp.concatenate([out_y, jnp.zeros(pad, jnp.int32)])
        out_x = jnp.concatenate([out_x, jnp.zeros(pad, jnp.int32)])
    return jnp.stack([out_y, out_x], axis=-1), best


def detect_level(img: jax.Array, ini_th: float, min_th: float, cell: int,
                 top_per_cell: int, n_out: int, border: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Detect on one pyramid level with threshold fallback semantics:
    score with the low threshold, but bias scores above the high threshold so
    strong corners always win cell slots (matching the reference's 20->7
    retry, `src/ORBextractor.cc:800-830`, without a second pass)."""
    s_low = fast_score(img, float(min_th))
    s = nms3x3(s_low)
    # corners that pass the strict threshold outrank all fallback corners
    s = jnp.where(s >= ini_th, s + 1000.0, s)
    return select_keypoints(s, cell, top_per_cell, n_out, border)
