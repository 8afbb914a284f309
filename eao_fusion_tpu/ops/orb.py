"""Oriented BRIEF descriptors: intensity-centroid orientation + rotated
binary tests, batched over keypoints.

TPU re-design of `src/ORBextractor.cc` (IC_Angle at :77, computeOrbDescriptor
at :108): per-keypoint 41x41 patches are extracted with one dynamic-slice
each (vmap -> batched gather), orientation is a masked moment reduction over
the patch, and the 256 binary tests gather from inside the patch after
rotating the sampling pattern by the keypoint angle.

The sampling pattern is NOT OpenCV's learned `bit_pattern_31_`: descriptors
here only ever match against descriptors produced by this module (the
vocabulary is trained in-repo too), so we use the ORB paper's generative
recipe — test point pairs drawn i.i.d. from N(0, (patch/5)^2), seeded and
frozen at import time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH_HALF = 22          # rotated test points (±13·√2≈±19) + blur support ±3
PATCH = 2 * PATCH_HALF + 1
ORI_RADIUS = 15          # intensity-centroid circle radius (ORB HALF_PATCH_SIZE)
N_BITS = 256
BORDER = PATCH_HALF + 1  # detection border margin per level


def _make_pattern(seed: int = 42) -> np.ndarray:
    """[256, 4] int32 rows (y1, x1, y2, x2), sigma = 31/5 as in the ORB paper."""
    r = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = r.normal(0.0, sigma, size=(N_BITS, 4))
    return np.clip(np.round(pts), -13, 13).astype(np.int32)


PATTERN = _make_pattern()  # frozen at import

_yy, _xx = np.meshgrid(np.arange(PATCH) - PATCH_HALF,
                       np.arange(PATCH) - PATCH_HALF, indexing="ij")
_ORI_MASK = ((_yy ** 2 + _xx ** 2) <= ORI_RADIUS ** 2).astype(np.float32)
_ORI_X = (_xx * _ORI_MASK).astype(np.float32)
_ORI_Y = (_yy * _ORI_MASK).astype(np.float32)


def extract_patches(img: jax.Array, yx: jax.Array) -> jax.Array:
    """Batched [N, PATCH, PATCH] patches centered at integer yx [N, 2].
    Centers must be >= BORDER from the image edge (detection guarantees it;
    dynamic_slice clamps otherwise)."""
    def one(c):
        return jax.lax.dynamic_slice(
            img, (c[0] - PATCH_HALF, c[1] - PATCH_HALF), (PATCH, PATCH))
    return jax.vmap(one)(yx)


def extract_patches_pyramid(flat_pyr: jax.Array, level_offset: jax.Array,
                            level_width: jax.Array, level_height: jax.Array,
                            yx: jax.Array, level: jax.Array) -> jax.Array:
    """Patches for keypoints spread over pyramid levels, via ONE gather
    from the flattened pyramid buffer (all levels concatenated row-major).

    flat_pyr: [sum(H_l*W_l)]; level_* are per-level constants [L];
    yx [N, 2] integer level coords; level [N]. Returns [N, PATCH, PATCH]."""
    off = level_offset[level]                       # [N]
    W = level_width[level]
    H = level_height[level]
    yc = jnp.clip(yx[:, 0], PATCH_HALF, H - PATCH_HALF - 1)
    xc = jnp.clip(yx[:, 1], PATCH_HALF, W - PATCH_HALF - 1)
    dy = jnp.arange(-PATCH_HALF, PATCH_HALF + 1)
    dx = jnp.arange(-PATCH_HALF, PATCH_HALF + 1)
    idx = (off[:, None, None]
           + (yc[:, None, None] + dy[None, :, None]) * W[:, None, None]
           + (xc[:, None, None] + dx[None, None, :]))
    return flat_pyr[idx.reshape(-1)].reshape(-1, PATCH, PATCH)


def blur_patches(patches: jax.Array, sigma: float = 2.0,
                 radius: int = 3) -> jax.Array:
    """Separable Gaussian blur applied to the patch batch directly (the
    reference blurs whole pyramid levels before description,
    `src/ORBextractor.cc:1084`; blurring only the patches is equivalent for
    descriptor samples, which stay `radius` inside the patch border)."""
    from eao_fusion_tpu.ops.image import gaussian_kernel1d
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    x = patches[:, None]                            # NCHW
    x = jax.lax.conv_general_dilated(
        x, k[None, None, :, None], (1, 1),
        [(radius, radius), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, k[None, None, None, :], (1, 1),
        [(0, 0), (radius, radius)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[:, 0]


@jax.jit
def orientations(patches: jax.Array) -> jax.Array:
    """IC_Angle: atan2 of intensity centroid moments over the circular patch.
    patches: [N, PATCH, PATCH] -> angles [N] in radians."""
    m10 = jnp.einsum("nhw,hw->n", patches, jnp.asarray(_ORI_X))
    m01 = jnp.einsum("nhw,hw->n", patches, jnp.asarray(_ORI_Y))
    return jnp.arctan2(m01, m10)


@jax.jit
def descriptors_from_patches(patches: jax.Array, angles: jax.Array
                             ) -> Tuple[jax.Array, jax.Array]:
    """Steered BRIEF from blurred patches.

    Returns (bits_packed [N, 8] uint32, pm1 [N, 256] int8 with values ±1).
    The ±1 form feeds MXU matmul Hamming scoring (ops/hamming.py)."""
    pat = jnp.asarray(PATTERN, jnp.float32)        # [256, 4] (y1 x1 y2 x2)
    ca, sa = jnp.cos(angles), jnp.sin(angles)      # [N]
    # rotate test points: (x', y') = (x ca - y sa, x sa + y ca)
    y1, x1, y2, x2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(y, x):
        ry = jnp.round(sa[:, None] * x[None] + ca[:, None] * y[None])
        rx = jnp.round(ca[:, None] * x[None] - sa[:, None] * y[None])
        iy = jnp.clip(ry + PATCH_HALF, 0, PATCH - 1).astype(jnp.int32)
        ix = jnp.clip(rx + PATCH_HALF, 0, PATCH - 1).astype(jnp.int32)
        return iy * PATCH + ix                     # [N, 256] flat patch index

    flat = patches.reshape(patches.shape[0], -1)   # [N, PATCH*PATCH]
    i1 = rot(y1, x1)
    i2 = rot(y2, x2)
    v1 = jnp.take_along_axis(flat, i1, axis=1)
    v2 = jnp.take_along_axis(flat, i2, axis=1)
    bits = (v1 < v2)                               # [N, 256] bool

    # pack to 8 x uint32 (little-endian within each word)
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    packed = jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)
    pm1 = jnp.where(bits, jnp.int8(1), jnp.int8(-1))
    return packed, pm1
