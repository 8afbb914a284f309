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


def _blur_band_matrix(sigma: float, radius: int) -> np.ndarray:
    """[PATCH, PATCH] banded Gaussian matrix B with B@x = 1-D blur of x."""
    from eao_fusion_tpu.ops.image import gaussian_kernel1d
    k = gaussian_kernel1d(sigma, radius)
    B = np.zeros((PATCH, PATCH), np.float32)
    for i in range(PATCH):
        for j, w in enumerate(k):
            c = i + j - radius
            if 0 <= c < PATCH:
                B[i, c] += w
    return B


_BLUR_B = _blur_band_matrix(2.0, 3)


def blur_patches(patches: jax.Array, sigma: float = 2.0,
                 radius: int = 3) -> jax.Array:
    """Separable Gaussian blur applied to the patch batch directly (the
    reference blurs whole pyramid levels before description,
    `src/ORBextractor.cc:1084`; blurring only the patches is equivalent for
    descriptor samples, which stay `radius` inside the patch border).

    Implemented as two banded-matrix matmuls — rides the MXU instead of
    tiny single-channel convolutions."""
    B = jnp.asarray(_BLUR_B if (sigma, radius) == (2.0, 3)
                    else _blur_band_matrix(sigma, radius))
    y = jnp.einsum("ij,njk->nik", B, patches)
    return jnp.einsum("nik,lk->nil", y, B)


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
    ys = jnp.concatenate([y1, y2])
    xs = jnp.concatenate([x1, x2])
    iy = jnp.clip(jnp.round(sa[:, None] * xs[None] + ca[:, None] * ys[None])
                  + PATCH_HALF, 0, PATCH - 1).astype(jnp.int32)   # [N, 512]
    ix = jnp.clip(jnp.round(ca[:, None] * xs[None] - sa[:, None] * ys[None])
                  + PATCH_HALF, 0, PATCH - 1).astype(jnp.int32)

    # per-point sampling WITHOUT an arbitrary gather (slow on TPU): select
    # the row by a one-hot batched matmul on the MXU, then the column by a
    # masked reduction.
    grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, PATCH), 2)
    oh_y = (iy[:, :, None] == grid).astype(patches.dtype)      # [N, 512, P]
    rows = jnp.einsum("nky,nyx->nkx", oh_y, patches)           # [N, 512, P]
    oh_x = (ix[:, :, None] == grid).astype(patches.dtype)
    vals = jnp.sum(rows * oh_x, axis=-1)                       # [N, 512]
    v1, v2 = vals[:, :N_BITS], vals[:, N_BITS:]
    bits = (v1 < v2)                               # [N, 256] bool

    # pack to 8 x uint32 (little-endian within each word)
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    packed = jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)
    pm1 = jnp.where(bits, jnp.int8(1), jnp.int8(-1))
    return packed, pm1
