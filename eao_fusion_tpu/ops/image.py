"""Image ops: grayscale, separable Gaussian blur, pyramid construction.

TPU notes: the pyramid is built with static per-level shapes computed at
trace time from the config (reference: 8 levels x1.2,
`src/ORBextractor.cc:1107` ComputePyramid). Resize is bilinear like the
reference's cv::resize(INTER_LINEAR). Blur matches the 7x7 sigma-2
GaussianBlur applied before descriptor sampling (`src/ORBextractor.cc:1084`).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """[H,W,3] (float or uint8) -> [H,W] float32 in [0,1]."""
    x = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        x = x / 255.0
    return x @ jnp.array([0.299, 0.587, 0.114], jnp.float32)


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur with edge replication. img: [H, W] f32."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    x = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    # vertical pass: conv along axis 0
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    x = jnp.pad(x, ((0, 0), (radius, radius)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    return x


def pyramid_shapes(height: int, width: int, n_levels: int,
                   scale_factor: float) -> List[Tuple[int, int]]:
    # clamp: levels must stay larger than the descriptor patch (41 px)
    return [(max(int(round(height / scale_factor ** l)), 48),
             max(int(round(width / scale_factor ** l)), 48))
            for l in range(n_levels)]


def build_pyramid(img: jax.Array, n_levels: int, scale_factor: float
                  ) -> List[jax.Array]:
    """List of [H_l, W_l] images, level 0 = input. Static shapes per level."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    out = [img]
    for l in range(1, n_levels):
        # resize from the previous level (cascaded, like cv::resize chain)
        out.append(jax.image.resize(out[-1], shapes[l], method="bilinear"))
    return out
