"""Pyramid build: chained jax.image.resize vs exact banded-matmul resizes.

The 8-level pyramid costs ~0.57 ms/frame (NOTES_R3 extraction attribution)
— 8 small dependent resize kernels, mostly dispatch/latency. Since resize
is linear, each level is exactly R_l @ prev @ C_l for matrices read off by
passing identity through jax.image.resize once at trace time; two MXU
matmuls per level may beat the gather/conv lowering.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.ops import image as image_ops

N_LEVELS, SCALE = 8, 1.2


def _resize_mats(h, w, shapes):
    mats = []
    prev = (h, w)
    for (hl, wl) in shapes[1:]:
        R = np.asarray(jax.image.resize(np.eye(prev[0], dtype=np.float32),
                                        (hl, prev[0]), "bilinear"))
        C = np.asarray(jax.image.resize(np.eye(prev[1], dtype=np.float32),
                                        (wl, prev[1]), "bilinear"))
        mats.append((R, C))
        prev = (hl, wl)
    return mats


@jax.jit
def pyr_resize(img):
    return image_ops.build_pyramid(img, N_LEVELS, SCALE)


def make_matmul_pyr(h, w):
    shapes = image_ops.pyramid_shapes(h, w, N_LEVELS, SCALE)
    mats = [(jnp.asarray(R), jnp.asarray(C)) for R, C in _resize_mats(h, w, shapes)]

    @jax.jit
    def pyr(img):
        out = [img]
        with jax.default_matmul_precision("float32"):
            for R, C in mats:
                out.append(R @ out[-1] @ C.T)
        return out
    return pyr


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((480, 640)).astype(np.float32))

    a = pyr_resize(img)
    pyr_mm = make_matmul_pyr(480, 640)
    b = pyr_mm(img)
    for l, (x, y) in enumerate(zip(a, b)):
        err = float(jnp.abs(x - y).max())
        print(f"level {l}: shape {x.shape} max|diff| {err:.2e}")

    for name, fn in (("resize", pyr_resize), ("matmul", pyr_mm)):
        jax.block_until_ready(fn(img))
        t0 = time.perf_counter()
        reps = 100
        for _ in range(reps):
            out = fn(img)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms")


if __name__ == "__main__":
    main()
