"""TPU timing breakdown of extractor internals."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import fast as fast_ops
from eao_fusion_tpu.ops import image as image_ops
from eao_fusion_tpu.ops import orb as orb_ops

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=2, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
gray = jnp.asarray(seq.frames[0].gray)
depth = jnp.asarray(seq.frames[0].depth)
print("devices:", jax.devices(), file=sys.stderr)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:7.2f} ms")
    return out


o = cfg.orb
pyr_fn = jax.jit(lambda g: image_ops.build_pyramid(g, o.n_levels,
                                                   o.scale_factor))
pyr = timeit("pyramid (8 levels)", pyr_fn, gray)

blur_fn = jax.jit(lambda g: [image_ops.gaussian_blur(l, 2.0, 3)
                             for l in image_ops.build_pyramid(
                                 g, o.n_levels, o.scale_factor)])
timeit("pyramid + blur x8", blur_fn, gray)

budgets = extractor.features_per_level(o)


def detect_all(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    outs = []
    for l, (img, b) in enumerate(zip(pyr, budgets)):
        scale = o.scale_factor ** l
        cell = max(int(round(o.cell_size / scale)), 8)
        outs.append(fast_ops.detect_level(img, o.ini_th_fast / 255.0,
                                          o.min_th_fast / 255.0,
                                          cell=cell, top_per_cell=3,
                                          n_out=b, border=orb_ops.BORDER))
    return outs


det_fn = jax.jit(detect_all)
dets = timeit("pyramid + FAST/select x8", det_fn, gray)


def patches_all(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    outs = []
    for l, (img, b) in enumerate(zip(pyr, budgets)):
        scale = o.scale_factor ** l
        cell = max(int(round(o.cell_size / scale)), 8)
        yx, s = fast_ops.detect_level(img, o.ini_th_fast / 255.0,
                                      o.min_th_fast / 255.0, cell=cell,
                                      top_per_cell=3, n_out=b,
                                      border=orb_ops.BORDER)
        outs.append(orb_ops.extract_patches(img, yx))
    return outs


pat_fn = jax.jit(patches_all)
timeit("... + raw patches x8", pat_fn, gray)

full = jax.jit(lambda g, d: extractor.extract_features(
    g, d, orb_cfg=o, cam_cfg=cfg.camera))
timeit("full extract", full, gray, depth)
