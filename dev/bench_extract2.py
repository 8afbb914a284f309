"""Scan-based timing of extractor stages on TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import fast as fast_ops
from eao_fusion_tpu.ops import image as image_ops
from eao_fusion_tpu.ops import orb as orb_ops

cfg = SystemConfig()
o = cfg.orb
seq = synthetic.generate_sequence(n_frames=14, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
grays = jnp.stack([jnp.asarray(f.gray) for f in seq.frames])
T = grays.shape[0]
budgets = extractor.features_per_level(o)
print("devices:", jax.devices(), file=sys.stderr)


def scan_time(name, step):
    @jax.jit
    def run():
        def body(acc, i):
            return acc + step(grays[i]), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(T))
        return out
    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = run()
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/(4*T)*1000:7.2f} ms/frame")


def s_pyramid(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    return sum(jnp.sum(p[::16, ::16]) for p in pyr)
scan_time("pyramid", s_pyramid)


def s_fast(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    acc = jnp.float32(0)
    for img in pyr:
        s = fast_ops.nms3x3(fast_ops.fast_score(img, o.min_th_fast / 255.0))
        acc += jnp.sum(s[::8, ::8])
    return acc
scan_time("pyramid+FAST+NMS", s_fast)


def s_select(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    acc = jnp.float32(0)
    for l, (img, b) in enumerate(zip(pyr, budgets)):
        cell = max(int(round(o.cell_size / (o.scale_factor ** l))), 8)
        yx, sc = fast_ops.detect_level(img, o.ini_th_fast / 255.0,
                                       o.min_th_fast / 255.0, cell=cell,
                                       top_per_cell=3, n_out=b,
                                       border=orb_ops.BORDER)
        acc += jnp.sum(yx) + jnp.sum(sc)
    return acc
scan_time("+ cell/global top-k select", s_select)


def s_patch(g):
    pyr = image_ops.build_pyramid(g, o.n_levels, o.scale_factor)
    yxs, lvls = [], []
    for l, (img, b) in enumerate(zip(pyr, budgets)):
        cell = max(int(round(o.cell_size / (o.scale_factor ** l))), 8)
        yx, sc = fast_ops.detect_level(img, o.ini_th_fast / 255.0,
                                       o.min_th_fast / 255.0, cell=cell,
                                       top_per_cell=3, n_out=b,
                                       border=orb_ops.BORDER)
        yxs.append(yx)
        lvls.append(jnp.full((b,), l, jnp.int32))
    patches = jnp.concatenate([
        orb_ops.extract_patches(img, yx) for img, yx in zip(pyr, yxs)])
    return patches


scan_time("+ patch gather", lambda g: jnp.sum(s_patch(g)[:, ::4, ::4]))


def s_orient(g):
    p = s_patch(g)
    return jnp.sum(orb_ops.orientations(p))
scan_time("+ orientation", s_orient)


def s_desc(g):
    p = s_patch(g)
    a = orb_ops.orientations(p)
    bl = orb_ops.blur_patches(p, o.blur_sigma, 3)
    packed, pm1 = orb_ops.descriptors_from_patches(bl, a)
    return jnp.sum(pm1.astype(jnp.float32)) + jnp.sum(a)
scan_time("+ blur + descriptors", s_desc)
