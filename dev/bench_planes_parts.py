"""Time segment_planes subparts on TPU (scan over varied inputs)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import planes as P

cfg = SystemConfig()
pcfg = cfg.planes
cam = cfg.camera
seq = synthetic.generate_sequence(n_frames=14, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
depths = jnp.stack([jnp.asarray(f.depth) for f in seq.frames])
T = depths.shape[0]
print(f"devices={jax.devices()}", file=sys.stderr)


def scan_time(name, step, n_rep=24):
    @jax.jit
    def run():
        def body(c, i):
            out = step(depths[i % T] + c * 0.0)
            return jnp.sum(out[0] if isinstance(out, tuple) else
                           jax.tree.leaves(out)[0]) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(T))
        return c
    run().block_until_ready()
    t0 = time.time()
    outs = [run() for _ in range(n_rep)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / (n_rep * T) * 1000
    print(f"{name:35s} {dt:.2f} ms/step", file=sys.stderr)


win = pcfg.window


def moments_fit(depth):
    cx, cy, cz = P.backproject_depth_channels(depth, cam)
    valid = (depth > 0.1) & (depth < 10.0)
    n, s, pp, gh, gw = P._window_moments(cx, cy, cz, valid, win)
    normal, d, mse, mu = P._fit_from_moments(n, s, pp)
    return (normal, d, mse, mu)


def full(depth):
    fp = P.segment_planes(depth, cam=cam, cfg=pcfg)
    return (fp.coeffs,)


def no_boundary(depth):
    # replicate segment_planes up to the refit, skipping boundary sampling
    import functools
    cx, cy, cz = P.backproject_depth_channels(depth, cam)
    valid = (depth > 0.1) & (depth < 10.0)
    n, s, pp, gh, gw = P._window_moments(cx, cy, cz, valid, win)
    normal, d, mse, mu = P._fit_from_moments(n, s, pp)
    return (normal, d)


def backproject_only(depth):
    cx, cy, cz = P.backproject_depth_channels(depth, cam)
    return (cx + cy + cz,)


def moments_only(depth):
    cx, cy, cz = P.backproject_depth_channels(depth, cam)
    valid = (depth > 0.1) & (depth < 10.0)
    n, s, pp, gh, gw = P._window_moments(cx, cy, cz, valid, win)
    return (n, s, pp)


def fit_only(depth):
    import jax.numpy as jnp
    g = 3072
    n = jnp.full((g,), 100.0) + depth[0, 0]
    s = jnp.ones((g, 3)) * 10
    pp = jnp.eye(3)[None].repeat(g, 0) * 5 + depth[1, 1]
    return P._fit_from_moments(n.astype(jnp.int32), s, pp)


scan_time("backproject_only", backproject_only)
scan_time("moments_only", moments_only)
scan_time("fit_only", fit_only)
scan_time("moments+fit", moments_fit)
scan_time("full segment_planes", full)
