"""Per-frame stage attribution for the steady-state loop on the real chip.

Times slam_chunk (no keyframes) under config variants (objects off, planes
off, both off) plus isolated extract/plane scans, and the kf_every=12 delta
for the keyframe branch. Scan-based timing over varied frames (the axon
tunnel dedups identical executions).

Usage: python dev/bench_steady_breakdown.py [n_chunks]
"""

import os
import sys
import time
from dataclasses import replace

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.ops import planes as plane_ops
    from eao_fusion_tpu.pipeline import steady
    from eao_fusion_tpu.pipeline.system import System

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames[:12]:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    idx = list(range(12, len(seq.frames))) + \
        list(range(len(seq.frames) - 2, 12, -1))
    grays = jnp.stack([jnp.asarray(seq.frames[i].gray) for i in idx])
    depths = jnp.stack([jnp.asarray(seq.frames[i].depth) for i in idx])
    T = grays.shape[0]

    def pad_boxes(b):
        out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
        out[:min(len(b), len(out))] = b[:len(out)]
        return out
    boxes_all = jnp.asarray(np.stack(
        [pad_boxes(seq.frames[i].boxes) for i in idx]))
    tss = jnp.asarray([seq.frames[i].timestamp for i in idx], jnp.float32)
    st0 = steady.init_steady_state(sys_)
    log(f"[{time.time()-t0:.1f}s] setup done T={T}")

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t1 = time.time()
        for _ in range(n_chunks):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.time() - t1) / (n_chunks * T) * 1000
        log(f"{name:44s} {dt:8.3f} ms/frame")
        return dt

    results = {}
    for name, c, kfe in (
            ("FULL (kf 1/12)", cfg, 12),
            ("FULL (no KF)", cfg, 10 ** 6),
            ("no objects", replace(cfg, use_objects=False), 10 ** 6),
            ("no planes", replace(cfg, use_planes=False), 10 ** 6),
            ("no objects, no planes", replace(cfg, use_objects=False,
                                              use_planes=False), 10 ** 6)):
        results[name] = timed(name, lambda c=c, kfe=kfe: steady.slam_chunk(
            st0, grays, depths, boxes_all, tss, cfg=c, kf_every=kfe)[0])

    # isolated front-end stages
    @jax.jit
    def ex_scan(grays, depths):
        def body(_, gd):
            f = extractor.extract_features(gd[0], gd[1], orb_cfg=cfg.orb,
                                           cam_cfg=cfg.camera)
            return 0, f.desc_pm1.sum()
        return jax.lax.scan(body, 0, (grays, depths))[1]

    results["extract only"] = timed(
        "extract_features only", lambda: ex_scan(grays, depths))

    @jax.jit
    def pl_scan(depths):
        def body(_, d):
            fp = plane_ops.segment_planes(d, cam=cfg.camera, cfg=cfg.planes)
            return 0, fp.coeffs.sum()
        return jax.lax.scan(body, 0, depths)[1]

    results["planes only"] = timed(
        "segment_planes only", lambda: pl_scan(depths))

    log("---- attribution ----")
    log(f"keyframe branch (amortized): "
        f"{results['FULL (kf 1/12)'] - results['FULL (no KF)']:.3f}")
    log(f"object lane: "
        f"{results['FULL (no KF)'] - results['no objects']:.3f}")
    log(f"plane seg+assoc+factors: "
        f"{results['FULL (no KF)'] - results['no planes']:.3f}")
    log(f"track+extract core: {results['no objects, no planes']:.3f}"
        f" (extract alone {results['extract only']:.3f},"
        f" planes alone {results['planes only']:.3f})")


if __name__ == "__main__":
    main()
