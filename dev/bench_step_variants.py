"""Variant timing of local_mapping_step on the real chip: disable one
stage at a time (monkeypatch) to attribute the per-KF cost. All timing is
scan-based over varied keyframe slots (the axon tunnel dedups identical
executions).

Usage:  python dev/bench_step_variants.py  [n_reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System
    from eao_fusion_tpu.mapping import map_state as ms
    from eao_fusion_tpu.solvers import ba

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m = sys_.map
    K = int(np.asarray(m.next_kf))
    log(f"[{time.time()-t0:.1f}s] map: kf={K} pts={int(np.asarray(m.next_pt))}")

    slots = jnp.asarray(
        np.random.default_rng(0).integers(2, K, size=n_reps), jnp.int32)

    orig_fuse = lm.fuse_neighbors
    orig_refresh = ms.refresh_obs_ind
    orig_coo = ba.bundle_adjust_coo
    orig_cullp = lm.cull_points
    orig_cullk = lm.cull_keyframes

    def fake_coo(prob, plane_block=None, **kw):
        return ba.BAResult(cam_pose=prob.cam_pose, pt_xyz=prob.pt_xyz,
                           obs_inlier=prob.obs_valid,
                           chi2=jnp.float32(0.0))

    def timed(name):
        # re-jit the step fresh so the patch takes effect
        step = lm.local_mapping_step.__wrapped__

        def fn(mm, s):
            return step(mm, s, cfg=cfg)

        @jax.jit
        def loop(m, slots):
            def body(mm, s):
                return fn(mm, s), 0
            mm, _ = jax.lax.scan(body, m, slots)
            return mm

        out = loop(m, slots)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(m, slots)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:40s} {dt:8.2f} ms/KF")
        return dt

    full = timed("FULL step")

    ms.refresh_obs_ind = lambda mm: mm
    lm.__dict__.setdefault("_noop", None)
    d = timed("  - refresh_obs_ind -> noop")
    ms.refresh_obs_ind = orig_refresh
    log(f"    refresh_obs_ind contributes ~{full-d:.2f} ms")

    lm.fuse_neighbors = lambda mm, s, cfg: mm
    d = timed("  - fuse_neighbors -> noop")
    lm.fuse_neighbors = orig_fuse
    log(f"    fuse_neighbors contributes ~{full-d:.2f} ms")

    ba.bundle_adjust_coo = fake_coo
    d = timed("  - BA -> noop")
    ba.bundle_adjust_coo = orig_coo
    log(f"    local BA contributes ~{full-d:.2f} ms")

    lm.cull_points = lambda mm, s: mm
    d = timed("  - cull_points -> noop")
    lm.cull_points = orig_cullp
    log(f"    cull_points contributes ~{full-d:.2f} ms")

    lm.cull_keyframes = lambda mm, s, redundancy=0.9: mm
    d = timed("  - cull_keyframes -> noop")
    lm.cull_keyframes = orig_cullk
    log(f"    cull_keyframes contributes ~{full-d:.2f} ms")


if __name__ == "__main__":
    main()
