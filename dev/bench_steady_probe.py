"""Probe: steady-loop per-frame cost vs keyframe-branch cost.

Runs slam_chunk with kf_every huge (no KF fires) and kf_every=12, on the
same warmed state; the delta isolates the keyframe branch incl. lax.cond
overhead (copies of the big carry).
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
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
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

    for kf_every in (10 ** 6, 12):
        st, diag = steady.slam_chunk(st0, grays, depths, boxes_all, tss,
                                     cfg=cfg, kf_every=kf_every)
        jax.block_until_ready(st.ts.pose)
        n = 4
        t1 = time.time()
        st = st0
        for _ in range(n):
            st, diag = steady.slam_chunk(st, grays, depths, boxes_all, tss,
                                         cfg=cfg, kf_every=kf_every)
        jax.block_until_ready(st.ts.pose)
        dt = (time.time() - t1) / (n * T) * 1000
        nkf = int(np.asarray(diag["kf_inserted"]).sum())
        log(f"kf_every={kf_every}: {dt:.2f} ms/frame ({nkf} kf/chunk)")


if __name__ == "__main__":
    main()
