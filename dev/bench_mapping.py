"""Breakdown of the keyframe-rate mapping cost (local_mapping_step) on the
real chip. Times each stage via lax.scan over varied keyframe slots (the
axon tunnel dedups identical executions, so every call must differ).

Usage:  python dev/bench_mapping.py  [n_reps]
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
    from eao_fusion_tpu.mapping.map_state import refresh_obs_ind
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

    def timed(name, fn, *args):
        @jax.jit
        def loop(m, slots):
            def body(mm, s):
                return fn(mm, s), 0
            mm, _ = jax.lax.scan(body, m, slots)
            return mm

        out = loop(m, slots)        # compile + warm
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(m, slots)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:32s} {dt:8.2f} ms/KF")
        return dt

    cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            cfg.camera.bf)

    def ba_only(m, kf_slot):
        n_fixed = 8
        n_local = cfg.capacity.max_local_ba_kfs - n_fixed
        kf_idx, sel_valid, fixed, local_pts = lm._select_window(
            m, kf_slot, n_local, n_fixed)
        obs_pt = m.kf_pt_idx[kf_idx]
        pt_ok = m.pt_valid[jnp.clip(obs_pt, 0, None)] & (obs_pt >= 0)
        prob = ba.BAProblem(
            cam_pose=m.kf_pose[kf_idx],
            cam_valid=sel_valid & m.kf_valid[kf_idx],
            cam_fixed=fixed,
            pt_xyz=m.pt_xyz,
            pt_valid=m.pt_valid & local_pts,
            obs_pt=obs_pt,
            obs_uv=m.kf_kp_uv[kf_idx],
            obs_ur=m.kf_kp_uright[kf_idx],
            obs_inv_sigma2=cfg.orb.scale_factor ** (
                -2.0 * m.kf_kp_level[kf_idx].astype(jnp.float32)),
            obs_valid=m.kf_kp_valid[kf_idx] & pt_ok)
        res = ba.bundle_adjust(prob, None, cam=cam5, cfg=cfg.solver,
                               n_iters1=cfg.solver.local_ba_iters_first,
                               n_iters2=cfg.solver.local_ba_iters_second,
                               pt_chunk=2048)
        return m._replace(pt_xyz=jnp.where(
            (m.pt_valid & local_pts)[:, None], res.pt_xyz, m.pt_xyz))

    def select_only(m, kf_slot):
        kf_idx, sel_valid, fixed, local_pts = lm._select_window(
            m, kf_slot, cfg.capacity.max_local_ba_kfs - 8, 8)
        return m._replace(pt_visible=m.pt_visible
                          + local_pts.astype(m.pt_visible.dtype))

    timed("cull_points", lambda mm, s: lm.cull_points(mm, s), m)
    timed("fuse_neighbors",
          lambda mm, s: lm.fuse_neighbors(mm, s, cfg=cfg))
    timed("select_window", select_only)
    timed("local_BA (points only)", ba_only)
    timed("refresh_obs_ind", lambda mm, s: refresh_obs_ind(
        mm._replace(kf_valid=mm.kf_valid.at[0].set(s >= 0))))
    timed("cull_keyframes", lambda mm, s: lm.cull_keyframes(mm, s))
    timed("refresh_desc+stats", lambda mm, s: ms.update_point_stats(
        lm.refresh_point_descriptors(
            mm._replace(kf_valid=mm.kf_valid.at[0].set(s >= 0)))))
    timed("FULL local_mapping_step",
          lambda mm, s: lm.local_mapping_step(mm, s, cfg=cfg))


if __name__ == "__main__":
    main()
