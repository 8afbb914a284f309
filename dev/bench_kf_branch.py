"""Attribute the full keyframe-branch cost in the steady loop: each
component scanned over varied inputs on the real chip.

Usage: python dev/bench_kf_branch.py [n_reps]
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
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.mapping import map_state as ms, plane_map
    from eao_fusion_tpu.objects import merge as obj_merge
    from eao_fusion_tpu.ops import planes as plane_ops
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m, ts, objs = sys_.map, sys_.track, sys_.objects
    f12 = seq.frames[12]
    feats = extractor.extract_features(jnp.asarray(f12.gray),
                                       jnp.asarray(f12.depth),
                                       orb_cfg=cfg.orb, cam_cfg=cfg.camera)
    fp = plane_ops.segment_planes(jnp.asarray(f12.depth), cam=cfg.camera,
                                  cfg=cfg.planes)
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    log(f"[{time.time()-t0:.1f}s] map: kf={int(m.next_kf)} "
        f"pts={int(m.next_pt)}")
    fids = jnp.asarray(
        np.random.default_rng(0).integers(100, 200, size=n_reps), jnp.int32)

    def timed(name, fn):
        @jax.jit
        def loop(m, fids):
            def body(mm, fid):
                return fn(mm, fid), 0
            mm, _ = jax.lax.scan(body, m, fids)
            return mm
        out = loop(m, fids)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(m, fids)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:36s} {dt:8.2f} ms/KF")
        return dt

    def insert_only(mm, fid):
        mm, slot = ms.insert_keyframe(mm, feats, ts.pose, fid, 0.0, ts.kp_pt)
        # keep table from overflowing across reps: reuse the last slot
        return mm._replace(next_kf=m.next_kf)

    def create_only(mm, fid):
        slot = m.next_kf - 1
        mm = ms.create_points_from_depth(
            mm, slot, feats, ts.pose, ts.kp_pt,
            float(cfg.camera.depth_threshold), cam, fid,
            scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels)
        return mm._replace(next_pt=m.next_pt)

    def refresh_only(mm, fid):
        return ms.refresh_obs_ind(
            mm._replace(kf_valid=mm.kf_valid.at[0].set(fid >= 0)))

    def stats_only(mm, fid):
        return ms.update_point_stats(
            mm._replace(kf_valid=mm.kf_valid.at[0].set(fid >= 0)))

    def planes_only(mm, fid):
        slot = m.next_kf - 1
        assoc = plane_map.associate_planes(mm, fp, ts.pose, cfg=cfg)
        mm, plane_ids = plane_map.update_plane_map(mm, fp, assoc, ts.pose,
                                                   slot, cfg=cfg)
        mm = plane_map.record_kf_plane_obs(mm, slot, fp, plane_ids)
        return mm._replace(next_pl=m.next_pl)

    def merge_only(mm, fid):
        nonlocal_objs = obj_merge.merge_and_overlap(
            objs, mm.pt_xyz, jax.random.PRNGKey(0), cfg=cfg)
        return mm._replace(pt_visible=mm.pt_visible
                           + nonlocal_objs.pt_ok[0].astype(jnp.int32)[:0].sum())

    def mapping_only(mm, fid):
        return lm.local_mapping_step(mm, m.next_kf - 1, cfg=cfg)

    timed("insert_keyframe", insert_only)
    timed("create_points_from_depth", create_only)
    timed("refresh_obs_ind", refresh_only)
    timed("update_point_stats", stats_only)
    timed("plane assoc+update+record", planes_only)
    timed("object merge_and_overlap", merge_only)
    timed("local_mapping_step", mapping_only)


if __name__ == "__main__":
    main()
