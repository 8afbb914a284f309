"""Bisect the keyframe-branch cost INSIDE the scan+cond context: rebuild
slam_chunk with progressively more of the keyframe branch enabled.

stage 0: cond with identity true-branch (pure cond overhead)
stage 1: + insert_keyframe + create_points + refresh row
stage 2: + plane landmark update
stage 3: + local_mapping_step
stage 4: + object merge (== production)
"""
import functools
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
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.mapping import map_state as ms, plane_map
    from eao_fusion_tpu.objects import association, object_map as om
    from eao_fusion_tpu.objects import merge as obj_merge
    from eao_fusion_tpu.objects import update as obj_update
    from eao_fusion_tpu.ops import planes as plane_ops
    from eao_fusion_tpu.pipeline import local_mapping, steady, tracking
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

    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)

    @functools.partial(jax.jit, static_argnames=("stage",))
    def chunk(st, grays, depths, boxes, tss, *, stage):
        def step(st, inp):
            gray, depth, bx, t = inp
            m, ts, objs, last_fo, fid, key = st
            key, k_obj, k_merge = jax.random.split(key, 3)
            feats = extractor.extract_features(gray, depth, orb_cfg=cfg.orb,
                                               cam_cfg=cfg.camera)
            fp = plane_ops.segment_planes(depth, cam=cfg.camera,
                                          cfg=cfg.planes)
            m, ts, diag = tracking.track_frame(m, ts, feats, fid, fp,
                                               cfg=cfg)
            fo = om.build_frame_objects(bx, feats, ts.kp_pt, m.pt_xyz,
                                        m.pt_valid, ts.pose, cfg=cfg)
            fo = om.merge_frame_objects(fo, last_fo, m.pt_valid, cfg=cfg)
            assoc = association.ensemble_associate(objs, fo, m.pt_xyz,
                                                   ts.pose, fid, cfg=cfg)
            objs = obj_update.object_update(objs, fo, assoc, m.pt_xyz,
                                            ts.pose, fid, k_obj, cfg=cfg)
            last_fo = fo
            need = (fid % 12 == 0) & (ts.status == tracking.STATUS_OK)
            need = need & (m.next_kf < m.max_kf)

            def kf_fn(args):
                m, ts, objs = args
                if stage >= 1:
                    m, slot = ms.insert_keyframe(m, feats, ts.pose, fid,
                                                 t, ts.kp_pt)
                    m = ms.create_points_from_depth(
                        m, slot, feats, ts.pose, ts.kp_pt,
                        float(cfg.camera.depth_threshold), cam, fid,
                        scale_factor=cfg.orb.scale_factor,
                        n_levels=cfg.orb.n_levels)
                    m = ms.refresh_obs_rows(m, slot[None])
                if stage >= 2:
                    assoc = plane_map.associate_planes(m, fp, ts.pose,
                                                       cfg=cfg)
                    m, plane_ids = plane_map.update_plane_map(
                        m, fp, assoc, ts.pose, slot, cfg=cfg)
                    m = plane_map.record_kf_plane_obs(m, slot, fp,
                                                      plane_ids)
                if stage >= 3:
                    m = local_mapping.local_mapping_step(m, slot, cfg=cfg)
                if stage >= 1:
                    ts2 = ts._replace(kp_pt=m.kf_pt_idx[slot],
                                      last_kf_frame_id=fid, ref_kf=slot)
                else:
                    ts2 = ts
                if stage >= 4:
                    objs = obj_merge.merge_and_overlap(objs, m.pt_xyz,
                                                       k_merge, cfg=cfg)
                return m, ts2, objs

            m, ts, objs = jax.lax.cond(need, kf_fn, lambda a: a,
                                       (m, ts, objs))
            st = steady.SteadyState(m=m, ts=ts, objs=objs, last_fo=last_fo,
                                    frame_id=fid + 1, key=key)
            return st, diag["n_inliers"]

        return jax.lax.scan(step, st, (grays, depths, boxes, tss))

    for stage in range(5):
        st, _ = chunk(st0, grays, depths, boxes_all, tss, stage=stage)
        jax.block_until_ready(st.ts.pose)
        n = 4
        t1 = time.time()
        st = st0
        for _ in range(n):
            st, _ = chunk(st, grays, depths, boxes_all, tss, stage=stage)
        jax.block_until_ready(st.ts.pose)
        dt = (time.time() - t1) / (n * T) * 1000
        log(f"stage={stage}: {dt:.2f} ms/frame")


if __name__ == "__main__":
    main()
