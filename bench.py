"""Benchmark: RGBD object-SLAM tracking throughput on one chip.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "fps", "vs_baseline": R}

Baseline = 30 fps, the reference's real-time target (D435i camera rate,
`ros_test/config/D435i.yaml:17`; the reference is "real-time usable" on a
desktop GPU+CPU, BASELINE.md). The driver-defined goal is >= 100 fps on one
chip.

Methodology: render a synthetic 640x480 RGBD sequence (the repo ships no
TUM images), build a map over warm-up frames, then time the steady-state
FULL per-frame path on device (lax.scan over frames): ORB extraction,
plane segmentation + association, motion-model match + pose GN, local-map
match + pose GN (with plane factors), and the complete EAO object lane
(frame objects, ensemble association, member fusion, projection culling).
Keyframe-rate work (insertion, local BA, loop detection, object merge +
iForest) is excluded, as in the reference's per-frame timers.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache (before jax import) — recompiling the full
# pipeline over the remote-compile tunnel otherwise dominates warmup
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import tracking
    from eao_fusion_tpu.pipeline.system import System

    log(f"[{time.time()-t0:.1f}s] devices: {jax.devices()}")
    cfg = SystemConfig()

    n_frames = 24
    seq = synthetic.generate_sequence(n_frames=n_frames, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    log(f"[{time.time()-t0:.1f}s] rendered {n_frames} frames")

    sys_ = System(cfg)
    for f in seq.frames[:12]:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    log(f"[{time.time()-t0:.1f}s] map built: kf={sys_.n_keyframes} "
        f"pts={int(sys_.map.next_pt)}")

    # steady-state tracking: the per-frame loop runs ON DEVICE via lax.scan
    # (one dispatch per chunk of frames — the production pipelining mode;
    # also excludes the per-call host/tunnel round-trip from the
    # measurement). Palindrome order keeps the constant-velocity model
    # valid across wraps.
    idx = list(range(12, len(seq.frames))) + \
        list(range(len(seq.frames) - 2, 12, -1))
    grays = jnp.stack([jnp.asarray(seq.frames[i].gray) for i in idx])
    depths = jnp.stack([jnp.asarray(seq.frames[i].depth) for i in idx])
    T = grays.shape[0]

    from eao_fusion_tpu.objects import (association, object_map as obj_om,
                                        update as obj_update)
    from eao_fusion_tpu.ops import planes as plane_ops

    # fixed-shape per-frame detection boxes for the object lane
    def pad_boxes(b):
        out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
        out[:min(len(b), len(out))] = b[:len(out)]
        return out
    boxes_all = jnp.asarray(np.stack(
        [pad_boxes(seq.frames[i].boxes) for i in idx]))

    @jax.jit
    def run_chunk(m, ts, objs, grays, depths, boxes, key):
        def step(carry, inp):
            m, ts, objs, fid, key = carry
            gray, depth, bx = inp
            key, k = jax.random.split(key)
            feats = extractor.extract_features(
                gray, depth, orb_cfg=cfg.orb, cam_cfg=cfg.camera)
            # per-frame plane extraction + association, as in the
            # reference's frame path (`Frame::ComputePlanesFromPEAC`)
            planes = plane_ops.segment_planes(depth, cam=cfg.camera,
                                              cfg=cfg.planes)
            m, ts, diag = tracking.track_frame(m, ts, feats, fid, planes,
                                               cfg=cfg)
            # per-frame object lane (EAO ensemble association + update)
            fo = obj_om.build_frame_objects(bx, feats, ts.kp_pt, m.pt_xyz,
                                            m.pt_valid, ts.pose, cfg=cfg)
            a = association.ensemble_associate(objs, fo, m.pt_xyz, ts.pose,
                                               fid, cfg=cfg)
            objs = obj_update.object_update(objs, fo, a, m.pt_xyz, ts.pose,
                                            fid, k, cfg=cfg)
            return (m, ts, objs, fid + 1, key), diag["n_inliers"]

        (m, ts, objs, _, _), ninl = jax.lax.scan(
            step, (m, ts, objs, jnp.int32(12), key), (grays, depths, boxes))
        return m, ts, objs, ninl

    m, ts, objs = sys_.map, sys_.track, sys_.objects
    key = jax.random.PRNGKey(3)
    m1, ts1, o1, n = run_chunk(m, ts, objs, grays, depths, boxes_all, key)
    jax.block_until_ready(n)
    log(f"[{time.time()-t0:.1f}s] compiled; warm inliers={np.asarray(n)}")

    n_chunks = 6
    t1 = time.time()
    ninl = None
    for i in range(n_chunks):
        m, ts, objs, ninl = run_chunk(m, ts, objs, grays, depths,
                                      boxes_all, key)
    jax.block_until_ready(ninl)
    dt = time.time() - t1
    n_timed = n_chunks * T
    fps = n_timed / dt
    log(f"[{time.time()-t0:.1f}s] steady-state: {dt/n_timed*1000:.2f} ms/frame"
        f" = {fps:.1f} fps over {n_timed} frames "
        f"(inliers last chunk: {np.asarray(ninl)[-4:]})")

    print(json.dumps({"metric": "tracking_fps", "value": round(fps, 2),
                      "unit": "fps", "vs_baseline": round(fps / 30.0, 2)}))


if __name__ == "__main__":
    main()
