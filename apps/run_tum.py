"""Run the SLAM engine on a TUM RGBD sequence.

The CLI counterpart of the reference's ROS apps (`ros_test/app/ros_rgbd.cpp`
/ `ros_rgbd_imu.cpp` + message_flow): reads a TUM dataset directory
(rgb.txt / depth.txt, associated by nearest timestamp), optionally offline
YOLO detection files (`<ts>.txt` rows `class x y w h score`, the reference's
`data/yolo_txts` format) and a groundtruth.txt for ConstraintType=1 world
alignment + final ATE, tracks every frame, and writes TUM/KITTI
trajectories (`System::SaveTrajectoryTUM/KITTI` formats).

Usage:
  python apps/run_tum.py DATASET_DIR [--boxes DIR] [--gt FILE]
      [--out traj.txt] [--mono] [--no-planes] [--no-objects]
      [--checkpoint out.npz] [--max-frames N] [--mode Full|NA|IoU|NP]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# allow `python apps/run_tum.py` without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def load_image(path: str, gray: bool) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    a = np.asarray(img)
    if gray:
        if a.ndim == 3:
            a = a @ np.array([0.299, 0.587, 0.114])
        return (a / 255.0).astype(np.float32)
    return a


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--boxes", default=None,
                    help="directory of per-timestamp detection txts")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--kitti", default=None)
    ap.add_argument("--kf-out", default=None,
                    help="also write the keyframe-only trajectory "
                         "(System::SaveKeyFrameTrajectoryTUM)")
    ap.add_argument("--log-jsonl", default=None,
                    help="write one JSON line per frame (timestamp, "
                         "inliers, keyframe count, tracking status) — the "
                         "structured counterpart of the reference's "
                         "[INFO]/[COST TIME] printouts")
    ap.add_argument("--viz-dir", default=None,
                    help="write offline visual artifacts at the end: map "
                         "top view + last-frame quadric-projection overlay "
                         "(Pangolin viewer / DrawQuadricProject roles)")
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--stereo", action="store_true",
                    help="rectified stereo: dataset must also have "
                         "right.txt + right/ images (System::TrackStereo "
                         "lane; depth comes from epipolar matching, planes "
                         "are unavailable without a depth image)")
    ap.add_argument("--no-planes", action="store_true")
    ap.add_argument("--no-objects", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--mode", default="Full",
                    help="association ablation flag (Full/NA/IoU/NP/None)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--localization-only", action="store_true",
                    help="track against the (resumed) map without mapping "
                         "(System::ActivateLocalizationMode)")
    ap.add_argument("--imu", default=None,
                    help="accelerometer.txt for IMU-gravity world alignment "
                         "at init (ConstraintType 2, "
                         "message_flow.cc InitIMU semantics)")
    ap.add_argument("--gravity-axis", type=int, default=3, choices=(2, 3),
                    help="world axis anti-parallel to gravity "
                         "(~gravity_aixs ROS param)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--depth-factor", type=float, default=5000.0)
    ap.add_argument("--chunk", type=int, default=0,
                    help="production pipelining mode: after warm-up, run "
                         "the WHOLE per-frame pipeline on device in "
                         "lax.scan chunks of N frames (one dispatch per "
                         "chunk, pipeline/steady.py); loop-closure "
                         "detection runs at chunk boundaries. RGBD only.")
    ap.add_argument("--online", action="store_true",
                    help="run the online YOLOX detector lane instead of "
                         "offline --boxes files (the reference's ~online "
                         "ROS param; weights from $EAO_YOLOX_WEIGHTS or "
                         "data/yolox_synth.npz)")
    args = ap.parse_args(argv)

    from eao_fusion_tpu.config import tum_fr3_config
    from eao_fusion_tpu.io import tum
    from eao_fusion_tpu.pipeline.system import System

    import dataclasses
    sensor = "mono" if args.mono else ("stereo" if args.stereo else "rgbd")
    cfg = tum_fr3_config(
        sensor=sensor,
        use_planes=not args.no_planes and sensor == "rgbd",
        use_objects=not args.no_objects,
        use_loop_closing=not args.no_loop,
        semantic_online=args.online)
    cfg = cfg.replace(objects=dataclasses.replace(cfg.objects,
                                                  mode=args.mode))

    rgb_txt = os.path.join(args.dataset, "rgb.txt")
    if not os.path.exists(rgb_txt):
        sys.exit(f"error: {rgb_txt} not found — expected a TUM dataset "
                 f"directory (rgb.txt [+ depth.txt])")
    rgb_list = tum.read_image_list(rgb_txt)
    depth_list = [] if (args.mono or args.stereo) else tum.read_image_list(
        os.path.join(args.dataset, "depth.txt"))
    right_list = tum.read_image_list(
        os.path.join(args.dataset, "right.txt")) if args.stereo else []
    pairs = tum.associate_timestamps(
        np.array([t for t, _ in rgb_list]),
        np.array([t for t, _ in depth_list])) if depth_list else \
        [(i, -1) for i in range(len(rgb_list))]
    if args.max_frames:
        pairs = pairs[:args.max_frames]

    gt_pose0 = None
    if args.gt:
        gt_ts, gt_twc = tum.read_groundtruth(args.gt)

    s = System(cfg)
    if args.resume:
        from eao_fusion_tpu.io import checkpoint
        checkpoint.load_state(args.resume, s)
    if args.localization_only:
        s.activate_localization_mode()

    # frame source: native prefetcher (background C++ PNG decode) when
    # built, PIL fallback otherwise
    from eao_fusion_tpu.io import native_loader

    right_pairs = None
    if args.stereo:
        right_pairs = dict(tum.associate_timestamps(
            np.array([t for t, _ in rgb_list]),
            np.array([t for t, _ in right_list])))
        # drop left frames with no right match within max_dt: pairs
        # enumerates EVERY rgb frame, but associate_timestamps only keeps
        # associated ones — indexing right_pairs[ri] would KeyError on any
        # dataset whose left/right lists are not perfectly aligned
        pairs = [(ri, di) for ri, di in pairs if ri in right_pairs]

    def frame_iter():
        if native_loader.available() and not args.stereo:
            rgbs = [os.path.join(args.dataset, rgb_list[ri][1])
                    for ri, _ in pairs]
            deps = [os.path.join(args.dataset, depth_list[di][1])
                    for _, di in pairs] if depth_list else None
            tss = [rgb_list[ri][0] for ri, _ in pairs]
            pf = native_loader.FramePrefetcher(
                rgbs, deps, tss, width=cfg.camera.width,
                height=cfg.camera.height, depth_factor=args.depth_factor)
            for idx, ts_img, gray, depth in pf:
                yield idx, ts_img, gray, depth
        else:
            for n, (ri, di) in enumerate(pairs):
                ts_img, rgb_path = rgb_list[ri]
                gray = load_image(os.path.join(args.dataset, rgb_path),
                                  gray=True)
                depth = None
                if di >= 0:
                    draw = load_image(
                        os.path.join(args.dataset, depth_list[di][1]),
                        gray=False)
                    depth = draw.astype(np.float32) / args.depth_factor
                yield n, ts_img, gray, depth

    chunked = 0
    if args.chunk:
        if sensor != "rgbd":
            sys.exit("error: --chunk requires the RGBD pipeline")
        if args.localization_only:
            sys.exit("error: --chunk is a mapping mode")
        chunked = max(2, args.chunk)

    def run_chunked(frames):
        """Steady-state chunks: frames = list of (ts, gray, depth, boxes).
        Returns per-frame poses; loop closing at chunk boundaries."""
        import jax
        import jax.numpy as jnp
        from eao_fusion_tpu.pipeline import steady

        def pad_boxes(b):
            out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
            if b is not None and len(b):
                out[:min(len(b), len(out))] = b[:len(out)]
            return out

        st = steady.init_steady_state(s)
        kf_hint = None
        for lo in range(0, len(frames), chunked):
            batch = frames[lo:lo + chunked]
            grays = jnp.asarray(np.stack([f[1] for f in batch]))
            depths = jnp.asarray(np.stack([f[2] for f in batch]))
            bxs = jnp.asarray(np.stack([pad_boxes(f[3]) for f in batch]))
            tss = jnp.asarray([f[0] for f in batch], jnp.float32)
            kf_before = kf_hint if kf_hint is not None \
                else int(np.asarray(st.m.next_kf))
            st, diag = steady.slam_chunk(st, grays, depths, bxs, tss,
                                         cfg=cfg)
            poses = np.asarray(diag["pose"])
            ninl = np.asarray(diag["n_inliers"])
            kfi = np.asarray(diag["kf_inserted"])
            for j, (f, p) in enumerate(zip(batch, poses)):
                s.trajectory.append(p)
                s.timestamps.append(float(f[0]))
                s._traj_refs.append((-1, p))
                s.diags.append({"n_inliers": int(ninl[j]),
                                "kf_inserted": int(kfi[j])})
            # chunk-boundary protocol (System.chunk_epilogue): loop
            # closing per new keyframe, async-GBA merge, point/keyframe
            # compaction, lost-recovery relocalization
            st = s.chunk_epilogue(st, kf_before)
            kf_hint = s.next_kf_hint

    t0 = time.time()
    chunk_frames = []   # frames deferred to the steady chunked path
    last_gray = None
    for n, ts_img, gray, depth in frame_iter():
        last_gray = gray
        boxes = None
        if args.boxes:
            boxes = tum.read_yolo_boxes(
                os.path.join(args.boxes, f"{ts_img:.6f}.txt"))
        if chunked and s.n_keyframes >= 3:
            chunk_frames.append((ts_img, gray, depth, boxes))
            continue
        init_pose = None
        if args.gt and n == 0:
            j = int(np.argmin(np.abs(gt_ts - ts_img)))
            from eao_fusion_tpu.ops import lie
            init_pose = np.asarray(lie.se3_inverse(gt_twc[j]))
        elif args.imu and n == 0:
            # ConstraintType 2: gravity-aligned world at init
            # (`src/Tracking.cc:1276-1308` consuming INIT_POSE)
            from eao_fusion_tpu.io import imu as imu_io
            samples = tum.read_accelerometer(args.imu)
            s0 = imu_io.sync_imu(samples, ts_img)
            if s0 is not None:
                init_pose = imu_io.gravity_init_pose(
                    s0.accel, gravity_axis=args.gravity_axis)
            else:
                print("warning: no IMU sample within the staleness window "
                      "of the first frame; starting unaligned", flush=True)
        right = None
        if right_pairs is not None:
            ri = pairs[n][0]
            right = load_image(os.path.join(
                args.dataset, right_list[right_pairs[ri]][1]), gray=True)
        s.process_frame(gray, depth, ts_img, boxes=boxes,
                        initial_pose=init_pose, right=right)
        if n == 1:
            t0 = time.time()   # exclude first-frame compile time from fps
        if n % 50 == 0:
            d = s.diags[-1] if s.diags else {}
            rate = (f"{n / (time.time() - t0):.1f} fps" if n > 1
                    else "compiling…")
            print(f"frame {n}/{len(pairs)} kf={s.n_keyframes} "
                  f"inl={d.get('n_inliers', '-')} {rate}", flush=True)

    if chunk_frames:
        t1 = time.time()
        run_chunked(chunk_frames)
        dt = time.time() - t1
        print(f"chunked: {len(chunk_frames)} frames in {dt:.2f}s "
              f"({len(chunk_frames)/dt:.1f} fps incl. chunk compiles)",
              flush=True)

    tum.write_trajectory_tum(args.out, s.timestamps, s.trajectory_tcw())
    print(f"wrote {args.out} ({len(s.trajectory)} poses, "
          f"{s.n_keyframes} keyframes, loops={s.n_loops_closed}, "
          f"relocs={s.n_relocalizations})")
    if s.n_kf_evictions or s.n_kf_compactions or s.n_pt_compactions \
            or s.n_gba_merges:
        print(f"map lifecycle: evicted_kfs={s.n_kf_evictions} "
              f"kf_compactions={s.n_kf_compactions} "
              f"pt_compactions={s.n_pt_compactions} "
              f"gba_merges={s.n_gba_merges}")
    if args.kitti:
        tum.write_trajectory_kitti(args.kitti, s.trajectory_tcw())
    if args.kf_out:
        kf_ts, kf_tcw = s.keyframe_trajectory()
        tum.write_trajectory_tum(args.kf_out, kf_ts, kf_tcw)
        print(f"wrote {args.kf_out} ({len(kf_ts)} keyframes)")
    if args.log_jsonl:
        import json
        off = len(s.timestamps) - len(s.diags)   # init frames have no diag
        with open(args.log_jsonl, "w") as fh:
            for i, d in enumerate(s.diags):
                fh.write(json.dumps(
                    {"frame": i + off,
                     "t": round(s.timestamps[i + off], 6), **d}) + "\n")
            for ev in s.events:     # eviction/compaction event records
                fh.write(json.dumps(ev) + "\n")
            fh.write(json.dumps(
                {"event": "summary", "loops": s.n_loops_closed,
                 "relocs": s.n_relocalizations,
                 "evicted_kfs": s.n_kf_evictions,
                 "kf_compactions": s.n_kf_compactions,
                 "pt_compactions": s.n_pt_compactions,
                 "gba_merges": s.n_gba_merges}) + "\n")
        print(f"wrote {args.log_jsonl} ({len(s.diags)} frame records)")
    if args.viz_dir:
        from eao_fusion_tpu.utils import viz
        gt_for_viz = None
        if args.gt:
            from eao_fusion_tpu.ops import lie as _lie
            gt_for_viz = np.asarray(_lie.se3_inverse(gt_twc))
        viz.draw_map_topview(os.path.join(args.viz_dir, "map_topview.png"),
                             s, gt_for_viz)
        if not (args.mono or args.stereo):
            viz.draw_quadric_overlay(
                os.path.join(args.viz_dir, "quadric_overlay.png"),
                last_gray, s, title=f"frame {len(s.trajectory) - 1}")
        print(f"viz -> {args.viz_dir}", flush=True)
    if args.checkpoint:
        from eao_fusion_tpu.io import checkpoint
        checkpoint.save_state(args.checkpoint, s)
        print(f"checkpoint -> {args.checkpoint}")

    if args.gt:
        est_ts = np.array(s.timestamps)
        prs = tum.associate_timestamps(est_ts, gt_ts)
        if len(prs) > 3:
            ei = [a for a, _ in prs]
            gi = [b for _, b in prs]
            from eao_fusion_tpu.ops import lie
            gt_tcw = np.asarray(lie.se3_inverse(gt_twc[gi]))
            err = tum.evaluate_ate_rpe(s.trajectory_tcw()[ei], gt_tcw,
                                       align=True, with_scale=args.mono)
            print(f"ATE RMSE {err.ate_rmse*100:.2f} cm  "
                  f"median {err.ate_median*100:.2f} cm  "
                  f"RPE {err.rpe_trans_rmse*100:.2f} cm")


if __name__ == "__main__":
    main()
