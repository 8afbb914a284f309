"""Per-frame tracking: motion-model search -> pose GN -> local-map search ->
pose GN -> keyframe decision. One pure jitted function over the map pytree.

Re-design of `Tracking::Track` / `TrackWithMotionModel` / `TrackLocalMap`
(`src/Tracking.cc:940-1207, 1717-2231, 2233-2298`): the reference's two
projection searches and two PoseOptimization calls per frame map to two
masked-matmul matches (frontend/matcher.py) and two batched GN solves
(solvers/pose_opt.py). The whole step is shape-static; the map is read-only
except for the found/visible counters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import matcher
from eao_fusion_tpu.mapping import covisibility
from eao_fusion_tpu.mapping.map_state import MapState
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers import pose_opt
from eao_fusion_tpu.types import FrameFeatures

STATUS_UNINIT = 0
STATUS_OK = 1
STATUS_LOST = 2


class TrackState(NamedTuple):
    pose: jax.Array         # [7] current Tcw
    velocity: jax.Array     # [7] Tcw_t ∘ Twc_{t-1}
    last_pose: jax.Array    # [7]
    last_feats: FrameFeatures
    kp_pt: jax.Array        # [N] int32: current-frame kp slot -> map point id
    ref_kf: jax.Array       # [] int32
    n_inliers: jax.Array    # [] int32
    status: jax.Array       # [] int32
    frame_id: jax.Array     # [] int32
    last_kf_frame_id: jax.Array  # [] int32


def _empty_feats(cfg: SystemConfig) -> FrameFeatures:
    n = cfg.orb.max_keypoints
    return FrameFeatures(
        uv=jnp.zeros((n, 2), jnp.float32),
        response=jnp.zeros((n,), jnp.float32),
        level=jnp.zeros((n,), jnp.int32),
        angle=jnp.zeros((n,), jnp.float32),
        desc_packed=jnp.zeros((n, 8), jnp.uint32),
        desc_pm1=jnp.zeros((n, 256), jnp.int8),
        valid=jnp.zeros((n,), bool),
        depth=jnp.zeros((n,), jnp.float32),
        uright=jnp.full((n,), -1.0, jnp.float32))


def init_track_state(cfg: SystemConfig) -> TrackState:
    n = cfg.orb.max_keypoints
    ident = lie.se3_identity()
    return TrackState(
        pose=ident, velocity=ident, last_pose=ident,
        last_feats=_empty_feats(cfg),
        kp_pt=jnp.full((n,), -1, jnp.int32),
        ref_kf=jnp.int32(0), n_inliers=jnp.int32(0),
        status=jnp.int32(STATUS_UNINIT),
        frame_id=jnp.int32(-1), last_kf_frame_id=jnp.int32(-1))


def _inv_sigma2(level: jax.Array, scale: float) -> jax.Array:
    return scale ** (-2.0 * level.astype(jnp.float32))


def _build_pose_obs(m: MapState, feats: FrameFeatures, kp_pt: jax.Array,
                    scale: float) -> pose_opt.PoseObs:
    ok = (kp_pt >= 0) & feats.valid
    idx = jnp.clip(kp_pt, 0, m.max_pt - 1)
    return pose_opt.PoseObs(
        pts_w=m.pt_xyz[idx],
        uv=feats.uv,
        uright=feats.uright,
        inv_sigma2=_inv_sigma2(feats.level, scale),
        valid=ok & m.pt_valid[idx])


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_frame(m: MapState, ts: TrackState, feats: FrameFeatures,
                frame_id: jax.Array, planes=None, *, cfg: SystemConfig
                ) -> Tuple[MapState, TrackState, dict]:
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    cam5 = cam + (cfg.camera.bf,)
    W, H = cfg.camera.width, cfg.camera.height
    s = cfg.orb.scale_factor
    n_kp = cfg.orb.max_keypoints

    # ---- 1. motion-model prediction -----------------------------------
    pose_guess = lie.se3_compose(ts.velocity, ts.last_pose)

    # ---- 2. match last frame's tracked points -------------------------
    last_pt = ts.kp_pt
    lf = ts.last_feats
    src_valid = (last_pt >= 0) & lf.valid
    src_idx = jnp.clip(last_pt, 0, m.max_pt - 1)
    src_valid = src_valid & m.pt_valid[src_idx]
    pts_w = m.pt_xyz[src_idx]
    # RGBD window: th=15 px scaled by the source keypoint's octave
    # (`src/ORBmatcher.cc:1370`), level window ±1
    radius = (cfg.matcher.radius_motion_model
              * s ** lf.level.astype(jnp.float32))

    def run_mm(radius_mult):
        res = matcher.match_points_to_frame(
            pts_w, lf.desc_pm1, src_valid, lf.angle, lf.level,
            radius * radius_mult, lf.level - 1, lf.level + 1,
            feats, pose_guess, cam=cam, width=W, height=H,
            th=cfg.matcher.th_high, check_rotation=True)
        kp_pt = jnp.where(res.target_idx >= 0,
                          last_pt[jnp.clip(res.target_idx, 0, n_kp - 1)], -1)
        return kp_pt

    kp_pt_mm = run_mm(1.0)
    n_mm = jnp.sum((kp_pt_mm >= 0).astype(jnp.int32))
    # reference: if <20 matches, retry with doubled window
    kp_pt_mm = jax.lax.cond(n_mm < cfg.tracking.min_matches_track,
                            lambda: run_mm(2.0), lambda: kp_pt_mm)
    n_mm2 = jnp.sum((kp_pt_mm >= 0).astype(jnp.int32))

    # TrackReferenceKeyFrame fallback (`src/Tracking.cc:989-997, 1568`):
    # if motion-model matching still fails, match descriptors against the
    # reference keyframe and seed from the last pose
    def run_ref_kf():
        ref = jnp.clip(ts.ref_kf, 0, m.max_kf - 1)
        ref_pt = m.kf_pt_idx[ref]
        va = (m.kf_kp_valid[ref] & (ref_pt >= 0)
              & m.pt_valid[jnp.clip(ref_pt, 0, None)])
        mm = matcher.mutual_match(
            m.kf_desc_pm1[ref], va, m.kf_kp_angle[ref],
            feats.desc_pm1, feats.valid, feats.angle,
            th=cfg.matcher.th_low, use_ratio=True, check_rotation=True)
        kp_pt = jnp.full((n_kp,), -1, jnp.int32)
        kp_pt = kp_pt.at[jnp.where(mm.target_idx >= 0, mm.target_idx,
                                   n_kp)].set(ref_pt, mode="drop")
        return kp_pt

    use_ref = n_mm2 < cfg.tracking.min_matches_track
    kp_pt_mm = jax.lax.cond(use_ref, run_ref_kf, lambda: kp_pt_mm)
    pose_guess = jnp.where(use_ref, ts.last_pose, pose_guess)

    # ---- 3. first pose optimization -----------------------------------
    obs1 = _build_pose_obs(m, feats, kp_pt_mm, s)
    r1 = pose_opt.optimize_pose(pose_guess, obs1, cam=cam5, cfg=cfg.solver)
    kp_pt_mm = jnp.where(r1.inliers & (kp_pt_mm >= 0), kp_pt_mm, -1)

    # ---- 4. local map -------------------------------------------------
    Z = covisibility.observation_indicator(m)
    seen = jnp.zeros((m.max_pt,), bool).at[
        jnp.where(kp_pt_mm >= 0, kp_pt_mm, m.max_pt)].set(True, mode="drop")
    kf_local = covisibility.local_keyframes(
        Z, seen, m.kf_valid, cfg.tracking.max_local_keyframes)
    pt_local = covisibility.points_of_keyframes(Z, kf_local) & m.pt_valid

    # frustum + view-cone gating (Frame::isInFrustum, `src/Frame.cc:638`)
    twc = lie.se3_inverse(r1.pose)
    center = twc[4:7]
    rel = m.pt_xyz - center
    dist = jnp.linalg.norm(rel, axis=-1)
    view_cos = jnp.sum(rel * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    in_range = (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.2 * m.pt_max_dist)
    pred_lvl = matcher.predict_scale_level(dist, m.pt_max_dist, s,
                                           cfg.orb.n_levels)
    cand = pt_local & in_range & (view_cos > 0.5) & (~seen)
    # visible counter increment (IncreaseVisible semantics: all frustum
    # candidates AND the already-tracked points, `src/Tracking.cc:2610-2626`)
    uv_p, z_p, in_img = matcher.project_points(r1.pose, m.pt_xyz, cam, W, H)
    visible = (cand & in_img) | seen
    m = m._replace(pt_visible=m.pt_visible + visible.astype(jnp.int32))

    r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius_lm = r_base * s ** pred_lvl.astype(jnp.float32)
    # search only points NOT already matched this frame (the reference's
    # SearchLocalPoints skips mnLastFrameSeen == current frame) — otherwise
    # a motion-model-matched point can claim a second keypoint slot and be
    # double-counted in pose optimization and keyframe observations
    res_lm = matcher.match_points_to_frame(
        m.pt_xyz, m.pt_desc_pm1, visible & ~seen,
        jnp.zeros((m.max_pt,)), pred_lvl,
        radius_lm, pred_lvl - 1, pred_lvl,
        feats, r1.pose, cam=cam, width=W, height=H,
        th=cfg.matcher.th_high, nn_ratio=0.8, use_ratio=True,
        check_rotation=False)
    kp_pt = jnp.where(kp_pt_mm >= 0, kp_pt_mm,
                      jnp.where(res_lm.target_idx >= 0, res_lm.target_idx, -1))

    # ---- 4b. plane association (Map::AssociatePlanesByBoundary called
    # before the second PoseOptimization, `src/Tracking.cc:2181-2186`) ----
    plane_obs = None
    plane_assoc = None
    if planes is not None:
        from eao_fusion_tpu.mapping import plane_map
        plane_assoc = plane_map.associate_planes(m, planes, r1.pose, cfg=cfg)
        plane_obs = plane_map.build_plane_obs(m, planes, plane_assoc)
        meas = plane_map._align_sign(plane_obs.meas_c, plane_obs.plane_w,
                                     r1.pose)
        plane_obs = plane_obs._replace(meas_c=meas)

    # ---- 5. second pose optimization ----------------------------------
    obs2 = _build_pose_obs(m, feats, kp_pt, s)
    r2 = pose_opt.optimize_pose(r1.pose, obs2, plane_obs,
                                cam=cam5, cfg=cfg.solver)
    kp_pt = jnp.where(r2.inliers & (kp_pt >= 0), kp_pt, -1)
    n_in = jnp.sum((kp_pt >= 0).astype(jnp.int32))

    # found counter (IncreaseFound)
    found = jnp.zeros((m.max_pt,), bool).at[
        jnp.where(kp_pt >= 0, kp_pt, m.max_pt)].set(True, mode="drop")
    m = m._replace(pt_found=m.pt_found + found.astype(jnp.int32))

    ok = n_in >= cfg.tracking.min_matches_track
    status = jnp.where(ok, STATUS_OK, STATUS_LOST)
    # on loss: freeze at the last good pose and drop the motion model —
    # a near-zero-inlier GN step is unconstrained garbage, and inside a
    # scanned chunk it would otherwise compound frame after frame (the
    # reference clears mVelocity and stops updating mTcw when LOST,
    # `src/Tracking.cc:999-1012`; recovery is relocalization)
    pose_out = jnp.where(ok, r2.pose, ts.pose)

    # ---- 6. keyframe decision (NeedNewKeyFrame, `src/Tracking.cc:2300`) --
    ref_kf = jnp.argmax(Z @ found.astype(jnp.float32)).astype(jnp.int32)
    # nRefMatches = ref-KF map points with >= minObs keyframe observations
    # (KeyFrame::TrackedMapPoints semantics, minObs = 3 once the map has
    # more than 2 KFs — `src/Tracking.cc:2330-2334`). An RGBD/stereo
    # observation counts DOUBLE in the reference (`nObs += 2`,
    # `src/MapPoint.cc:106`), so nObs >= 3 means 2 distinct keyframes
    # for RGBD, 3 for mono.
    pt_obs = jnp.sum(Z, axis=0)                       # [P] obs counts
    mature_obs = 3.0 if cfg.sensor == "mono" else 2.0
    min_obs = jnp.where(m.next_kf <= 2, 1.0, mature_obs)
    ref_pts = m.kf_pt_idx[ref_kf]
    ref_ok = (ref_pts >= 0) & (pt_obs[jnp.clip(ref_pts, 0, None)] >= min_obs)
    n_ref = jnp.sum(ref_ok.astype(jnp.int32))
    close = (feats.depth > 0) & (feats.depth < cfg.camera.depth_threshold)
    tracked_close = jnp.sum((close & (kp_pt >= 0)).astype(jnp.int32))
    untracked_close = jnp.sum((close & (kp_pt < 0) & feats.valid)
                              .astype(jnp.int32))
    need_close = (tracked_close < cfg.tracking.kf_min_close_points) & \
                 (untracked_close > cfg.tracking.kf_max_close_tracked)
    frames_since = frame_id - ts.last_kf_frame_id
    c1 = frames_since >= cfg.tracking.max_frames_between_kf
    ratio_ok = n_in < cfg.tracking.kf_ref_ratio * n_ref.astype(jnp.float32)
    # the soft ratio trigger honors the mapping-backpressure floor (see
    # the min_frames_between_kf config comment) — on revisit laps a fused
    # reference keyframe tracks more points than any single view can
    # match, so the ratio alone would insert every frame forever; the
    # need_close (map starving of close points) trigger and the c1
    # timeout stay ungated
    ratio_ok = ratio_ok & \
        (frames_since >= cfg.tracking.min_frames_between_kf)
    c2 = (ratio_ok | need_close) & (n_in > 15)
    has_capacity = m.next_kf < m.max_kf
    need_kf = ok & (c1 | c2) & has_capacity & (frames_since >= 1)

    vel = lie.se3_compose(pose_out, lie.se3_inverse(ts.last_pose))
    ident = lie.se3_identity()
    new_ts = TrackState(
        pose=pose_out,
        velocity=jnp.where(ok & (ts.status == STATUS_OK), vel, ident),
        last_pose=pose_out,
        last_feats=feats,
        kp_pt=kp_pt,
        ref_kf=ref_kf,
        n_inliers=n_in,
        status=status,
        frame_id=frame_id,
        last_kf_frame_id=ts.last_kf_frame_id)
    diag = {"n_mm": n_mm, "n_inliers": n_in, "need_kf": need_kf,
            "n_local_pts": jnp.sum(cand.astype(jnp.int32)),
            "n_kf_local": jnp.sum(kf_local.astype(jnp.int32)),
            "n_ref": n_ref, "tracked_close": tracked_close,
            "untracked_close": untracked_close,
            # which NeedNewKeyFrame trigger fired (for the cadence
            # histogram): bit0 = c1 timeout, bit1 = ratio, bit2 =
            # need_close; object-triggered KFs are bit3, set by the caller
            "kf_trigger": (c1.astype(jnp.int32)
                           + 2 * (ratio_ok & (n_in > 15)).astype(jnp.int32)
                           + 4 * (need_close & (n_in > 15)).astype(jnp.int32))}
    if plane_assoc is not None:
        diag["n_planes_matched"] = jnp.sum((plane_assoc >= 0).astype(jnp.int32))
        diag["plane_assoc"] = plane_assoc
    return m, new_ts, diag
