"""Relocalization after tracking loss.

Re-design of `Tracking::Relocalization` (`src/Tracking.cc:2786-2945`) +
`KeyFrameDatabase::DetectRelocalizationCandidates`: BoW retrieval is dense
L1 scoring; the reference's EPnP+RANSAC becomes 3D-3D Horn RANSAC
(ops/ransac) — valid because the RGBD query frame carries depth for its
keypoints — followed by the standard pose GN with all matches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import matcher
from eao_fusion_tpu.mapping import vocabulary
from eao_fusion_tpu.mapping.map_state import MapState
from eao_fusion_tpu.ops import lie, ransac
from eao_fusion_tpu.pipeline.tracking import _build_pose_obs
from eao_fusion_tpu.solvers import pose_opt


def reloc_candidates(m: MapState, v: jax.Array, bow_db: jax.Array,
                     max_candidates: int = 5) -> np.ndarray:
    """Candidate gating with `KeyFrameDatabase::DetectRelocalizationCandidates`
    parity (`src/KeyFrameDatabase.cc:198-310`): (1) common-word count >=
    0.8 x max over the database, (2) covisibility-group score accumulation
    over each candidate's top-10 covisible keyframes, (3) retain groups
    scoring >= 0.75 x best accumulated score, return each retained group's
    best keyframe ordered by accumulated score. All steps are dense
    vectorized passes — the inverted index becomes two matmuls."""
    from eao_fusion_tpu.mapping import covisibility

    kf_valid = np.asarray(m.kf_valid)
    # common-word counts: one [K, W] @ [W] indicator matmul replaces the
    # inverted-index walk
    common = np.asarray((bow_db > 0).astype(jnp.float32)
                        @ (v > 0).astype(jnp.float32))
    common = np.where(kf_valid, common, 0.0)
    if common.max() <= 0:
        return np.zeros((0,), np.int64)
    is_cand = common > 0.8 * common.max()
    scores = np.asarray(vocabulary.l1_scores(v, bow_db, m.kf_valid))
    scores = np.where(is_cand, scores, 0.0)

    # covisibility-group accumulation over the top-10 covisible keyframes
    Z = covisibility.observation_indicator(m)
    covis = np.asarray(covisibility.covisibility_counts(Z))
    covis = np.where(kf_valid[None, :] & kf_valid[:, None], covis, 0)
    K = covis.shape[0]
    top10 = np.argsort(-covis, axis=1)[:, :10]          # [K, 10]
    in_group = np.zeros((K, K), bool)
    rows = np.repeat(np.arange(K), 10)
    in_group[rows, top10.reshape(-1)] = covis[rows, top10.reshape(-1)] > 0
    in_group[np.arange(K), np.arange(K)] = True
    acc = (in_group * scores[None, :]).sum(axis=1)      # [K] group scores
    best_in_group = in_group * scores[None, :]
    best_kf = best_in_group.argmax(axis=1)              # [K]
    acc = np.where(is_cand, acc, 0.0)
    retain = acc >= 0.75 * acc.max()
    cand_kfs, first = np.unique(best_kf[retain & is_cand],
                                return_index=True)
    cand_acc = acc[retain & is_cand][first]
    order = cand_kfs[np.argsort(-cand_acc)][:max_candidates]
    return order


def relocalize(m: MapState, feats, bow_db: jax.Array,
               vocab: vocabulary.Vocabulary, key, *, cfg: SystemConfig,
               n_candidates: int = 5
               ) -> Tuple[Optional[np.ndarray], Optional[jax.Array]]:
    """Returns (pose [7] or None, kp_pt [N] association vector)."""
    v = vocabulary.bow_vector(vocab, feats.desc_pm1, feats.valid)
    scores = np.asarray(vocabulary.l1_scores(v, bow_db, m.kf_valid))
    order = reloc_candidates(m, v, bow_db, max_candidates=n_candidates)
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    cam5 = cam + (cfg.camera.bf,)

    for cand in order:
        if scores[cand] <= 0:
            break
        cand = int(cand)
        mm = matcher.mutual_match(
            m.kf_desc_pm1[cand], m.kf_kp_valid[cand], m.kf_kp_angle[cand],
            feats.desc_pm1, feats.valid, feats.angle,
            th=cfg.matcher.th_low, use_ratio=True, check_rotation=True)
        tgt = np.asarray(mm.target_idx)
        pt_kf = np.asarray(m.kf_pt_idx[cand])
        depth = np.asarray(feats.depth)
        pairs3d = [(pt_kf[i], t) for i, t in enumerate(tgt)
                   if t >= 0 and pt_kf[i] >= 0 and depth[t] > 0]
        pairs2d = [(pt_kf[i], t) for i, t in enumerate(tgt)
                   if t >= 0 and pt_kf[i] >= 0]
        if len(pairs3d) >= 15:
            # RGBD path: 3D-3D Horn RANSAC
            pids = jnp.asarray(np.array([p[0] for p in pairs3d]))
            kps = np.array([p[1] for p in pairs3d])
            pw = m.pt_xyz[pids]
            uv = feats.uv[jnp.asarray(kps)]
            d = feats.depth[jnp.asarray(kps)]
            pc = lie.backproject(cam, uv, d)
            res = ransac.ransac_align(pw, pc,
                                      jnp.ones((len(pairs3d),), bool),
                                      key, with_scale=False, inlier_th=0.10)
            if int(res.n_inliers) < 10:
                continue
            pose0 = lie.sim3_to_se3(res.transform)
            kps_used, pids_used, inl = kps, pids, res.inliers
        elif len(pairs2d) >= 15:
            # monocular path: 2D-3D PnP RANSAC (the reference's
            # EPnP+RANSAC role, `src/Tracking.cc:2830-2856`)
            pids = jnp.asarray(np.array([p[0] for p in pairs2d]))
            kps = np.array([p[1] for p in pairs2d])
            pw = m.pt_xyz[pids]
            uv = feats.uv[jnp.asarray(kps)]
            res = ransac.ransac_pnp(pw, uv,
                                    jnp.ones((len(pairs2d),), bool),
                                    key, cam=cam)
            if int(res.n_inliers) < 10:
                continue
            pose0 = res.pose
            kps_used, pids_used, inl = kps, pids, res.inliers
        else:
            continue

        # full association by projection + pose GN (the reference's
        # SearchByProjection addition + PoseOptimization rounds)
        n_kp = feats.uv.shape[0]
        kp_pt = jnp.full((n_kp,), -1, jnp.int32)
        kp_pt = kp_pt.at[jnp.asarray(kps_used)].set(
            jnp.where(inl, pids_used.astype(jnp.int32), -1))
        radius = jnp.full((m.max_pt,), cfg.matcher.radius_reloc)
        lvl = jnp.zeros((m.max_pt,), jnp.int32)
        proj = matcher.match_points_to_frame(
            m.pt_xyz, m.pt_desc_pm1, m.pt_valid, jnp.zeros((m.max_pt,)),
            lvl, radius, lvl, lvl + cfg.orb.n_levels,
            feats, pose0, cam=cam, width=cfg.camera.width,
            height=cfg.camera.height, th=cfg.matcher.th_high,
            check_rotation=False)
        kp_pt = jnp.where(kp_pt >= 0, kp_pt,
                          jnp.where(proj.target_idx >= 0, proj.target_idx, -1))
        obs = _build_pose_obs(m, feats, kp_pt, cfg.orb.scale_factor)
        r = pose_opt.optimize_pose(pose0, obs, cam=cam5, cfg=cfg.solver)
        if int(r.n_inliers) >= 50:
            kp_pt = jnp.where(r.inliers & (kp_pt >= 0), kp_pt, -1)
            return np.asarray(r.pose), kp_pt
    return None, None
