"""Steady-state SLAM step: the WHOLE per-frame pipeline — tracking, plane
segmentation/association, EAO object lane, and keyframe-rate mapping under
``lax.cond`` — as ONE jittable function.

This is the TPU answer to the reference's thread topology
(`/root/reference/src/System.cc:104-120`: Tracking / LocalMapping /
LoopClosing on separate cores): instead of overlapping keyframe work on
other host threads, the whole steady-state loop lives on device and the
keyframe branch executes only on keyframe frames (`lax.cond` runs a single
branch at runtime on TPU). Driven by ``lax.scan`` over frame chunks, the
host dispatches once per chunk — there is no per-frame host round-trip and
no Python in the loop.

Loop-closure DETECTION stays host-side at keyframe rate (LoopCloser keeps
Python consistency-group state and loop events are episodic, exactly like
the reference's mostly-sleeping LoopClosing thread); its per-keyframe BoW
scoring cost is measured separately in NOTES_R2.md.

Used by the System facade's chunked mode and by bench.py (the sustained
throughput benchmark).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.mapping import map_state as ms
from eao_fusion_tpu.mapping import plane_map
from eao_fusion_tpu.objects import association, object_map as om
from eao_fusion_tpu.objects import merge as obj_merge
from eao_fusion_tpu.objects import update as obj_update
from eao_fusion_tpu.ops import planes as plane_ops
from eao_fusion_tpu.pipeline import local_mapping, tracking


class SteadyState(NamedTuple):
    """Carry of the on-device steady-state loop."""
    m: ms.MapState
    ts: tracking.TrackState
    objs: "om.ObjectTable"
    last_fo: "om.FrameObjects"
    frame_id: jax.Array          # [] int32
    key: jax.Array               # PRNG


def _keyframe_branch(m, ts, feats, fp, fid, timestamp, cfg: SystemConfig,
                     by_obj=False):
    """Insertion + plane landmark update + local mapping, mirroring
    System.process_frame's keyframe path (`src/Tracking.cc:2521` +
    `LocalMapping::Run`)."""
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    m, slot = ms.insert_keyframe(m, feats, ts.pose, fid, timestamp, ts.kp_pt,
                                 by_obj=by_obj)
    m = ms.create_points_from_depth(m, slot, feats, ts.pose, ts.kp_pt,
                                    float(cfg.camera.depth_threshold), cam,
                                    fid, scale_factor=cfg.orb.scale_factor,
                                    n_levels=cfg.orb.n_levels)
    m = ms.refresh_obs_rows(m, slot[None])   # insertion touched one row
    # point normals refresh inside local_mapping_step (MXU form)
    if cfg.use_planes and fp is not None:
        assoc = plane_map.associate_planes(m, fp, ts.pose, cfg=cfg)
        m, plane_ids = plane_map.update_plane_map(m, fp, assoc, ts.pose,
                                                  slot, cfg=cfg)
        m = plane_map.record_kf_plane_obs(m, slot, fp, plane_ids)
    m = local_mapping.local_mapping_step(m, slot, cfg=cfg)
    ts = ts._replace(kp_pt=m.kf_pt_idx[slot],
                     last_kf_frame_id=fid,
                     ref_kf=slot)
    return m, ts


@functools.partial(jax.jit, static_argnames=("cfg", "kf_every"))
def slam_step(st: SteadyState, gray: jax.Array, depth: jax.Array,
              boxes: jax.Array, timestamp: jax.Array, *,
              cfg: SystemConfig, kf_every: int = 0
              ) -> Tuple[SteadyState, dict]:
    """One full steady-state frame. `boxes` is a fixed-shape [B, 6]
    detection table (class, x, y, w, h, score; score<=0 rows are padding).
    `kf_every` > 0 pins a DETERMINISTIC keyframe cadence (one per that
    many frames, overriding the tracker's NeedNewKeyFrame — used by the
    sustained benchmark to hold the reference's ~1-KF-per-12-frames camera
    cadence on the fast-motion synthetic sequence); 0 uses the tracker's
    NeedNewKeyFrame decision."""
    m, ts, objs, last_fo, fid, key = st
    key, k_obj, k_merge = jax.random.split(key, 3)

    feats = extractor.extract_features(gray, depth, orb_cfg=cfg.orb,
                                       cam_cfg=cfg.camera)
    fp = None
    if cfg.use_planes:
        fp = plane_ops.segment_planes(depth, cam=cfg.camera, cfg=cfg.planes)

    m, ts, diag = tracking.track_frame(m, ts, feats, fid, fp, cfg=cfg)

    # ---- object lane (per frame) ----
    new_obj = jnp.bool_(False)
    if cfg.use_objects:
        fo = om.build_frame_objects(boxes, feats, ts.kp_pt, m.pt_xyz,
                                    m.pt_valid, ts.pose, cfg=cfg)
        fo = om.merge_frame_objects(fo, last_fo, m.pt_valid, cfg=cfg)
        assoc = association.ensemble_associate(objs, fo, m.pt_xyz, ts.pose,
                                               fid, cfg=cfg)
        prev_next_obj = objs.next_obj
        objs = obj_update.object_update(objs, fo, assoc, m.pt_xyz, ts.pose,
                                        fid, k_obj, cfg=cfg)
        new_obj = objs.next_obj > prev_next_obj
        last_fo = fo

    # ---- keyframe branch ----
    by_obj = jnp.bool_(False)
    if kf_every:
        need = (fid % kf_every == 0) & (ts.status == tracking.STATUS_OK)
    else:
        need_classic = diag["need_kf"] & (ts.status == tracking.STATUS_OK)
        # a newly created map object also triggers a keyframe (the
        # reference's NeedNewKeyFrame returns 2 on AppearNewObject,
        # `src/Tracking.cc:2390-2462`); such keyframes carry the
        # `kf_by_obj` culling exemption
        need_obj = new_obj & (ts.status == tracking.STATUS_OK)
        need = need_classic | need_obj
        by_obj = need_obj & (~need_classic)
    need = need & (m.next_kf < m.max_kf)

    def kf_fn(args):
        m, ts, objs = args
        m, ts = _keyframe_branch(m, ts, feats, fp, fid, timestamp, cfg,
                                 by_obj=by_obj)
        if cfg.use_objects:
            objs = obj_merge.merge_and_overlap(objs, m.pt_xyz, k_merge,
                                               cfg=cfg)
        return m, ts, objs

    m, ts, objs = jax.lax.cond(need, kf_fn, lambda a: a, (m, ts, objs))

    out = SteadyState(m=m, ts=ts, objs=objs, last_fo=last_fo,
                      frame_id=fid + 1, key=key)
    diag = dict(diag)
    diag["kf_inserted"] = need
    diag["kf_trigger"] = (diag["kf_trigger"]
                          + 8 * new_obj.astype(jnp.int32))
    return out, diag


@functools.partial(jax.jit, static_argnames=("cfg", "kf_every"))
def slam_chunk(st: SteadyState, grays: jax.Array, depths: jax.Array,
               boxes: jax.Array, timestamps: jax.Array, *,
               cfg: SystemConfig, kf_every: int = 0
               ) -> Tuple[SteadyState, dict]:
    """lax.scan of slam_step over a [T, H, W] frame chunk — ONE device
    dispatch for T frames (the production pipelining mode)."""
    def body(st, inp):
        gray, depth, bx, t = inp
        st, diag = slam_step.__wrapped__(st, gray, depth, bx, t, cfg=cfg,
                                         kf_every=kf_every)
        return st, {"n_inliers": diag["n_inliers"],
                    "kf_inserted": diag["kf_inserted"],
                    "kf_trigger": diag["kf_trigger"],
                    "n_ref": diag["n_ref"],
                    "tracked_close": diag["tracked_close"],
                    "untracked_close": diag["untracked_close"],
                    "pose": st.ts.pose}

    return jax.lax.scan(body, st, (grays, depths, boxes, timestamps))


def init_steady_state(system) -> SteadyState:
    """Build a SteadyState carry from a warmed-up System facade."""
    cfg = system.cfg
    last_fo = getattr(system, "_last_fo", None)
    if last_fo is None:
        n = cfg.orb.max_keypoints
        feats = jax.tree.map(jnp.zeros_like, system.track.last_feats)
        last_fo = om.build_frame_objects(
            jnp.zeros((cfg.objects.max_objects_2d, 6), jnp.float32),
            feats, jnp.full((n,), -1, jnp.int32),
            system.map.pt_xyz, system.map.pt_valid,
            system.track.pose, cfg=cfg)
    return SteadyState(m=system.map, ts=system.track, objs=system.objects,
                       last_fo=last_fo,
                       frame_id=jnp.int32(system.frame_id),
                       key=jax.random.PRNGKey(11))
