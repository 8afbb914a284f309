"""System.chunk_epilogue: the chunk-boundary protocol for steady chunked
mode (round-4 fr3-scale fixes). Covers the three behaviors that the first
production-length run proved load-bearing:

  * point-slot compaction fires in chunked mode (previously only the
    host-path keyframe branch compacted — the append-only `next_pt`
    cursor exhausted the table mid-sequence and point creation silently
    died, `mapping/map_state.py:177`);
  * a chunk that ends LOST relocalizes at the boundary (BoW + PnP on the
    last frame's features) instead of staying lost forever;
  * the LOST state itself freezes the pose/velocity inside the chunk
    (a near-zero-inlier GN step must not be integrated).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.pipeline import steady, tracking
from eao_fusion_tpu.pipeline.system import System


def _cfg():
    return SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=32, max_points=2048),
        use_planes=False, use_objects=False)


def _chunk_arrays(cfg, frames, lo, n):
    grays = jnp.asarray(np.stack([f.gray for f in frames[lo:lo + n]]))
    depths = jnp.asarray(np.stack([f.depth for f in frames[lo:lo + n]]))
    bxs = jnp.zeros((n, cfg.objects.max_objects_2d, 6), jnp.float32)
    tss = jnp.asarray([f.timestamp for f in frames[lo:lo + n]], jnp.float32)
    return grays, depths, bxs, tss


@pytest.mark.slow
def test_epilogue_compacts_points_and_remaps_tracking():
    cfg = _cfg()
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:8]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    st = steady.init_steady_state(s)
    # force the insertion cursor near capacity: the epilogue must compact
    st = st._replace(m=st.m._replace(next_pt=jnp.int32(
        int(0.95 * cfg.capacity.max_points))))
    kf_before = int(np.asarray(st.m.next_kf))
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 8, 4)
    st, _ = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    st = s.chunk_epilogue(st, kf_before)
    next_pt = int(np.asarray(st.m.next_pt))
    assert next_pt < int(0.9 * cfg.capacity.max_points), next_pt
    # tracking's cached associations must survive the remap: continue
    # tracking on the compacted map
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 12, 4)
    st, diag = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    assert int(np.asarray(st.ts.status)) == tracking.STATUS_OK
    assert int(np.asarray(diag["n_inliers"])[-1]) > 50


@pytest.mark.slow
def test_lost_chunk_freezes_pose_and_epilogue_relocalizes():
    cfg = _cfg()
    cfg = cfg.replace(tracking=cfg.tracking.__class__(
        **{**cfg.tracking.__dict__, "reset_if_lost_below_kfs": 0}))
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:12]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    st = steady.init_steady_state(s)
    pose_before = np.asarray(st.ts.pose)

    # a blackout chunk: noise frames, tracking must go LOST but the pose
    # must stay FINITE and close to the last good estimate (no velocity
    # integration of garbage)
    r = np.random.default_rng(0)
    noise = jnp.asarray(r.uniform(0, 1, (4,) + seq.frames[0].gray.shape)
                        .astype(np.float32))
    zdepth = jnp.zeros((4,) + seq.frames[0].depth.shape, jnp.float32)
    bxs = jnp.zeros((4, cfg.objects.max_objects_2d, 6), jnp.float32)
    tss = jnp.asarray([1.0, 1.03, 1.06, 1.09], jnp.float32)
    kf_before = int(np.asarray(st.m.next_kf))
    st, _ = steady.slam_chunk(st, noise, zdepth, bxs, tss, cfg=cfg)
    assert int(np.asarray(st.ts.status)) == tracking.STATUS_LOST
    drift = np.linalg.norm(np.asarray(st.ts.pose)[4:] - pose_before[4:])
    assert np.isfinite(np.asarray(st.ts.pose)).all()
    assert drift < 1e-3, f"LOST pose drifted {drift} m inside the chunk"

    # a revisit chunk on mapped views: the frozen pose lets the motion-
    # model search re-acquire INSIDE the chunk (the strongest recovery)
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 4, 4)
    st, diag = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    st = s.chunk_epilogue(st, kf_before)
    assert int(np.asarray(st.ts.status)) == tracking.STATUS_OK
    f = seq.frames[7]
    err = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(st.ts.pose), jnp.asarray(f.tcw))))
    assert np.linalg.norm(err[3:]) < 0.08, err


@pytest.mark.slow
def test_epilogue_relocalizes_kidnapped_camera():
    """Kidnapped-camera recovery through the epilogue's BoW+PnP path: the
    tracker is LOST with a far-off frozen pose but the chunk's last frame
    saw a mapped view — the boundary relocalization must snap back
    (reference per-frame counterpart: `src/Tracking.cc:999`)."""
    cfg = _cfg()
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:12]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    st = steady.init_steady_state(s)
    # run a chunk over mapped views so last_feats are real, then KIDNAP:
    # force LOST with a pose far from anywhere the map has seen
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 4, 4)
    kf_before = int(np.asarray(st.m.next_kf))
    st, _ = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    far = jnp.asarray(np.array([0.0, 1.0, 0.0, 0.0, 5.0, 5.0, 5.0],
                               np.float32))
    st = st._replace(ts=st.ts._replace(
        status=jnp.int32(tracking.STATUS_LOST), pose=far, last_pose=far))
    st = s.chunk_epilogue(st, kf_before)
    assert s.n_relocalizations >= 1
    assert int(np.asarray(st.ts.status)) == tracking.STATUS_OK
    # relocalized pose must match the last chunk frame's GT
    f = seq.frames[7]
    err = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(st.ts.pose), jnp.asarray(f.tcw))))
    assert np.linalg.norm(err[3:]) < 0.08, err
