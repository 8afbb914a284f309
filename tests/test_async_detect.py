"""Asynchronous chunk-boundary loop detection (round-4 verdict item 4).

The reference's LoopClosing thread wakes every 3 ms and detects on each
keyframe the moment it is created (`src/LoopClosing.cc:57-88`). The
chunked steady mode's TPU analogue: `chunk_epilogue` DISPATCHES the fused
detection program for chunk k's keyframes without pulling the result
(`LoopCloser.dispatch_detect`), lets it overlap chunk k+1's execution,
and HARVESTS it at boundary k+1 (`LoopCloser.harvest_detect`) — so a loop
arising mid-chunk is corrected by the following boundary instead of the
same one, and the detection device time plus its tunnel round trip hide
behind the next chunk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import (CameraConfig, MapCapacity, ORBConfig,
                                   SystemConfig, TrackingConfig)
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline import steady
from eao_fusion_tpu.pipeline.system import System


def _chunk_arrays(cfg, frames, lo, n):
    grays = jnp.asarray(np.stack([f.gray for f in frames[lo:lo + n]]))
    depths = jnp.asarray(np.stack([f.depth for f in frames[lo:lo + n]]))
    bxs = jnp.zeros((n, cfg.objects.max_objects_2d, 6), jnp.float32)
    tss = jnp.asarray([f.timestamp for f in frames[lo:lo + n]], jnp.float32)
    return grays, depths, bxs, tss


def test_pending_detection_flow():
    """Plumbing: an epilogue that inserted keyframes leaves a pending
    handle for exactly those slots; the next epilogue harvests it and
    dispatches a fresh one; the blocking flush clears it."""
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=32, max_points=4096),
        tracking=TrackingConfig(max_frames_between_kf=3),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:8]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    st = steady.init_steady_state(s)
    s._pending_detect = None

    kf_before = int(np.asarray(st.m.next_kf))
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 8, 6)
    st, _ = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    st = s.chunk_epilogue(st, kf_before)
    kf_after = s.n_keyframes
    assert kf_after > kf_before
    assert s._pending_detect is not None
    assert s._pending_detect["slots"] == list(range(kf_before, kf_after))

    kf_before2 = s.next_kf_hint
    g, d, b, t = _chunk_arrays(cfg, seq.frames, 14, 6)
    st, _ = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
    st = s.chunk_epilogue(st, kf_before2)
    # previous pending harvested; a fresh one covers this chunk's inserts
    if s.n_keyframes > kf_before2:
        assert s._pending_detect is not None
        assert s._pending_detect["slots"] == list(
            range(kf_before2, s.n_keyframes))
    # the blocking flush (trajectory/checkpoint reads) drains it
    s._poll_gba(blocking=True)
    assert s._pending_detect is None


@pytest.mark.slow
def test_loop_corrected_by_following_boundary():
    """End-to-end: the 1.5-turn spin room driven in CHUNKED mode. The
    closure keyframe arises inside some chunk; the async protocol must
    close the loop at a LATER boundary than the one that inserted it
    (detection overlapped one chunk), and the corrected trajectory must
    stay tight — same accuracy bar as the serial test_loop_e2e."""
    cfg = SystemConfig(
        camera=CameraConfig(th_depth=70.0),
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=8192),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=144, seed=11, style="spin15",
                                      texture="aperiodic",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:8]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    st = steady.init_steady_state(s)
    chunk = 8
    closed_at = []          # (boundary index, kf range of the SAME chunk)
    kf_before = int(np.asarray(st.m.next_kf))
    for bi, lo in enumerate(range(8, 144 - chunk + 1, chunk)):
        g, d, b, t = _chunk_arrays(cfg, seq.frames, lo, chunk)
        st, _ = steady.slam_chunk(st, g, d, b, t, cfg=cfg)
        loops_before = s.n_loops_closed
        st = s.chunk_epilogue(st, kf_before)
        kf_before = s.next_kf_hint
        if s.n_loops_closed > loops_before:
            closed_at.append(bi)
    s._poll_gba(blocking=True)
    assert s.n_loops_closed >= 1, \
        f"no loop closed over {s.n_keyframes} keyframes (chunked async)"
    # deferred semantics: a closure harvested at boundary b was detected
    # on keyframes inserted by chunk b-1 (or earlier) — the pending
    # handle mechanism guarantees it; here we assert the e2e outcome
    gt = seq.gt_tcw()
    n = len(s.trajectory)
    corr = tum.evaluate_ate_rpe(s.trajectory_tcw(corrected=True)[3:n],
                                gt[3:n])
    assert corr.ate_rmse < 0.10, corr
