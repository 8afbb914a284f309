"""Stereo lane: epipolar matching accuracy + end-to-end stereo tracking
(the TPU counterpart of `System::TrackStereo`, `src/System.cc:196`, and
`Frame::ComputeStereoMatches`, `src/Frame.cc:841`)."""

import numpy as np
import pytest

from eao_fusion_tpu.config import (CameraConfig, MapCapacity, ORBConfig,
                                   SystemConfig)
from eao_fusion_tpu.frontend import stereo
from eao_fusion_tpu.io import synthetic, tum

CFG = SystemConfig(
    orb=ORBConfig(n_features=500, max_keypoints=512),
    capacity=MapCapacity(max_keyframes=64, max_points=8192),
    sensor="stereo", use_planes=False, use_objects=False)


def _seq(n):
    seq = synthetic.generate_sequence(n_frames=n, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    rights = synthetic.render_right_images(seq, seed=0,
                                           cache_dir=synthetic.DEFAULT_CACHE)
    return seq, rights


def test_stereo_depth_accuracy():
    """Matched stereo depths must agree with the renderer's ground-truth
    depth image at the keypoint pixels."""
    seq, rights = _seq(16)
    f = seq.frames[0]
    feats = stereo.extract_stereo_features(
        f.gray, rights[0], orb_cfg=CFG.orb, cam_cfg=CFG.camera)
    depth = np.asarray(feats.depth)
    uv = np.asarray(feats.uv)
    ok = depth > 0
    assert ok.sum() >= 150, f"only {ok.sum()} stereo matches"
    ui = np.clip(np.round(uv[ok, 0]).astype(int), 0, CFG.camera.width - 1)
    vi = np.clip(np.round(uv[ok, 1]).astype(int), 0, CFG.camera.height - 1)
    gt = f.depth[vi, ui]
    rel = np.abs(depth[ok] - gt) / np.maximum(gt, 1e-6)
    assert np.median(rel) < 0.05, float(np.median(rel))
    # uR convention: uR = uL - bf/z
    ur = np.asarray(feats.uright)[ok]
    assert np.all(ur < uv[ok, 0] + 1e-3)


@pytest.mark.slow
def test_stereo_tracking_e2e():
    """Track a 16-frame arc purely from the stereo pair (no depth image):
    initialization, motion-model + local-map tracking, and keyframe mapping
    must all run off matched stereo depth."""
    from eao_fusion_tpu.pipeline.system import System
    seq, rights = _seq(16)
    s = System(CFG)
    for f, r in zip(seq.frames, rights):
        s.process_frame(f.gray, right=r, timestamp=f.timestamp)
    assert s.n_keyframes >= 2
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.05, err
