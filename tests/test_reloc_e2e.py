"""Relocalization end-to-end: inject a tracking loss (blank frames), then
verify the system recovers its pose via BoW retrieval + RANSAC + pose GN."""

import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_rgbd_relocalization_after_blackout():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=4096),
        use_planes=False, use_objects=False)
    # disable auto-reset so the loss path exercises relocalization
    cfg = cfg.replace(tracking=cfg.tracking.__class__(
        **{**cfg.tracking.__dict__, "reset_if_lost_below_kfs": 0}))
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:12]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    assert int(s.track.status) == 1

    # blackout: three frames of noise -> tracking must fail
    r = np.random.default_rng(0)
    for k in range(3):
        noise = r.uniform(0, 1, seq.frames[0].gray.shape).astype(np.float32)
        s.process_frame(noise, np.zeros_like(seq.frames[0].depth),
                        0.5 + 0.03 * k)

    # revisit a mapped view: the recovery cascade (reference-KF descriptor
    # fallback, then BoW relocalization) must restore the pose
    f = seq.frames[8]
    pose = s.process_frame(f.gray, f.depth, f.timestamp + 1.0)
    d = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(np.asarray(pose)), np.asarray(f.tcw))))
    assert np.linalg.norm(d[3:]) < 0.05, (d, s.n_relocalizations)
    assert np.linalg.norm(d[:3]) < 0.05, (d, s.n_relocalizations)

    # and continue tracking normally afterwards
    for f in seq.frames[9:12]:
        s.process_frame(f.gray, f.depth, f.timestamp + 1.0)
    assert s.diags[-1]["n_inliers"] > 80
