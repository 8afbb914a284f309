"""End-to-end monocular SLAM regression (scale-aligned ATE)."""

import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_mono_arc_ate():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=4096),
        sensor="mono", use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, None, f.timestamp)
    assert s.n_keyframes >= 3
    assert int(s.map.next_pt) > 250
    est = s.trajectory_tcw()
    gt = seq.gt_tcw()
    # skip pre-initialization identity poses
    nonid = [i for i, p in enumerate(s.trajectory)
             if not np.allclose(p, [1, 0, 0, 0, 0, 0, 0])]
    i0 = nonid[0] if nonid else 0
    err = tum.evaluate_ate_rpe(est[i0:], gt[i0:], align=True, with_scale=True)
    assert err.ate_rmse < 0.04, err
