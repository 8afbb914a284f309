"""Loop-closure integration: a 360° in-place spin revisits the starting
view after a ring of non-covisible keyframes — detection, Sim3, and
correction must run without corrupting the map."""

import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_spin_loop_sequence():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=8192),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=96, seed=4, style="spin",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp)
    # the spin must survive (tracking through all 4 walls) ...
    n_lost = sum(1 for d in s.diags if d["n_inliers"] < 20)
    assert n_lost <= 10, n_lost
    assert s.n_keyframes >= 10
    # ... and the full-circle trajectory must stay metric
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.08, err
    # loop closure may or may not fire depending on drift/consistency
    # gates; if it fired the map must still be consistent (checked by the
    # ATE bound above). Record for observability:
    print(f"loops closed: {s.n_loops_closed}, relocs: {s.n_relocalizations}")
