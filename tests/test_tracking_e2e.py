"""End-to-end RGBD tracking regression on synthetic ground-truthed scenes.

This is the rebuild's version of the reference's dataset-replay validation
(SURVEY.md §4): a golden-trajectory bound replaces eyeballing Pangolin.
"""

import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System


def small_cfg():
    return SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=4096))


@pytest.mark.slow
def test_rgbd_arc_ate():
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc", cache_dir=synthetic.DEFAULT_CACHE)
    s = System(small_cfg())
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp)
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.02, err          # 2 cm bound
    assert s.n_keyframes >= 3
    assert all(d["n_inliers"] > 50 for d in s.diags)


@pytest.mark.slow
def test_rgbd_forward_ate():
    seq = synthetic.generate_sequence(n_frames=15, seed=3, style="forward", cache_dir=synthetic.DEFAULT_CACHE)
    s = System(small_cfg())
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp)
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.03, err


@pytest.mark.slow
def test_depth_noise_robustness():
    seq = synthetic.generate_sequence(n_frames=12, seed=5, style="arc",
                                      depth_noise=0.01,
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(small_cfg())
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp)
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.05, err


@pytest.mark.slow
def test_rgbd_quantized_inputs_with_planes():
    """PNG-quantized inputs (8-bit gray, 16-bit depth) with the FULL config
    (planes + objects). Depth quantization makes the plane-merge gates
    borderline; this guards the sweep-count/plane-factor interaction that
    once cost 4 cm ATE (caught by driving the CLI, not the float tests)."""
    cfg = SystemConfig(capacity=MapCapacity(max_keyframes=64,
                                            max_points=8192))
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames:
        gray = np.round(f.gray * 255) / 255.0
        depth = np.round(f.depth * 5000) / 5000.0
        s.process_frame(gray.astype(np.float32), depth.astype(np.float32),
                        f.timestamp, boxes=f.boxes)
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.015, err


def test_trajectory_io_roundtrip(tmp_path):
    r = np.random.default_rng(0)
    from eao_fusion_tpu.ops import lie
    tcw = np.asarray(lie.se3_exp(r.normal(0, 0.3, (10, 6)).astype(np.float32)))
    ts = np.arange(10) / 30.0
    p = tmp_path / "traj.txt"
    tum.write_trajectory_tum(str(p), ts, tcw)
    ts2, twc = tum.read_groundtruth(str(p))
    tcw2 = np.asarray(lie.se3_inverse(twc))
    np.testing.assert_allclose(ts2, ts, atol=1e-5)
    err = tum.evaluate_ate_rpe(tcw2, tcw, align=False)
    assert err.ate_rmse < 1e-5


@pytest.mark.slow
def test_localization_only_mode_freezes_map():
    """`System::ActivateLocalizationMode` (`include/System.h:79-84`):
    tracking against a frozen map inserts no keyframes and leaves every
    map array bit-identical, while still producing accurate poses."""
    import jax

    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=4096),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:12]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    kf_before = s.n_keyframes
    map_before = jax.tree.map(np.asarray, s.map)

    s.activate_localization_mode()
    for f in seq.frames[12:]:
        s.process_frame(f.gray, f.depth, f.timestamp)

    assert s.n_keyframes == kf_before
    for name, before in map_before._asdict().items():
        after = np.asarray(getattr(s.map, name))
        assert np.array_equal(before, after), f"map field {name} changed"
    # pose quality preserved while localizing
    err = tum.evaluate_ate_rpe(s.trajectory_tcw()[3:], seq.gt_tcw()[3:20])
    assert err.ate_rmse < 0.03, err
    assert all(d["n_inliers"] >= 30 for d in s.diags[-8:])
