"""Auxiliary subsystems: IMU gravity alignment, checkpoint/resume,
keyframe culling, isolation forest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.io import imu
from eao_fusion_tpu.ops import lie


class TestImu:
    def test_gravity_alignment_z(self):
        """After alignment, the measured accel must map to the +z world
        axis (gravity_axis=3)."""
        a = np.array([0.3, -9.5, 1.2])
        pose = imu.gravity_init_pose(a, gravity_axis=3)
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(pose[:4])))
        g_world = R.T @ (a / np.linalg.norm(a))  # columns are world axes
        np.testing.assert_allclose(g_world, [0, 0, 1], atol=1e-6)
        assert abs(np.linalg.det(R) - 1) < 1e-5

    def test_gravity_alignment_y(self):
        a = np.array([0.1, 9.8, 0.2])
        pose = imu.gravity_init_pose(a, gravity_axis=2)
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(pose[:4])))
        g_world = R.T @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(g_world, [0, 1, 0], atol=1e-6)

    def test_sync_interpolates(self):
        samples = [imu.ImuSample(t, np.array([t, 0, 0]), np.array([0, t, 0]))
                   for t in (0.0, 0.1, 0.2)]
        s = imu.sync_imu(samples, 0.15)
        assert s is not None
        np.testing.assert_allclose(s.accel[0], 0.15, atol=1e-9)

    def test_sync_rejects_stale(self):
        samples = [imu.ImuSample(0.0, np.zeros(3), np.zeros(3))]
        assert imu.sync_imu(samples, 0.5) is None

    def test_accelerometer_file_to_init_pose(self, tmp_path):
        """The --imu CLI path: accelerometer.txt -> synced sample ->
        gravity-aligned Tcw whose world z is anti-parallel to gravity."""
        from eao_fusion_tpu.io import tum
        from eao_fusion_tpu.ops import lie
        import jax.numpy as jnp

        p = tmp_path / "accelerometer.txt"
        # camera tilted: gravity reads along a skew direction
        p.write_text("# t ax ay az\n"
                     "0.00 1.0 8.5 3.0\n"
                     "0.05 1.0 8.7 3.1\n"
                     "0.10 1.0 8.9 3.2\n")
        samples = tum.read_accelerometer(str(p))
        assert len(samples) == 3
        s = imu.sync_imu(samples, 0.05)
        pose = imu.gravity_init_pose(s.accel, gravity_axis=3)
        # world z axis expressed in camera coords is R[:, 2]; it must be
        # parallel to the measured accel (which points opposite gravity)
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(pose[:4])))
        a = s.accel / np.linalg.norm(s.accel)
        np.testing.assert_allclose(R[:, 2], a, atol=1e-5)


class TestCheckpoint:
    @pytest.mark.slow
    def test_roundtrip(self, tmp_path):
        from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
        from eao_fusion_tpu.io import checkpoint, synthetic
        from eao_fusion_tpu.pipeline.system import System

        cfg = SystemConfig(
            orb=ORBConfig(n_features=300, max_keypoints=256),
            capacity=MapCapacity(max_keyframes=32, max_points=2048),
            use_planes=False, use_objects=False, use_loop_closing=False)
        seq = synthetic.generate_sequence(n_frames=8, seed=0, style="arc",
                                          cache_dir=synthetic.DEFAULT_CACHE)
        s = System(cfg)
        for f in seq.frames[:5]:
            s.process_frame(f.gray, f.depth, f.timestamp)
        p = str(tmp_path / "ckpt.npz")
        checkpoint.save_state(p, s)

        s2 = System(cfg)
        checkpoint.load_state(p, s2)
        assert s2.frame_id == s.frame_id
        assert s2.n_keyframes == s.n_keyframes
        np.testing.assert_allclose(np.asarray(s2.map.pt_xyz),
                                   np.asarray(s.map.pt_xyz))
        # resumed system keeps tracking (threshold leaves headroom for
        # duplicate-fusion variance: at 256-keypoint budget the nn=10
        # SearchInNeighbors pass merges a few more points than nn=2 did)
        for f in seq.frames[5:]:
            s2.process_frame(f.gray, f.depth, f.timestamp)
        assert s2.diags[-1]["n_inliers"] > 33


class TestIsolationForest:
    def test_flags_outliers(self):
        from eao_fusion_tpu.objects import iforest
        r = np.random.default_rng(0)
        pts = np.zeros((128, 3), np.float32)
        pts[:100] = r.normal(0, 0.1, (100, 3))       # dense cluster
        pts[100:110] = r.uniform(2, 4, (10, 3))      # far outliers
        valid = np.zeros(128, bool)
        valid[:110] = True
        s = np.asarray(iforest.anomaly_scores(
            jnp.asarray(pts), jnp.asarray(valid), jax.random.PRNGKey(0)))
        assert s[100:110].mean() > s[:100].mean() + 0.1
        cull = np.asarray(iforest.cull_mask(
            jnp.asarray(pts), jnp.asarray(valid), jax.random.PRNGKey(1), 0.6))
        assert cull[100:110].sum() >= 7      # most outliers culled
        assert cull[:100].sum() <= 10        # few inliers lost
        assert not cull[110:].any()


def test_prewarm_leaves_state_unchanged():
    """System.prewarm compiles the episodic program variants without
    mutating the live map/tracking state (round-4 weak #3: the compile
    tail moves to startup)."""
    import jax
    import jax.numpy as jnp
    from eao_fusion_tpu.config import (MapCapacity, ORBConfig, SystemConfig,
                                       TrackingConfig)
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline.system import System

    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=16, max_points=4096,
                             max_local_ba_kfs=16),
        tracking=TrackingConfig(max_frames_between_kf=3),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=8, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, timestamp=f.timestamp)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), s.map)
    dt = s.prewarm(evict_buckets=(8,), essential_edge_buckets=(64,))
    assert dt >= 0.0
    after = s.map
    for name in before._fields:
        np.testing.assert_array_equal(np.asarray(getattr(after, name)),
                                      np.asarray(getattr(before, name)),
                                      err_msg=name)
