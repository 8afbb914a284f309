"""Pose GN solver tests on synthetic observations."""

import numpy as np

import jax.numpy as jnp

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers import pose_opt

CAM = (535.4, 539.2, 320.1, 247.6, 40.0)
CFG = SolverConfig()


def make_problem(r, n=200, noise=0.3, outlier_frac=0.0, stereo=True):
    pts = np.stack([r.uniform(-2, 2, n), r.uniform(-1.5, 1.5, n),
                    r.uniform(2, 6, n)], axis=1).astype(np.float32)
    tau = np.concatenate([r.uniform(-0.1, 0.1, 3),
                          r.uniform(-0.3, 0.3, 3)]).astype(np.float32)
    pose_gt = np.asarray(lie.se3_exp(tau))
    xc = np.asarray(lie.se3_apply(pose_gt, pts))
    fx, fy, cx, cy, bf = CAM
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], axis=1)
    ur = uv[:, 0] - bf / xc[:, 2]
    uv += r.normal(0, noise, uv.shape)
    ur += r.normal(0, noise, ur.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        sel = r.choice(n, n_out, replace=False)
        uv[sel] += r.uniform(20, 80, (n_out, 2)) * r.choice([-1, 1], (n_out, 2))
    obs = pose_opt.PoseObs(
        pts_w=jnp.asarray(pts), uv=jnp.asarray(uv.astype(np.float32)),
        uright=jnp.asarray(ur.astype(np.float32)) if stereo
        else jnp.full((n,), -1.0, jnp.float32),
        inv_sigma2=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool))
    return pose_gt, obs, sel if n_out else np.array([], int)


def pose_err(a, b):
    d = np.asarray(lie.se3_compose(lie.se3_inverse(a), jnp.asarray(b)))
    return np.linalg.norm(np.asarray(lie.se3_log(d)))


class TestPoseOpt:
    def test_recovers_from_perturbation(self):
        r = np.random.default_rng(0)
        pose_gt, obs, _ = make_problem(r, noise=0.0)
        pose0 = np.asarray(lie.se3_retract(
            jnp.asarray(pose_gt),
            jnp.asarray(np.r_[0.02, -0.03, 0.01, 0.05, -0.08, 0.1], np.float32)))
        res = pose_opt.optimize_pose(jnp.asarray(pose0), obs, cam=CAM, cfg=CFG)
        assert pose_err(res.pose, pose_gt) < 1e-3
        assert int(res.n_inliers) == 200

    def test_robust_to_outliers(self):
        r = np.random.default_rng(1)
        pose_gt, obs, out_idx = make_problem(r, noise=0.3, outlier_frac=0.3)
        pose0 = np.asarray(lie.se3_retract(
            jnp.asarray(pose_gt),
            jnp.asarray(np.r_[0.01, 0.02, -0.01, 0.05, 0.05, -0.05], np.float32)))
        res = pose_opt.optimize_pose(jnp.asarray(pose0), obs, cam=CAM, cfg=CFG)
        assert pose_err(res.pose, pose_gt) < 5e-3
        # outliers excluded
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        assert inl.sum() > 120

    def test_mono_edges(self):
        r = np.random.default_rng(2)
        pose_gt, obs, _ = make_problem(r, noise=0.2, stereo=False)
        pose0 = np.asarray(lie.se3_retract(
            jnp.asarray(pose_gt),
            jnp.asarray(np.r_[-0.02, 0.01, 0.02, -0.1, 0.06, 0.04], np.float32)))
        res = pose_opt.optimize_pose(jnp.asarray(pose0), obs, cam=CAM, cfg=CFG)
        assert pose_err(res.pose, pose_gt) < 5e-3

    def test_pallas_kernel_parity(self):
        """The fused Pallas kernel (interpret mode on CPU) must agree with
        the XLA reference path — same pose, same inlier set — on a
        1024-observation problem with outliers, mono+stereo edges mixed,
        and plane factors."""
        from eao_fusion_tpu.solvers import pose_opt_pallas

        r = np.random.default_rng(7)
        pose_gt, obs, _ = make_problem(r, n=1024, noise=0.3,
                                       outlier_frac=0.2)
        # mix in mono edges + some invalid slots
        ur = np.asarray(obs.uright).copy()
        ur[::3] = -1.0
        valid = np.ones((1024,), bool)
        valid[::17] = False
        obs = obs._replace(uright=jnp.asarray(ur), valid=jnp.asarray(valid))

        planes_w = np.array([[0, -1, 0, 1.2], [0, 0, -1, 4.5]], np.float32)
        R = np.asarray(lie.quat_to_rotmat(pose_gt[:4]))
        t = pose_gt[4:7]
        n_c = planes_w[:, :3] @ R.T
        d_c = planes_w[:, 3] - n_c @ t
        meas = np.concatenate([n_c, d_c[:, None]], axis=1).astype(np.float32)
        pobs = pose_opt.PlaneObs(plane_w=jnp.asarray(planes_w),
                                 meas_c=jnp.asarray(meas),
                                 valid=jnp.ones((2,), bool))

        pose0 = jnp.asarray(np.asarray(lie.se3_retract(
            jnp.asarray(pose_gt),
            jnp.asarray(np.r_[0.02, -0.01, 0.02, 0.06, -0.04, 0.05],
                        np.float32))))
        for p in (None, pobs):
            ref = pose_opt._optimize_pose_xla(pose0, obs, p, cam=CAM,
                                              cfg=CFG)
            ker = pose_opt_pallas.optimize_pose_pallas(
                pose0, obs, p, cam=CAM, cfg=CFG, interpret=True)
            assert pose_err(ref.pose, ker.pose) < 1e-3, \
                (np.asarray(ref.pose), np.asarray(ker.pose))
            ri = np.asarray(ref.inliers)
            ki = np.asarray(ker.inliers)
            assert (ri == ki).mean() > 0.995, (ri.sum(), ki.sum())
            assert abs(int(ref.n_inliers) - int(ker.n_inliers)) <= 5

    def test_plane_constraints_tighten(self):
        """With only 3 far points + 2 planes, plane edges must constrain the
        solution (rank from planes)."""
        r = np.random.default_rng(3)
        pose_gt, obs, _ = make_problem(r, n=16, noise=0.1)
        planes_w = np.array([[0, -1, 0, 1.2], [0, 0, -1, 4.5]], np.float32)
        # measured camera-frame planes under GT pose
        R = np.asarray(lie.quat_to_rotmat(pose_gt[:4]))
        t = pose_gt[4:7]
        n_c = planes_w[:, :3] @ R.T
        d_c = planes_w[:, 3] - n_c @ t
        meas = np.concatenate([n_c, d_c[:, None]], axis=1).astype(np.float32)
        pobs = pose_opt.PlaneObs(plane_w=jnp.asarray(planes_w),
                                 meas_c=jnp.asarray(meas),
                                 valid=jnp.ones((2,), bool))
        pose0 = np.asarray(lie.se3_retract(
            jnp.asarray(pose_gt),
            jnp.asarray(np.r_[0.03, -0.02, 0.01, 0.08, -0.05, 0.06], np.float32)))
        res = pose_opt.optimize_pose(jnp.asarray(pose0), obs, pobs,
                                     cam=CAM, cfg=CFG)
        assert pose_err(res.pose, pose_gt) < 5e-3
