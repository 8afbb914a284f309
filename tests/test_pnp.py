"""PnP RANSAC (DLT hypotheses) tests."""

import numpy as np

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie, ransac

CAM = (535.4, 539.2, 320.1, 247.6)


def make_pnp(r, n=80, noise=0.5, outlier_frac=0.25):
    pw = np.stack([r.uniform(-2, 2, n), r.uniform(-1.5, 1.5, n),
                   r.uniform(2, 6, n)], axis=1).astype(np.float32)
    tau = np.r_[r.uniform(-0.2, 0.2, 3), r.uniform(-0.5, 0.5, 3)]
    pose = np.asarray(lie.se3_exp(jnp.asarray(tau.astype(np.float32))))
    xc = np.asarray(lie.se3_apply(jnp.asarray(pose), jnp.asarray(pw)))
    uv = np.asarray(lie.project(CAM, jnp.asarray(xc)))
    uv = uv + r.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    out = r.choice(n, n_out, replace=False)
    uv[out] += r.uniform(30, 120, (n_out, 2)).astype(np.float32) * \
        r.choice([-1, 1], (n_out, 2))
    return pw, uv.astype(np.float32), pose, out


def test_pnp_recovers_pose_with_outliers():
    r = np.random.default_rng(0)
    pw, uv, pose_gt, out = make_pnp(r)
    res = ransac.ransac_pnp(jnp.asarray(pw), jnp.asarray(uv),
                            jnp.ones(len(pw), bool), jax.random.PRNGKey(0),
                            cam=CAM)
    assert int(res.n_inliers) >= 45
    assert not np.asarray(res.inliers)[out].any()
    d = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(res.pose), jnp.asarray(pose_gt))))
    assert np.linalg.norm(d[:3]) < 0.02      # rotation
    assert np.linalg.norm(d[3:]) < 0.06      # translation


def test_pnp_clean_data_tight():
    r = np.random.default_rng(1)
    pw, uv, pose_gt, _ = make_pnp(r, noise=0.0, outlier_frac=0.0)
    res = ransac.ransac_pnp(jnp.asarray(pw), jnp.asarray(uv),
                            jnp.ones(len(pw), bool), jax.random.PRNGKey(1),
                            cam=CAM)
    assert int(res.n_inliers) == len(pw)
    d = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(res.pose), jnp.asarray(pose_gt))))
    assert np.linalg.norm(d) < 1e-3
