"""TPU timing: XLA pose optimizer vs the fused Pallas kernel (scan over
varied inputs; chained poses so iterations are serial like production)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers import pose_opt, pose_opt_pallas

CAM = (535.4, 539.2, 320.1, 247.6, 40.0)
CFG = SolverConfig()
print(f"devices={jax.devices()}", file=sys.stderr)

r = np.random.default_rng(0)
n = 1024
pts = np.stack([r.uniform(-2, 2, n), r.uniform(-1.5, 1.5, n),
                r.uniform(2, 6, n)], axis=1).astype(np.float32)
pose_gt = np.asarray(lie.se3_exp(jnp.asarray(
    np.r_[0.05, -0.02, 0.01, 0.1, -0.2, 0.15].astype(np.float32))))
xc = np.asarray(lie.se3_apply(jnp.asarray(pose_gt), jnp.asarray(pts)))
fx, fy, cx, cy, bf = CAM
uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
               fy * xc[:, 1] / xc[:, 2] + cy], axis=1).astype(np.float32)
ur = (uv[:, 0] - bf / xc[:, 2]).astype(np.float32)
uv += r.normal(0, 0.3, uv.shape).astype(np.float32)
obs = pose_opt.PoseObs(pts_w=jnp.asarray(pts), uv=jnp.asarray(uv),
                       uright=jnp.asarray(ur),
                       inv_sigma2=jnp.ones((n,), jnp.float32),
                       valid=jnp.ones((n,), bool))
planes_w = np.array([[0, -1, 0, 1.2], [0, 0, -1, 4.5]], np.float32)
R = np.asarray(lie.quat_to_rotmat(jnp.asarray(pose_gt[:4])))
n_c = planes_w[:, :3] @ R.T
d_c = planes_w[:, 3] - n_c @ pose_gt[4:7]
meas = np.concatenate([n_c, d_c[:, None]], axis=1).astype(np.float32)
pobs = pose_opt.PoseObs  # silence linters
pobs = pose_opt.PlaneObs(plane_w=jnp.asarray(planes_w),
                         meas_c=jnp.asarray(meas),
                         valid=jnp.ones((2,), bool))
pose0 = jnp.asarray(pose_gt)

T = 16


def scan_time(name, fn, n_rep=8):
    @jax.jit
    def run(p0):
        def body(p, i):
            res = fn(p + 0.0, i)
            return res.pose, None
        p, _ = jax.lax.scan(body, p0, jnp.arange(T))
        return p
    out = run(pose0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run(pose0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n_rep * T) * 1000
    print(f"{name:40s} {dt:7.3f} ms/call")


def perturb(p, i):
    tau = jnp.sin(jnp.arange(6, dtype=jnp.float32) * (1.0 + i)) * 0.02
    return lie.se3_retract(p, tau)


scan_time("xla optimize_pose",
          lambda p, i: pose_opt._optimize_pose_xla(
              perturb(p, i), obs, cam=CAM, cfg=CFG))
scan_time("pallas optimize_pose",
          lambda p, i: pose_opt_pallas.optimize_pose_pallas(
              perturb(p, i), obs, cam=CAM, cfg=CFG))
scan_time("xla optimize_pose (+planes)",
          lambda p, i: pose_opt._optimize_pose_xla(
              perturb(p, i), obs, pobs, cam=CAM, cfg=CFG))
scan_time("pallas optimize_pose (+planes)",
          lambda p, i: pose_opt_pallas.optimize_pose_pallas(
              perturb(p, i), obs, pobs, cam=CAM, cfg=CFG))
