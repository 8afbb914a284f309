"""Distributed-BA scaling measurement on the virtual CPU mesh.

Strong-scaling proxy for the >= 0.7 multi-host efficiency target
(BASELINE.md): a fixed global-BA problem solved on 1/2/4/8 mesh devices.
On real pod slices the psum rides ICI; here the XLA CPU collective stands
in (pessimistic for TPU). Run via:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python dev/bench_dist_ba.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SolverConfig
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.parallel import dist_ba, mesh as mesh_util
from eao_fusion_tpu.solvers import ba

CAM = (535.4, 539.2, 320.1, 247.6, 40.0)


def make_problem(n_cams=32, n_pts=8192, n_slots=512, seed=0):
    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(-3, 3, n_pts), r.uniform(-2, 2, n_pts),
                    r.uniform(3, 9, n_pts)], axis=1).astype(np.float32)
    cams = []
    for i in range(n_cams):
        s = i / max(n_cams - 1, 1)
        tau = np.r_[0.02 * s, -0.4 * s, 0, 0.8 * s, 0.05 * s, 0.2 * s]
        cams.append(np.asarray(lie.se3_exp(jnp.asarray(tau.astype(np.float32)))))
    cams = np.stack(cams)
    fx, fy, cx, cy, bf = CAM
    obs_pt = np.full((n_cams, n_slots), -1, np.int32)
    obs_uv = np.zeros((n_cams, n_slots, 2), np.float32)
    obs_ur = np.full((n_cams, n_slots), -1.0, np.float32)
    for c in range(n_cams):
        xc = np.asarray(lie.se3_apply(jnp.asarray(cams[c]), jnp.asarray(pts)))
        uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                       fy * xc[:, 1] / xc[:, 2] + cy], axis=1)
        vis = np.where((xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640)
                       & (uv[:, 1] > 0) & (uv[:, 1] < 480))[0]
        ids = r.choice(vis, min(n_slots, len(vis)), replace=False)
        k = len(ids)
        obs_pt[c, :k] = ids
        obs_uv[c, :k] = uv[ids] + r.normal(0, 0.3, (k, 2))
        obs_ur[c, :k] = uv[ids, 0] - bf / xc[ids, 2]
    cams_n = cams.copy()
    for c in range(1, n_cams):
        cams_n[c] = np.asarray(lie.se3_retract(
            jnp.asarray(cams[c]),
            jnp.asarray(np.r_[r.normal(0, 0.01, 3), r.normal(0, 0.03, 3)]
                        .astype(np.float32))))
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    return ba.BAProblem(
        cam_pose=jnp.asarray(cams_n), cam_valid=jnp.ones(n_cams, bool),
        cam_fixed=jnp.asarray(fixed),
        pt_xyz=jnp.asarray(pts + r.normal(0, 0.02, pts.shape)
                           .astype(np.float32)),
        pt_valid=jnp.ones(n_pts, bool),
        obs_pt=jnp.asarray(obs_pt), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((n_cams, n_slots), jnp.float32),
        obs_valid=jnp.asarray(obs_pt >= 0))


def main():
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")
    prob = make_problem()
    cfg = SolverConfig()
    results = {}
    for nd in (1, 2, 4, 8):
        if nd > len(devices):
            break
        mesh = mesh_util.make_mesh(n_landmark=nd, devices=devices[:nd])
        run = lambda: dist_ba.distributed_bundle_adjust(
            prob, mesh, cam=CAM, cfg=cfg, n_iters=8)
        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        results[nd] = dt
        eff = results[1] / (dt * nd) if 1 in results else 1.0
        print(f"devices={nd}: {dt*1000:8.1f} ms/solve  "
              f"speedup={results[1]/dt:5.2f}x  efficiency={eff:.2f}")


if __name__ == "__main__":
    main()
