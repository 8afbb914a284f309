"""Attribute bundle_adjust_coo cost: per-iteration marginal, dense-solve
cost, gather (A/Gp) cost. Scan-based over varied damping (tunnel dedup).

Usage: python dev/bench_ba_iter.py [n_reps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System
    from eao_fusion_tpu.solvers import ba

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m = sys_.map
    cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            cfg.camera.bf)

    # build the same COO problem local_mapping_step builds (newest valid
    # keyframe — fixed slots can be culled by multi-victim KF culling)
    kf_valid_np = np.asarray(m.kf_valid)
    kf_slot = jnp.int32(int(np.where(kf_valid_np)[0][-1]))
    n_fixed = 8
    n_local = cfg.capacity.max_local_ba_kfs - n_fixed
    kf_idx, sel_valid, fixed, local_pts = lm._select_window(
        m, kf_slot, n_local, n_fixed)
    N = m.kf_pt_idx.shape[1]
    C = kf_idx.shape[0]
    Pw = min(cfg.capacity.max_local_ba_points, m.max_pt)
    E = min(cfg.capacity.max_local_ba_obs, C * N)
    sel = m.pt_valid & local_pts
    widx = jnp.argsort(~sel, stable=True)[:Pw]
    wvalid = sel[widx]
    lut = jnp.full((m.max_pt,), -1, jnp.int32).at[
        jnp.where(wvalid, widx, m.max_pt)].set(
        jnp.arange(Pw, dtype=jnp.int32), mode="drop")
    obs_pt_dense = m.kf_pt_idx[kf_idx]
    pid_w = lut[jnp.clip(obs_pt_dense, 0, None)]
    obs_ok = (m.kf_kp_valid[kf_idx] & (obs_pt_dense >= 0) & (pid_w >= 0)
              & (sel_valid & m.kf_valid[kf_idx])[:, None])
    flat_ok = obs_ok.reshape(-1)
    eidx = jnp.argsort(~flat_ok, stable=True)[:E]
    e_ok = flat_ok[eidx]
    lvl = m.kf_kp_level[kf_idx].reshape(-1)[eidx].astype(jnp.float32)
    prob = ba.BACooProblem(
        cam_pose=m.kf_pose[kf_idx],
        cam_valid=sel_valid & m.kf_valid[kf_idx],
        cam_fixed=fixed,
        pt_xyz=m.pt_xyz[widx],
        pt_valid=wvalid,
        obs_cam=(eidx // N).astype(jnp.int32),
        obs_pt=jnp.where(e_ok, pid_w.reshape(-1)[eidx], -1),
        obs_uv=m.kf_kp_uv[kf_idx].reshape(-1, 2)[eidx],
        obs_ur=m.kf_kp_uright[kf_idx].reshape(-1)[eidx],
        obs_inv_sigma2=cfg.orb.scale_factor ** (-2.0 * lvl),
        obs_valid=e_ok,
    )
    log(f"[{time.time()-t0:.1f}s] problem: C={C} Pw={Pw} E={E} "
        f"valid_edges={int(jnp.sum(e_ok))}")

    lams = jnp.asarray(np.random.default_rng(0).uniform(
        1e-4, 1e-2, size=n_reps), jnp.float32)

    def timed(name, fn):
        @jax.jit
        def loop(lams):
            def body(acc, lam):
                out = fn(lam)
                return acc + out, 0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), lams)
            return acc
        out = loop(lams)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(lams)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:44s} {dt:8.3f} ms")
        return dt

    def full_ba(it1, it2):
        def f(lam):
            # perturb the initial pose by lam so each scan step differs
            p = prob._replace(cam_pose=prob.cam_pose.at[:, 4].add(lam * 0.1))
            res = ba.bundle_adjust_coo(p, None, cam=cam5, cfg=cfg.solver,
                                       n_iters1=it1, n_iters2=it2)
            return res.chi2
        return f

    timed("full BA 5+10 (stall exit)", full_ba(5, 10))
    timed("full BA 2+4", full_ba(2, 4))
    timed("full BA 1+1", full_ba(1, 1))
    timed("full BA 0+0 (chi2 evals only)", full_ba(0, 0))

    # isolate the dense solve
    key = jax.random.PRNGKey(0)
    Ssym = jax.random.normal(key, (C * 6, C * 6)) * 0.01
    Ssym = Ssym @ Ssym.T + jnp.eye(C * 6)
    rhsv = jax.random.normal(key, (C * 6,))

    def solve_lu(lam):
        M = Ssym + lam * jnp.eye(C * 6)
        return jnp.sum(jnp.linalg.solve(M, rhsv))

    def solve_cho(lam):
        M = Ssym + lam * jnp.eye(C * 6)
        Lc = jnp.linalg.cholesky(M)
        y = jax.scipy.linalg.solve_triangular(Lc, rhsv, lower=True)
        x = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)
        return jnp.sum(x)

    def solve_cg(lam):
        M = Ssym + lam * jnp.eye(C * 6)
        dinv = 1.0 / jnp.diag(M)

        def body(carry, _):
            x, r, z, p = carry
            Mp = M @ p
            a = jnp.dot(r, z) / jnp.maximum(jnp.dot(p, Mp), 1e-20)
            x2 = x + a * p
            r2 = r - a * Mp
            z2 = dinv * r2
            b = jnp.dot(r2, z2) / jnp.maximum(jnp.dot(r, z), 1e-20)
            return (x2, r2, z2, z2 + b * p), 0

        x0 = jnp.zeros_like(rhsv)
        z0 = dinv * rhsv
        (x, _, _, _), _ = jax.lax.scan(body, (x0, rhsv, z0, z0),
                                       None, length=24)
        return jnp.sum(x)

    timed("dense solve LU 192", solve_lu)
    timed("dense solve Cholesky 192", solve_cho)
    timed("jacobi-CG x24 192", solve_cg)


if __name__ == "__main__":
    main()
