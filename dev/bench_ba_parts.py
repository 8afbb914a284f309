"""Per-component timing of bundle_adjust_coo's gn_iter at production local-BA
shape (C=32, Pw=2048, E=8192): residuals/Jacobians, Hcc, Hpp one-hot, A
gather + Schur, dense solve variants. Cumulative-prefix timings inside a
scan over damping values (tunnel dedup, in-graph)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    n_reps = 16
    t0 = time.time()
    import jax, jax.numpy as jnp
    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System
    from eao_fusion_tpu.solvers import ba
    from eao_fusion_tpu.ops import lie

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m = sys_.map
    cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            cfg.camera.bf)
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
    lut0 = jnp.full((m.max_pt,), -1, jnp.int32).at[
        jnp.where(wvalid, widx, m.max_pt)].set(
        jnp.arange(Pw, dtype=jnp.int32), mode="drop")
    obs_pt_dense = m.kf_pt_idx[kf_idx]
    pid_w = lut0[jnp.clip(obs_pt_dense, 0, None)]
    obs_ok = (m.kf_kp_valid[kf_idx] & (obs_pt_dense >= 0) & (pid_w >= 0)
              & (sel_valid & m.kf_valid[kf_idx])[:, None])
    flat_ok = obs_ok.reshape(-1)
    eidx = jnp.argsort(~flat_ok, stable=True)[:E]
    e_ok = flat_ok[eidx]
    lvl = m.kf_kp_level[kf_idx].reshape(-1)[eidx].astype(jnp.float32)
    prob = ba.BACooProblem(
        cam_pose=m.kf_pose[kf_idx], cam_valid=sel_valid & m.kf_valid[kf_idx],
        cam_fixed=fixed, pt_xyz=m.pt_xyz[widx], pt_valid=wvalid,
        obs_cam=(eidx // N).astype(jnp.int32),
        obs_pt=jnp.where(e_ok, pid_w.reshape(-1)[eidx], -1),
        obs_uv=m.kf_kp_uv[kf_idx].reshape(-1, 2)[eidx],
        obs_ur=m.kf_kp_uright[kf_idx].reshape(-1)[eidx],
        obs_inv_sigma2=cfg.orb.scale_factor ** (-2.0 * lvl),
        obs_valid=e_ok)
    log(f"[{time.time()-t0:.1f}s] problem C={C} Pw={Pw} E={E} "
        f"edges={int(jnp.sum(e_ok))} free={int(jnp.sum(prob.cam_valid & ~prob.cam_fixed))}")

    scfg = cfg.solver
    free_cam = (prob.cam_valid & (~prob.cam_fixed)).astype(jnp.float32)
    obs_ok0 = prob.obs_valid & (prob.obs_pt >= 0) & prob.cam_valid[prob.obs_cam]
    tgt0 = jnp.where(obs_ok0, prob.obs_pt, Pw)
    lut = jnp.full((C, Pw + 1), E, jnp.int32).at[
        prob.obs_cam, tgt0].set(jnp.arange(E, dtype=jnp.int32),
                                mode="drop")[:, :Pw]
    cam_onehot = (prob.obs_cam[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)
    pt_onehot = (tgt0[None, :] == jnp.arange(Pw, dtype=jnp.int32)[:, None]
                 ).astype(jnp.float32)
    def _pad_e(x):
        return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)
    cam_oh_T = cam_onehot.T
    pt_oh_T = pt_onehot.T

    active = obs_ok0
    lams = jnp.asarray(np.random.default_rng(0).uniform(1e-4, 1e-2, 16), jnp.float32)

    def timed(name, fn):
        @jax.jit
        def loop(lams):
            def body(acc, lam):
                return acc + fn(lam), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), lams)
            return acc
        out = loop(lams); jax.block_until_ready(out)
        t1 = time.time()
        out = loop(lams); jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:40s} {dt:8.3f} ms")
        return dt

    camohT = cam_onehot.T
    ptohT = (tgt0[:, None] == jnp.arange(Pw, dtype=jnp.int32)[None, :]
             ).astype(jnp.float32)
    gather_oh = (camohT, ptohT)

    def upto(stage):
        def f(lam):
            cam_pose = prob.cam_pose.at[:, 4].add(lam * 0.1)
            pt_xyz = prob.pt_xyz
            r, J_c, J_p, stereo, behind = ba._residuals_coo(
                cam_pose, pt_xyz, prob, cam5, gather_oh)
            if stage == 0:
                return jnp.sum(r)
            c2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
            delta2 = jnp.where(stereo, scfg.chi2_stereo, scfg.chi2_mono)
            w_rob = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
            w = (prob.obs_inv_sigma2 * w_rob * active.astype(jnp.float32)
                 * (1.0 - behind.astype(jnp.float32)))
            fm = jnp.dot(camohT, free_cam[:, None],
                         preferred_element_type=jnp.float32)
            J_cf = J_c * fm[:, :, None]
            J_all = jnp.concatenate([J_cf, J_p], axis=-1)
            G = jnp.einsum("eri,e,erj->eij", J_all, w, J_all,
                           preferred_element_type=jnp.float32)
            g = jnp.einsum("eri,e,er->ei", J_all, w, r,
                           preferred_element_type=jnp.float32)
            pay_c = jnp.concatenate(
                [G[:, :6, :6].reshape(E, 36), g[:, :6]], axis=-1)
            acc_c = jnp.dot(cam_onehot, pay_c,
                            preferred_element_type=jnp.float32)
            Hcc = acc_c[:, :36].reshape(C, 6, 6)
            bc = -acc_c[:, 36:]
            if stage == 1:
                return jnp.sum(Hcc) + jnp.sum(bc)
            pay_p = jnp.concatenate(
                [G[:, 6:, 6:].reshape(E, 9), g[:, 6:]], axis=-1)
            acc = jnp.dot(pt_onehot, pay_p, preferred_element_type=jnp.float32)
            Hpp = acc[:, :9].reshape(Pw, 3, 3)
            bp = -acc[:, 9:]
            Hpp = Hpp + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)
            Hpp_inv = jnp.where(prob.pt_valid[:, None, None], ba._inv3x3(Hpp), 0.0)
            if stage == 2:
                return jnp.sum(Hpp_inv) + jnp.sum(bp)
            Y = G[:, :6, 6:]
            A = _pad_e(Y)[lut]
            if stage == 3:
                return jnp.sum(A)
            AH = jnp.einsum("cpij,pjk->cpik", A, Hpp_inv)
            AH2 = AH.transpose(0, 2, 1, 3).reshape(C * 6, Pw * 3)
            A2 = A.transpose(0, 2, 1, 3).reshape(C * 6, Pw * 3)
            S = -jnp.dot(AH2, A2.T, preferred_element_type=jnp.float32
                         ).reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
            rhs = bc - (AH2 @ bp.reshape(-1)).reshape(C, 6)
            S = S * free_cam[:, None, None, None] * free_cam[None, :, None, None]
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                jnp.eye(6) * ((1.0 - free_cam)[:, None, None]) + jnp.eye(6) * lam)
            rhs = rhs * free_cam[:, None]
            if stage == 4:
                return jnp.sum(S) + jnp.sum(rhs)
            M = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            delta_c = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(C, 6)
            if stage == 5:
                return jnp.sum(delta_c)
            t = bp - (A2.T @ delta_c.reshape(-1)).reshape(Pw, 3)
            delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, t)
            cp2 = jax.vmap(lie.se3_retract)(cam_pose, delta_c)
            return jnp.sum(cp2) + jnp.sum(delta_p)
        return f

    names = ["residuals+J", "+Hcc/bc", "+Hpp onehot+inv", "+A gather",
             "+Schur S/rhs", "+dense solve", "+backsub/retract"]
    prev = 0.0
    for i, nm in enumerate(names):
        dt = timed(f"upto {nm}", upto(i))
        log(f"   marginal {nm}: {dt-prev:.3f} ms")
        prev = dt

if __name__ == "__main__":
    main()
