"""Attribute local_mapping_step cost: no-op baseline-subtracted scan
timing of each sub-stage (cull_points, fuse_neighbors, window+compact,
BA solve, epilogue).
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.mapping import covisibility
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
    log(f"[{time.time()-t0:.1f}s] map: kf={int(m.next_kf)} "
        f"pts={int(m.next_pt)}")
    fids = jnp.asarray(
        np.random.default_rng(0).integers(100, 200, size=n_reps), jnp.int32)

    base = [None]

    def timed(name, fn):
        @jax.jit
        def loop(m, fids):
            def body(mm, fid):
                return fn(mm, fid), 0
            mm, _ = jax.lax.scan(body, m, fids)
            return mm
        out = loop(m, fids)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(m, fids)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        net = dt - (base[0] or 0.0)
        log(f"{name:34s} {dt:8.2f} ms gross {net:8.2f} net")
        return dt

    def noop(mm, fid):
        return mm._replace(next_pt=mm.next_pt + 0 * fid)

    base[0] = 0.0
    base[0] = timed("noop (carry copy floor)", noop)

    slot = m.next_kf - 1

    def cull_pts(mm, fid):
        return lm.cull_points(mm, slot + 0 * fid)

    def fuse(mm, fid):
        return lm.fuse_neighbors(mm, slot + 0 * fid, cfg=cfg)

    def cull_kf(mm, fid):
        out = lm.cull_keyframes(mm, slot + 0 * fid)
        return out._replace(kf_valid=mm.kf_valid)   # undo

    def stats(mm, fid):
        from eao_fusion_tpu.mapping.map_state import update_point_stats
        return update_point_stats(mm._replace(
            kf_valid=mm.kf_valid.at[0].set(fid >= 0)))

    def desc(mm, fid):
        return lm.refresh_point_descriptors(mm._replace(
            kf_valid=mm.kf_valid.at[0].set(fid >= 0)))

    def winsel(mm, fid):
        kf_idx, sel_valid, fixed, local_pts = lm._select_window(
            mm, slot + 0 * fid, cfg.capacity.max_local_ba_kfs - 8, 8)
        return mm._replace(next_pt=mm.next_pt
                           + 0 * (kf_idx[0] + fixed[0] + local_pts[0]))

    # the compaction + BA, separated: build problem then solve
    def build_prob(mm, fid):
        kf_slot = slot + 0 * fid
        n_fixed = 8
        n_local = cfg.capacity.max_local_ba_kfs - n_fixed
        kf_idx, sel_valid, fixed, local_pts = lm._select_window(
            mm, kf_slot, n_local, n_fixed)
        N = mm.kf_pt_idx.shape[1]
        C = kf_idx.shape[0]
        Pw = min(cfg.capacity.max_local_ba_points, mm.max_pt)
        E = min(cfg.capacity.max_local_ba_obs, C * N)
        sel = mm.pt_valid & local_pts
        widx = jnp.argsort(~sel, stable=True)[:Pw]
        wvalid = sel[widx]
        lut = jnp.full((mm.max_pt,), -1, jnp.int32).at[
            jnp.where(wvalid, widx, mm.max_pt)].set(
            jnp.arange(Pw, dtype=jnp.int32), mode="drop")
        obs_pt_dense = mm.kf_pt_idx[kf_idx]
        pid_w = lut[jnp.clip(obs_pt_dense, 0, None)]
        obs_ok = (mm.kf_kp_valid[kf_idx] & (obs_pt_dense >= 0) & (pid_w >= 0)
                  & (sel_valid & mm.kf_valid[kf_idx])[:, None])
        flat_ok = obs_ok.reshape(-1)
        eidx = jnp.argsort(~flat_ok, stable=True)[:E]
        e_ok = flat_ok[eidx]
        e_cam = (eidx // N).astype(jnp.int32)
        lvl = mm.kf_kp_level[kf_idx].reshape(-1)[eidx].astype(jnp.float32)
        prob = ba.BACooProblem(
            cam_pose=mm.kf_pose[kf_idx],
            cam_valid=sel_valid & mm.kf_valid[kf_idx],
            cam_fixed=fixed,
            pt_xyz=mm.pt_xyz[widx],
            pt_valid=wvalid,
            obs_cam=e_cam,
            obs_pt=jnp.where(e_ok, pid_w.reshape(-1)[eidx], -1),
            obs_uv=mm.kf_kp_uv[kf_idx].reshape(-1, 2)[eidx],
            obs_ur=mm.kf_kp_uright[kf_idx].reshape(-1)[eidx],
            obs_inv_sigma2=cfg.orb.scale_factor ** (-2.0 * lvl),
            obs_valid=e_ok,
        )
        return prob, kf_idx, widx, wvalid

    cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            cfg.camera.bf)

    def compact_only(mm, fid):
        prob, kf_idx, widx, wvalid = build_prob(mm, fid)
        return mm._replace(next_pt=mm.next_pt + 0 * (
            prob.obs_cam[0] + widx[0]))

    def ba_full(mm, fid):
        prob, kf_idx, widx, wvalid = build_prob(mm, fid)
        res = ba.bundle_adjust_coo(prob, None, cam=cam5, cfg=cfg.solver,
                                   n_iters1=cfg.solver.local_ba_iters_first,
                                   n_iters2=cfg.solver.local_ba_iters_second)
        return mm._replace(pt_xyz=mm.pt_xyz.at[
            jnp.where(wvalid, widx, mm.max_pt)].set(res.pt_xyz,
                                                    mode="drop"))

    def full_step(mm, fid):
        out = lm.local_mapping_step(mm, slot + 0 * fid, cfg=cfg)
        return out

    timed("cull_points", cull_pts)
    timed("fuse_neighbors", fuse)
    timed("cull_keyframes", cull_kf)
    timed("update_point_stats", stats)
    timed("refresh_point_descriptors", desc)
    timed("select_window", winsel)
    timed("window compaction (argsorts)", compact_only)
    timed("compaction + BA solve", ba_full)
    timed("FULL local_mapping_step", full_step)


if __name__ == "__main__":
    main()
