"""Build a map on synthetic frames and dump the local-BA problem arrays to
dev/local_ba_prob.npz so solver experiments skip the map-building warmup."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def main():
    t0 = time.time()
    import jax.numpy as jnp

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System

    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m = sys_.map
    kf_slot = jnp.int32(int(np.asarray(m.next_kf)) - 1)

    n_fixed = 8
    n_local = cfg.capacity.max_local_ba_kfs - n_fixed
    kf_idx, sel_valid, fixed, local_pts = lm._select_window(
        m, kf_slot, n_local, n_fixed)
    obs_pt = m.kf_pt_idx[kf_idx]
    pt_ok = m.pt_valid[jnp.clip(obs_pt, 0, None)] & (obs_pt >= 0)
    np.savez(
        os.path.join(os.path.dirname(__file__), "local_ba_prob.npz"),
        cam_pose=np.asarray(m.kf_pose[kf_idx]),
        cam_valid=np.asarray(sel_valid & m.kf_valid[kf_idx]),
        cam_fixed=np.asarray(fixed),
        pt_xyz=np.asarray(m.pt_xyz),
        pt_valid=np.asarray(m.pt_valid & local_pts),
        obs_pt=np.asarray(obs_pt),
        obs_uv=np.asarray(m.kf_kp_uv[kf_idx]),
        obs_ur=np.asarray(m.kf_kp_uright[kf_idx]),
        obs_inv_sigma2=np.asarray(cfg.orb.scale_factor ** (
            -2.0 * m.kf_kp_level[kf_idx].astype(jnp.float32))),
        obs_valid=np.asarray(m.kf_kp_valid[kf_idx] & pt_ok))
    print(f"[{time.time()-t0:.1f}s] dumped: obs="
          f"{int(np.asarray(m.kf_kp_valid[kf_idx] & pt_ok).sum())} "
          f"pts={int(np.asarray((m.pt_valid & local_pts)).sum())} "
          f"C={len(np.asarray(kf_idx))}")


if __name__ == "__main__":
    main()
