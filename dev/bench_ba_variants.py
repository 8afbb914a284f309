"""Time local-BA solver variants on the dumped problem (dev/local_ba_prob.npz).

Each timing runs the solver under lax.scan with a varied damping input so
the axon tunnel cannot dedup executions.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_prob():
    import jax.numpy as jnp
    from eao_fusion_tpu.solvers import ba
    z = np.load(os.path.join(os.path.dirname(__file__), "local_ba_prob.npz"))
    return ba.BAProblem(**{k: jnp.asarray(v) for k, v in z.items()})


def compact_points(prob, pad=512):
    """Window-compact the point table: keep only referenced/valid points."""
    import jax.numpy as jnp
    from eao_fusion_tpu.solvers import ba
    keep = np.asarray(prob.pt_valid)
    idx = np.nonzero(keep)[0]
    Pw = -(-len(idx) // pad) * pad
    widx = np.zeros(Pw, np.int64)
    widx[:len(idx)] = idx
    lut = np.full(prob.pt_xyz.shape[0], -1, np.int32)
    lut[idx] = np.arange(len(idx), dtype=np.int32)
    obs_pt = np.asarray(prob.obs_pt)
    obs_w = np.where(obs_pt >= 0, lut[np.clip(obs_pt, 0, None)], -1)
    pt_valid = np.zeros(Pw, bool)
    pt_valid[:len(idx)] = True
    return ba.BAProblem(
        cam_pose=prob.cam_pose, cam_valid=prob.cam_valid,
        cam_fixed=prob.cam_fixed,
        pt_xyz=jnp.asarray(np.asarray(prob.pt_xyz)[widx]),
        pt_valid=jnp.asarray(pt_valid),
        obs_pt=jnp.asarray(obs_w),
        obs_uv=prob.obs_uv, obs_ur=prob.obs_ur,
        obs_inv_sigma2=prob.obs_inv_sigma2,
        obs_valid=prob.obs_valid & jnp.asarray(obs_w >= 0))


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    from eao_fusion_tpu.config import SolverConfig
    from eao_fusion_tpu.solvers import ba

    CAM = (535.4, 539.2, 320.1, 247.6, 40.0)
    cfg = SolverConfig()
    prob = load_prob()
    C, N = prob.obs_pt.shape
    log(f"[{time.time()-t0:.1f}s] problem: C={C} N={N} "
        f"P={prob.pt_xyz.shape[0]} obs={int(prob.obs_valid.sum())} "
        f"pts={int(prob.pt_valid.sum())}")

    n_reps = 8

    def timed(name, prob_v, **kw):
        @jax.jit
        def loop(prob_v, damps):
            def body(c, d):
                r = ba.bundle_adjust(prob_v, cam=CAM, cfg=cfg,
                                     damping=d, **kw)
                return c + r.chi2, 0
            c, _ = jax.lax.scan(body, jnp.float32(0), damps)
            return c

        damps = jnp.linspace(1e-3, 1.1e-3, n_reps)
        out = loop(prob_v, damps)
        jax.block_until_ready(out)
        t1 = time.time()
        out = loop(prob_v, damps)
        jax.block_until_ready(out)
        dt = (time.time() - t1) / n_reps * 1000
        log(f"{name:44s} {dt:8.2f} ms")
        return dt

    timed("baseline (P=16384, 5+10)", prob)
    timed("baseline 1 iter (0+1)", prob, n_iters1=0, n_iters2=1)
    timed("baseline 2 iters (0+2)", prob, n_iters1=0, n_iters2=2)
    timed("baseline 4 iters (0+4)", prob, n_iters1=0, n_iters2=4)

    probc = compact_points(prob)
    log(f"compact: P={probc.pt_xyz.shape[0]}")
    timed("compact (5+10)", probc)
    timed("compact 1 iter (0+1)", probc, n_iters1=0, n_iters2=1)
    timed("compact 2 iters (0+2)", probc, n_iters1=0, n_iters2=2)


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401  (compact_points uses it)
    main()
