"""Trustworthy TPU component timing: every measurement is a jitted
lax.scan over VARIED inputs (defeats any identical-request caching and
amortizes dispatch), wall / n_steps."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor, matcher
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import hamming, planes as plane_ops
from eao_fusion_tpu.pipeline import tracking
from eao_fusion_tpu.pipeline.system import System
from eao_fusion_tpu.solvers import pose_opt

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=14, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
sys_ = System(cfg)
for f in seq.frames[:12]:
    sys_.process_frame(f.gray, f.depth, f.timestamp)
m, ts = sys_.map, sys_.track
grays = jnp.stack([jnp.asarray(f.gray) for f in seq.frames])
depths = jnp.stack([jnp.asarray(f.depth) for f in seq.frames])
T = grays.shape[0]
print(f"devices={jax.devices()} kf={int(m.next_kf)} pts={int(m.next_pt)}",
      file=sys.stderr)


def scan_time(name, make_step, n_rep=4):
    @jax.jit
    def run():
        def body(carry, i):
            out = make_step(i, carry)
            return out, None
        out, _ = jax.lax.scan(body, init, jnp.arange(T))
        return out
    global init
    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n_rep * T) * 1000
    print(f"{name:32s} {dt:7.2f} ms/step")


# ---- extract: carry a checksum so each step depends on varied input
init = jnp.float32(0)
def ex_step(i, acc):
    feats = extractor.extract_features(grays[i], depths[i],
                                       orb_cfg=cfg.orb, cam_cfg=cfg.camera)
    return acc + jnp.sum(feats.uv) + jnp.sum(feats.desc_pm1.astype(jnp.float32))
scan_time("extract_features", ex_step)

# ---- plane segmentation
init = jnp.float32(0)
def pl_step(i, acc):
    fp = plane_ops.segment_planes(depths[i], cam=cfg.camera, cfg=cfg.planes)
    return acc + jnp.sum(fp.coeffs)
scan_time("segment_planes", pl_step)

# ---- track only (feats fixed per step but map/ts chained)
feats0 = extractor.extract_features(grays[12], depths[12],
                                    orb_cfg=cfg.orb, cam_cfg=cfg.camera)
init = (m, ts)
def tr_step(i, carry):
    mm, tt = carry
    mm, tt, diag = tracking.track_frame(mm, tt, feats0, jnp.int32(12) + i,
                                        cfg=cfg)
    return (mm, tt)
scan_time("track_frame (no extract)", tr_step)

# ---- pose opt chained
obs = pose_opt.PoseObs(pts_w=m.pt_xyz[:1024], uv=feats0.uv,
                       uright=feats0.uright,
                       inv_sigma2=jnp.ones((1024,)), valid=feats0.valid)
cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
        cfg.camera.bf)
init = ts.pose
def po_step(i, pose):
    r = pose_opt.optimize_pose(pose, obs, cam=cam5, cfg=cfg.solver)
    return r.pose
scan_time("optimize_pose (4 rounds)", po_step)

# ---- big hamming
init = jnp.float32(0)
def hm_step(i, acc):
    d = hamming.hamming_matrix(m.pt_desc_pm1,
                               jnp.roll(feats0.desc_pm1, i, axis=0))
    return acc + jnp.sum(d)
scan_time("hamming 16384x1024", hm_step)
