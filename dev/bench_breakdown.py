"""TPU timing breakdown of the per-frame tracking path."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import extractor
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.mapping import covisibility
from eao_fusion_tpu.ops import hamming
from eao_fusion_tpu.pipeline import tracking
from eao_fusion_tpu.pipeline.system import System
from eao_fusion_tpu.solvers import pose_opt

print("devices:", jax.devices(), file=sys.stderr)
cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=14, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
sys_ = System(cfg)
for f in seq.frames[:12]:
    sys_.process_frame(f.gray, f.depth, f.timestamp)
m, ts = sys_.map, sys_.track
gray = jnp.asarray(seq.frames[12].gray)
depth = jnp.asarray(seq.frames[12].depth)
print(f"map: kf={int(m.next_kf)} pts={int(m.next_pt)}", file=sys.stderr)


def timeit(name, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:7.2f} ms")
    return out


# 1. extraction
ext = jax.jit(lambda g, d: extractor.extract_features(
    g, d, orb_cfg=cfg.orb, cam_cfg=cfg.camera))
feats = timeit("extract_features", ext, gray, depth)

# 2. full hamming matrix map x frame
ham = jax.jit(hamming.hamming_matrix)
timeit("hamming [16384x1024]", ham, m.pt_desc_pm1, feats.desc_pm1)

# 3. observation indicator (big scatter)
oi = jax.jit(covisibility.observation_indicator)
Z = timeit("observation_indicator", oi, m)

# 4. covis matvec
lk = jax.jit(lambda Z, s: covisibility.local_keyframes(Z, s, m.kf_valid, 80))
seen = m.pt_valid
timeit("local_keyframes matvec", lk, Z, seen)

# 5. pose optimization alone
obs = pose_opt.PoseObs(
    pts_w=m.pt_xyz[:1024], uv=feats.uv, uright=feats.uright,
    inv_sigma2=jnp.ones((1024,)), valid=feats.valid)
cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
        cfg.camera.bf)
po = jax.jit(lambda p, o: pose_opt.optimize_pose(p, o, cam=cam5,
                                                 cfg=cfg.solver))
timeit("optimize_pose (4x10)", po, ts.pose, obs)

# 6. full track_frame (no donation)
tf = jax.jit(lambda m, t, f: tracking.track_frame(m, t, f, jnp.int32(12),
                                                  cfg=cfg))
timeit("track_frame full", tf, m, ts, feats, n=20)

# 7. track_frame with donation
tfd = jax.jit(lambda m, t, f: tracking.track_frame(m, t, f, jnp.int32(12),
                                                   cfg=cfg),
              donate_argnums=(0,))
mm = m
for _ in range(3):
    mm, t2, d2 = tfd(mm, ts, feats)
jax.block_until_ready(d2["n_inliers"])
t0 = time.perf_counter()
for _ in range(20):
    mm, t2, d2 = tfd(mm, ts, feats)
jax.block_until_ready(d2["n_inliers"])
print(f"{'track_frame donated':34s} {(time.perf_counter()-t0)/20*1000:7.2f} ms")
