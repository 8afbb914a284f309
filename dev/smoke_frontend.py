"""Dev smoke test: extractor + matcher on a 2-frame synthetic scene."""
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.frontend import extractor, matcher
from eao_fusion_tpu.ops import lie

print(f"[{time.time()-t0:.1f}s] jax ready, devices={jax.devices()}")

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=3, seed=0, cache_dir=synthetic.DEFAULT_CACHE)
print(f"[{time.time()-t0:.1f}s] synthetic seq rendered "
      f"gray_mean={seq.frames[0].gray.mean():.3f} depth_med="
      f"{np.median(seq.frames[0].depth[seq.frames[0].depth>0]):.2f}")

cam = cfg.camera
f0 = seq.frames[0]
f1 = seq.frames[2]
feats0 = extractor.extract_features(jnp.asarray(f0.gray), jnp.asarray(f0.depth),
                                    orb_cfg=cfg.orb, cam_cfg=cam)
feats1 = extractor.extract_features(jnp.asarray(f1.gray), jnp.asarray(f1.depth),
                                    orb_cfg=cfg.orb, cam_cfg=cam)
print(f"[{time.time()-t0:.1f}s] extracted: valid0={int(feats0.valid.sum())} "
      f"valid1={int(feats1.valid.sum())} depth0={int((feats0.depth>0).sum())}")

m = matcher.mutual_match(feats0.desc_pm1, feats0.valid, feats0.angle,
                         feats1.desc_pm1, feats1.valid, feats1.angle,
                         th=64, use_ratio=True, check_rotation=True)
nm = int((m.target_idx >= 0).sum())
print(f"[{time.time()-t0:.1f}s] mutual matches: {nm}")

# geometric verification with GT: unproject f0 kp with depth, transform to f1, project
idx0 = np.where((np.asarray(m.target_idx) >= 0) & (np.asarray(feats0.depth) > 0))[0]
idx1 = np.asarray(m.target_idx)[idx0]
uv0 = np.asarray(feats0.uv)[idx0]
d0 = np.asarray(feats0.depth)[idx0]
xc0 = np.asarray(lie.backproject((cam.fx, cam.fy, cam.cx, cam.cy), uv0, d0))
t_10 = np.asarray(lie.se3_compose(f1.tcw, lie.se3_inverse(f0.tcw)))
xc1 = np.asarray(lie.se3_apply(t_10, xc0))
uv1_pred = np.asarray(lie.project((cam.fx, cam.fy, cam.cx, cam.cy), xc1))
uv1 = np.asarray(feats1.uv)[idx1]
err = np.linalg.norm(uv1_pred - uv1, axis=1)
print(f"[{time.time()-t0:.1f}s] reproj err over {len(err)} matches: "
      f"med={np.median(err):.2f}px inlier<2px={np.mean(err<2):.2%} "
      f"inlier<5px={np.mean(err<5):.2%}")

# timing: steady-state extraction
f = jax.jit(lambda g, d: extractor.extract_features(
    g, d, orb_cfg=cfg.orb, cam_cfg=cam))
r = f(jnp.asarray(f1.gray), jnp.asarray(f1.depth))
jax.block_until_ready(r)
t1 = time.time()
for _ in range(5):
    r = f(jnp.asarray(f1.gray), jnp.asarray(f1.depth))
jax.block_until_ready(r)
print(f"extract steady-state: {(time.time()-t1)/5*1000:.1f} ms/frame (CPU)")
