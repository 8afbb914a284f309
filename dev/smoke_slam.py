"""Dev smoke: end-to-end RGBD tracking on a synthetic sequence + ATE."""
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig(
    orb=ORBConfig(n_features=500, max_keypoints=512),
    capacity=MapCapacity(max_keyframes=64, max_points=4096),
)
print(f"[{time.time()-t0:.1f}s] generating sequence...")
seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc", cache_dir=synthetic.DEFAULT_CACHE)

sys_ = System(cfg)
for i, f in enumerate(seq.frames):
    p = sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    if i < 3 or i % 5 == 0:
        d = sys_.diags[-1] if sys_.diags else {}
        print(f"[{time.time()-t0:.1f}s] frame {i}: diag={d} kf={sys_.n_keyframes}"
              f" objs={int(sys_.objects.valid.sum())}")

est = sys_.trajectory_tcw()
gt = seq.gt_tcw()
err = tum.evaluate_ate_rpe(est, gt, align=True)
print(f"ATE RMSE: {err.ate_rmse*100:.2f} cm  max: {err.ate_max*100:.2f} cm  "
      f"RPE: {err.rpe_trans_rmse*100:.2f} cm/frame  n={err.n_poses}")
print(f"keyframes: {sys_.n_keyframes}  points: {int(sys_.map.next_pt)}")

# object report vs GT boxes
ot = sys_.objects
gt_centers = np.stack([(b.lo + b.hi) / 2 for b in seq.scene.boxes])
for o in range(int(ot.next_obj)):
    if not bool(ot.valid[o]):
        continue
    c = np.asarray(ot.center[o])
    errs = np.linalg.norm(gt_centers - c, axis=1)
    j = int(np.argmin(errs))
    print(f"obj {o}: cls={int(ot.cls[o])} nfr={int(ot.n_frames[o])} "
          f"npts={int(ot.pt_ok[o].sum())} center={np.round(c,2)} "
          f"gt#{j} err={errs[j]*100:.1f}cm")
print(f"total wall: {time.time()-t0:.1f}s")
