"""Dev smoke: monocular SLAM end-to-end (scale-aligned ATE)."""
import time

import numpy as np

t0 = time.time()
from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig(
    orb=ORBConfig(n_features=500, max_keypoints=512),
    capacity=MapCapacity(max_keyframes=64, max_points=4096),
    sensor="mono", use_planes=False, use_objects=False)
seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)

s = System(cfg)
for i, f in enumerate(seq.frames):
    s.process_frame(f.gray, None, f.timestamp)
    if i % 5 == 0 or i < 4:
        d = s.diags[-1] if s.diags else {}
        print(f"[{time.time()-t0:.1f}s] f{i}: kf={s.n_keyframes} "
              f"pts={int(s.map.next_pt)} inl={d.get('n_inliers', '-')}")

est = s.trajectory_tcw()
gt = seq.gt_tcw()
# drop the pre-init identity poses
from_idx = next(i for i, d in enumerate(s.trajectory)
                if not np.allclose(d, [1, 0, 0, 0, 0, 0, 0])) if \
    any(not np.allclose(d, [1, 0, 0, 0, 0, 0, 0]) for d in s.trajectory) else 0
err = tum.evaluate_ate_rpe(est[from_idx:], gt[from_idx:], align=True,
                           with_scale=True)
print(f"mono ATE RMSE (scale-aligned): {err.ate_rmse*100:.2f} cm "
      f"max {err.ate_max*100:.2f} n={err.n_poses}")
print(f"wall: {time.time()-t0:.1f}s")
