"""Dev: validate plane segmentation against GT scene planes."""
import numpy as np
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import planes as plane_ops, lie
from eao_fusion_tpu.mapping import plane_map

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=3, seed=0, cache_dir=synthetic.DEFAULT_CACHE)

# GT world planes of the room (camera0 = world): floor y=1.2, back z=4.5,
# left x=-3, right x=3  (n·x + d = 0)
gt = np.array([[0, 1, 0, -1.2], [0, 0, 1, -4.5],
               [1, 0, 0, 3.0], [1, 0, 0, -3.0]], np.float32)

for fi in (0, 2):
    f = seq.frames[fi]
    fp = plane_ops.segment_planes(jnp.asarray(f.depth), cam=cfg.camera,
                                  cfg=cfg.planes)
    print(f"--- frame {fi}")
    cw = np.asarray(plane_map.planes_to_world(fp.coeffs, jnp.asarray(f.tcw)))
    for i in range(len(cw)):
        if not bool(fp.valid[i]):
            continue
        # compare to GT (allow sign flip)
        errs = []
        for g in gt:
            gn = g / np.linalg.norm(g[:3])
            e = min(np.linalg.norm(cw[i] - gn), np.linalg.norm(cw[i] + gn))
            errs.append(e)
        j = int(np.argmin(errs))
        print(f"  plane {i}: n_inl={int(fp.n_inliers[i]):6d} "
              f"world=[{cw[i][0]:+.3f} {cw[i][1]:+.3f} {cw[i][2]:+.3f} "
              f"{cw[i][3]:+.3f}] -> gt#{j} err={errs[j]:.4f}")
