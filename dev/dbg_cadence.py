"""Diagnose natural-cadence keyframe churn on the bench arc (CPU)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.pipeline import steady
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
sys_ = System(cfg)
for f in seq.frames[:12]:
    sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
idx = list(range(12, len(seq.frames))) + list(range(len(seq.frames)-2, 12, -1))
grays = jnp.stack([jnp.asarray(seq.frames[i].gray) for i in idx])
depths = jnp.stack([jnp.asarray(seq.frames[i].depth) for i in idx])
def pad_boxes(b):
    out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
    out[:min(len(b), len(out))] = b[:len(out)]
    return out
boxes_all = jnp.asarray(np.stack([pad_boxes(seq.frames[i].boxes) for i in idx]))
tss = jnp.asarray([seq.frames[i].timestamp for i in idx], jnp.float32)
st = steady.init_steady_state(sys_)
# warm (pinned cadence like bench)
st, diag = steady.slam_chunk(st, grays, depths, boxes_all, tss, cfg=cfg, kf_every=12)
for rnd in range(7):
    st, diag = steady.slam_chunk(st, grays, depths, boxes_all, tss, cfg=cfg, kf_every=0)
    trig = np.asarray(diag["kf_trigger"]); ins = np.asarray(diag["kf_inserted"]).astype(bool)
    hist = {name: int(((trig & bit) > 0)[ins].sum())
            for bit, name in [(1,"c1"),(2,"ratio"),(4,"need_close"),(8,"new_obj")]}
    tc = np.asarray(diag["tracked_close"]); ucl = np.asarray(diag["untracked_close"])
    nref = np.asarray(diag["n_ref"]); ninl = np.asarray(diag["n_inliers"])
    print(f"round {rnd}: kf={ins.sum()}/{len(ins)} triggers={hist} "
          f"tracked_close p50={np.percentile(tc,50):.0f} "
          f"untracked_close p50={np.percentile(ucl,50):.0f} "
          f"n_ref p50={np.percentile(nref,50):.0f} n_inl p50={np.percentile(ninl,50):.0f}",
          flush=True)
print("live kfs:", int(np.asarray(st.m.kf_valid).sum()),
      "live pts:", int(np.asarray(st.m.pt_valid).sum()),
      "next_pt:", int(np.asarray(st.m.next_pt)))
