"""Instrument point-cull clauses + fuse on the bench arc (CPU)."""
import numpy as np
import jax, jax.numpy as jnp
from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.mapping import covisibility
from eao_fusion_tpu.pipeline import steady
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
sys_ = System(cfg)
for f in seq.frames[:12]:
    sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
idx = list(range(12, len(seq.frames))) + list(range(len(seq.frames)-2, 12, -1))
def pad_boxes(b):
    out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
    out[:min(len(b), len(out))] = b[:len(out)]
    return out

def stats(m, tag):
    Z = np.asarray(jax.device_get(covisibility.observation_indicator(m))).astype(bool)
    kv = np.asarray(m.kf_valid).astype(bool)
    Z = Z & kv[:, None]
    obs = Z.sum(0)
    pv = np.asarray(m.pt_valid).astype(bool)
    age = np.asarray(m.next_kf) - np.asarray(m.pt_ref_kf)
    found = np.asarray(m.pt_found); vis = np.asarray(m.pt_visible)
    print(f"{tag}: live={pv.sum()} next_pt={int(np.asarray(m.next_pt))} "
          f"kfs={kv.sum()} obs-hist of live pts: "
          f"{[int((obs[pv]==k).sum()) for k in range(5)]} (0,1,2,3,4) "
          f"found<0.25vis: {int((pv & (vis>=4) & (found<0.25*vis)).sum())}",
          flush=True)

# drive frames one at a time via System.process_frame (host path; same policy)
for lap in range(3):
    for i in idx:
        f = seq.frames[i]
        sys_.process_frame(f.gray, f.depth, f.timestamp + lap, boxes=f.boxes)
    stats(sys_.map, f"after lap {lap}")
d = [x for x in sys_.diags[-22:]]
print("last lap triggers:", [int(np.asarray(x.get("kf_trigger", 0))) for x in d])
print("tracked_close:", [int(np.asarray(x["tracked_close"])) for x in d])
