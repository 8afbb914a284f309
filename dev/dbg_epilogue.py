"""Time chunk_epilogue components on the tour workload (TPU)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax, jax.numpy as jnp

def log(m): print(m, file=sys.stderr, flush=True)

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.pipeline import steady, tracking
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig()
T = 22
n_chunks = 6
seq_t = synthetic.generate_sequence(n_frames=625, seed=0, style="tour",
                                    cache_dir=synthetic.DEFAULT_CACHE)
sys2 = System(cfg)
for f in seq_t.frames[:12]:
    sys2.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
def pad_boxes(b):
    out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
    out[:min(len(b), len(out))] = b[:len(out)]
    return out
n_stage = 12 + 14 * T
grays_t = jnp.stack([jnp.asarray(fr.gray) for fr in seq_t.frames[12:n_stage]])
depths_t = jnp.stack([jnp.asarray(fr.depth) for fr in seq_t.frames[12:n_stage]])
boxes_t = jnp.asarray(np.stack([pad_boxes(fr.boxes) for fr in seq_t.frames[12:n_stage]]))
tss_t = jnp.asarray([fr.timestamp for fr in seq_t.frames[12:n_stage]], jnp.float32)
st2 = steady.init_steady_state(sys2)
for k in range(14):
    lo = k * T
    kf_before = int(np.asarray(st2.m.next_kf))
    tA = time.time()
    st2, diag = steady.slam_chunk(st2, grays_t[lo:lo+T], depths_t[lo:lo+T],
                                  boxes_t[lo:lo+T], tss_t[lo:lo+T],
                                  cfg=cfg, kf_every=0)
    jax.block_until_ready(st2.ts.pose)
    tB = time.time()
    # ---- epilogue parts, timed ----
    sys2.map, sys2.track, sys2.objects = st2.m, st2.ts, st2.objs
    sys2.frame_id = int(np.asarray(st2.frame_id))
    sys2.n_keyframes = int(np.asarray(st2.m.next_kf))
    tC = time.time()
    nc = 0
    if sys2.loop_closer is not None and kf_before < sys2.n_keyframes:
        sys2.map, nc, ls = sys2.loop_closer.on_keyframes(
            sys2.map, range(kf_before, sys2.n_keyframes), sys2._next_key())
    tD = time.time()
    sys2._poll_gba()
    p1 = sys2._maybe_compact_points()
    p2 = sys2._maybe_compact_keyframes()
    tE = time.time()
    stat = int(sys2.track.status)
    tF = time.time()
    st2 = st2._replace(m=sys2.map, ts=sys2.track, objs=sys2.objects,
                       frame_id=jnp.int32(sys2.frame_id))
    log(f"chunk {k}: device={1000*(tB-tA):.0f}ms sync={1000*(tC-tB):.0f} "
        f"onkf={1000*(tD-tC):.0f} (n={sys2.n_keyframes-kf_before} closed={nc}) "
        f"compact={1000*(tE-tD):.0f} (pt={p1} kf={p2}) status={1000*(tF-tE):.0f}")
