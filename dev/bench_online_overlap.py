"""Online-lane latency overlap (round-3 verdict item 9): is YOLOX
detection actually hidden behind the frame pipeline, as the reference
hides TensorRT inference behind ORB extraction (SURVEY.md §3.5)?

Measures on the TPU:
  (a) raw detector latency (submit + immediate join);
  (b) System.process_frame WITH the online lane (submit at frame start,
      join before object association — the reference's InsertImage /
      GetResult pattern, `src/Tracking.cc:318,409`);
  (c) System.process_frame with precomputed boxes (no detector work).

Overlap = 1 - ((b) - (c)) / (a): 1.0 means detection is fully hidden.
On a single TPU chip both programs share the device, so "hidden" means
the detector's device time fills gaps in the frame pipeline's dispatch
stream rather than extending the critical path.

Run (TPU): python dev/bench_online_overlap.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline.system import System

    print("devices:", jax.devices(), file=sys.stderr)
    seq = synthetic.generate_sequence(
        n_frames=24, seed=0, style="arc", class_textures=True,
        cache_dir=synthetic.DEFAULT_CACHE)

    # (a) raw detector latency
    cfg = SystemConfig(semantic_online=True)
    s = System(cfg)
    assert s.detector is not None
    rgb = np.repeat(seq.frames[0].gray[..., None], 3, axis=-1)
    s.detector.submit(rgb); s.detector.result()      # compile
    t0 = time.time()
    n = 20
    for _ in range(n):
        s.detector.submit(rgb)
        s.detector.result()
    t_det = (time.time() - t0) / n

    # (b) frames with the online lane
    for k in range(6):                               # warm-up + compiles
        f = seq.frames[k]
        s.process_frame(f.gray, f.depth, timestamp=k / 30.0)
    t0 = time.time()
    for k in range(6, 22):
        f = seq.frames[k]
        s.process_frame(f.gray, f.depth, timestamp=k / 30.0)
    t_online = (time.time() - t0) / 16

    # (c) frames with precomputed boxes (same map trajectory)
    s2 = System(SystemConfig())
    for k in range(6):
        f = seq.frames[k]
        s2.process_frame(f.gray, f.depth, timestamp=k / 30.0, boxes=f.boxes)
    t0 = time.time()
    for k in range(6, 22):
        f = seq.frames[k]
        s2.process_frame(f.gray, f.depth, timestamp=k / 30.0, boxes=f.boxes)
    t_offline = (time.time() - t0) / 16

    added = t_online - t_offline
    overlap = 1.0 - added / max(t_det, 1e-9)
    print(f"detector alone: {t_det*1e3:.2f} ms | frame w/ online lane: "
          f"{t_online*1e3:.2f} ms | frame w/ offline boxes: "
          f"{t_offline*1e3:.2f} ms")
    print(f"added latency: {added*1e3:.2f} ms of {t_det*1e3:.2f} ms "
          f"detector time -> overlap {overlap:.2f}")


if __name__ == "__main__":
    main()
