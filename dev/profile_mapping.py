"""Capture a device trace of local_mapping_step on the real chip."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.pipeline import local_mapping as lm
from eao_fusion_tpu.pipeline.system import System

cfg = SystemConfig()
seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                  cache_dir=synthetic.DEFAULT_CACHE)
s = System(cfg)
for f in seq.frames:
    s.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
m = s.map
print("map built", flush=True)


@jax.jit
def loop(m, slots):
    def body(mm, s):
        return lm.local_mapping_step(mm, s, cfg=cfg), 0
    mm, _ = jax.lax.scan(body, m, slots)
    return mm


slots = jnp.asarray([3, 5, 7, 9], jnp.int32)
out = loop(m, slots)
jax.block_until_ready(out)
t = time.time()
out = loop(m, slots)
jax.block_until_ready(out)
print(f"warm: {(time.time()-t)/4*1000:.1f} ms/KF", flush=True)

jax.profiler.start_trace("/tmp/jaxtrace")
out = loop(m, slots)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace written", flush=True)
