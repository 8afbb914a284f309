"""Dump compiled HLO of the mapping-step scan and report the largest
fusions (matches trace fusion numbering)."""
import os
import re
import sys

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
txt = loop.lower(m, slots).compile().as_text()
open("/tmp/mapping_hlo.txt", "w").write(txt)
print("HLO dumped:", len(txt), "chars", flush=True)

want = sys.argv[1:] or ["fusion.1416", "fusion.1434", "fusion.1419",
                        "fusion.1424", "broadcast.6175", "copy.3145",
                        "fusion.1320", "fusion.1338", "fusion.1323",
                        "multiply_reduce_fusion.126"]
for w in want:
    pat = re.compile(rf"^\s*%?{re.escape(w)} = .*$", re.M)
    mm = pat.search(txt)
    print("\n====", w, "====")
    print(mm.group(0)[:600] if mm else "not found")
