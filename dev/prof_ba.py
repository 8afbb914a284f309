import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax, jax.numpy as jnp

def main():
    from eao_fusion_tpu.config import SystemConfig
    from eao_fusion_tpu.io import synthetic
    from eao_fusion_tpu.pipeline import local_mapping as lm
    from eao_fusion_tpu.pipeline.system import System
    from eao_fusion_tpu.solvers import ba
    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=24, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    m = sys_.map
    kf_slot = jnp.int32(int(np.where(np.asarray(m.kf_valid))[0][-1]))
    fn = jax.jit(lambda m, s: lm.local_mapping_step(m, s, cfg=cfg))
    out = fn(m, kf_slot); jax.block_until_ready(out.kf_pose)
    t0=time.time()
    out = fn(m, kf_slot); jax.block_until_ready(out.kf_pose)
    print("local_mapping_step:", (time.time()-t0)*1000, "ms", file=sys.stderr)
    with jax.profiler.trace("/tmp/jaxtrace"):
        out = fn(m, kf_slot); jax.block_until_ready(out.kf_pose)
    print("trace written", file=sys.stderr)

main()
