"""Steady-state on-device SLAM step (pipeline/steady.py): the scan-driven
full-pipeline path must track, insert keyframes under lax.cond, and keep
the map consistent with the host-orchestrated System path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.pipeline import steady
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_steady_chunk_tracks_and_inserts_keyframes():
    cfg = SystemConfig()
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    sys_ = System(cfg)
    for f in seq.frames[:8]:
        sys_.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
    assert int(sys_.track.status) == 1  # STATUS_OK

    st = steady.init_steady_state(sys_)
    idx = list(range(8, 20))

    def pad_boxes(b):
        out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
        out[:min(len(b), len(out))] = b[:len(out)]
        return out

    grays = jnp.stack([jnp.asarray(seq.frames[i].gray) for i in idx])
    depths = jnp.stack([jnp.asarray(seq.frames[i].depth) for i in idx])
    boxes = jnp.asarray(np.stack([pad_boxes(seq.frames[i].boxes)
                                  for i in idx]))
    tss = jnp.asarray([seq.frames[i].timestamp for i in idx], jnp.float32)

    kf_before = int(st.m.next_kf)
    st2, diag = steady.slam_chunk(st, grays, depths, boxes, tss,
                                  cfg=cfg, kf_every=4)
    ninl = np.asarray(diag["n_inliers"])
    kf_ins = np.asarray(diag["kf_inserted"])

    assert (ninl > 30).all(), f"tracking degraded: {ninl}"
    assert kf_ins.sum() >= 2, f"no keyframes inserted: {kf_ins}"
    assert int(st2.m.next_kf) > kf_before
    assert int(st2.ts.status) == 1
    # pose error vs ground truth stays small (steady path is the same
    # math as the System path, just scan-driven)
    est = np.asarray(st2.ts.pose)
    gt = seq.frames[idx[-1]].tcw
    assert np.linalg.norm(est[4:7] - gt[4:7]) < 0.05
