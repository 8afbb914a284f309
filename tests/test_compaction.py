"""Point-table compaction: references stay consistent across the remap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.mapping import map_state as ms
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_compaction_preserves_tracking():
    """A tiny point budget forces compaction mid-sequence; tracking and ATE
    must survive it."""
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=1024),
        use_planes=False, use_objects=True, use_loop_closing=False)
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    compactions = 0
    prev_next = 0
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)
        cur = int(s.map.next_pt)
        if cur < prev_next:
            compactions += 1
        prev_next = cur
    assert compactions >= 1, "budget should have forced a compaction"
    err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw())
    assert err.ate_rmse < 0.03, err
    assert s.diags[-1]["n_inliers"] > 60


def test_compact_points_remap_consistency():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=300, max_keypoints=256),
        capacity=MapCapacity(max_keyframes=16, max_points=512))
    m = ms.empty_map(cfg)
    r = np.random.default_rng(0)
    # fake: 100 points, 40 invalid, one keyframe observing some
    xyz = r.normal(0, 1, (100, 3)).astype(np.float32)
    valid = np.ones(100, bool)
    valid[r.choice(100, 40, replace=False)] = False
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:100].set(jnp.asarray(xyz)),
        pt_valid=m.pt_valid.at[:100].set(jnp.asarray(valid)),
        next_pt=jnp.int32(100),
        kf_valid=m.kf_valid.at[0].set(True))
    row = np.full(256, -1, np.int32)
    row[:100] = np.arange(100)
    m = m._replace(kf_pt_idx=m.kf_pt_idx.at[0].set(jnp.asarray(row)))

    m2, remap = ms.compact_points(m)
    assert int(m2.next_pt) == int(valid.sum())
    # every surviving observation must point at the same 3D point
    new_row = np.asarray(m2.kf_pt_idx[0])
    for kp in range(100):
        if valid[kp]:
            assert new_row[kp] >= 0
            np.testing.assert_allclose(np.asarray(m2.pt_xyz)[new_row[kp]],
                                       xyz[kp], atol=1e-6)
        else:
            assert new_row[kp] == -1


def _redundant_map(n_kf=8, n_pt=100):
    """n_kf keyframes all observing the same n_pt points — maximal
    redundancy, every unprotected keyframe is a cull candidate."""
    cfg = SystemConfig(
        orb=ORBConfig(n_features=300, max_keypoints=256),
        capacity=MapCapacity(max_keyframes=16, max_points=512))
    m = ms.empty_map(cfg)
    row = np.full(256, -1, np.int32)
    row[:n_pt] = np.arange(n_pt)
    m = m._replace(
        pt_valid=m.pt_valid.at[:n_pt].set(True),
        kf_valid=m.kf_valid.at[:n_kf].set(True),
        kf_pt_idx=m.kf_pt_idx.at[:n_kf].set(jnp.asarray(row)),
        next_kf=jnp.int32(n_kf), next_pt=jnp.int32(n_pt))
    return ms.refresh_obs_ind(m)


def test_cull_keyframes_multi_victim():
    """`LocalMapping::KeyFrameCulling` removes EVERY qualifying keyframe
    (`src/LocalMapping.cc:636-706`); the batched version removes up to
    max_cull per call, re-evaluating redundancy between victims, and never
    touches keyframe 0 or the two most recent."""
    from eao_fusion_tpu.pipeline.local_mapping import cull_keyframes

    m = _redundant_map()
    m1 = cull_keyframes(m, jnp.int32(7), max_cull=1)
    assert int(np.asarray(m1.kf_valid).sum()) == 7

    m3 = cull_keyframes(m, jnp.int32(7), max_cull=3)
    kv = np.asarray(m3.kf_valid)
    assert kv.sum() == 5
    # protected: keyframe 0 and the two most recent (slots 6, 7)
    assert kv[0] and kv[6] and kv[7]


def test_cull_keyframes_stops_when_not_redundant():
    """Culling must stop as soon as removal would drop points below the
    3-other-observer redundancy rule, even with budget left."""
    from eao_fusion_tpu.pipeline.local_mapping import cull_keyframes

    m = _redundant_map(n_kf=5)          # candidates: slots 1, 2 only
    m2 = cull_keyframes(m, jnp.int32(4), max_cull=4)
    kv = np.asarray(m2.kf_valid)
    # after culling one, each point has 4 observers -> obs_count >= 4 still
    # holds for the second victim; after two, 3 observers -> no candidate
    assert kv.sum() == 3
    assert kv[0] and kv[3] and kv[4]
