"""Map-sharded full-pipeline step (parallel/sharded_step.py): the live map
pytree partitioned over the lm x kf device mesh must produce the same SLAM
trajectory as the unsharded step."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eao_fusion_tpu.config import MapCapacity, ORBConfig, SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.parallel import mesh as mesh_util
from eao_fusion_tpu.parallel import sharded_step
from eao_fusion_tpu.pipeline import steady
from eao_fusion_tpu.pipeline.system import System


def _cfg():
    return SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=32, max_points=2048),
        use_planes=True, use_objects=True)


def test_map_shardings_layout():
    """Point tables land on lm, keyframe tables on kf, obs_ind on both."""
    mesh = mesh_util.make_mesh(n_landmark=4, n_kf=2)
    sh = sharded_step.map_shardings(mesh)
    assert sh.pt_xyz.spec == P("lm")
    assert sh.kf_pose.spec == P("kf")
    assert sh.obs_ind.spec == P("kf", "lm")
    assert sh.pl_coeff.spec == P()
    assert sh.next_kf.spec == P()


@pytest.mark.slow
def test_sharded_step_agrees_with_unsharded():
    """Run the SAME warmed state through N frames of the full slam_step
    (tracking + planes + objects + keyframe branch) unsharded and sharded
    over a 4x2 (lm, kf) mesh; poses and map contents must agree."""
    cfg = _cfg()
    seq = synthetic.generate_sequence(n_frames=16, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:8]:
        s.process_frame(f.gray, f.depth, f.timestamp, boxes=f.boxes)

    st_ref = steady.init_steady_state(s)
    mesh = mesh_util.make_mesh(n_landmark=4, n_kf=2)
    st_sh = sharded_step.shard_state(st_ref, mesh)
    step_sh = sharded_step.make_sharded_slam_step(mesh, cfg, kf_every=4)

    def pad_boxes(b):
        out = np.zeros((cfg.objects.max_objects_2d, 6), np.float32)
        out[:min(len(b), len(out))] = b[:len(out)]
        return out

    import jax.numpy as jnp
    kfs = 0
    for f in seq.frames[8:14]:
        gray = jnp.asarray(f.gray)
        depth = jnp.asarray(f.depth)
        boxes = jnp.asarray(pad_boxes(f.boxes))
        ts = jnp.float32(f.timestamp)
        st_ref, d_ref = steady.slam_step(st_ref, gray, depth, boxes, ts,
                                         cfg=cfg, kf_every=4)
        st_sh, d_sh = step_sh(st_sh, gray, depth, boxes, ts)
        kfs += int(np.asarray(d_ref["kf_inserted"]))
        # poses must track each other closely frame by frame
        np.testing.assert_allclose(np.asarray(st_sh.ts.pose),
                                   np.asarray(st_ref.ts.pose), atol=2e-3)
        assert (int(np.asarray(d_sh["kf_inserted"]))
                == int(np.asarray(d_ref["kf_inserted"])))

    assert kfs >= 1, "keyframe branch never exercised"
    assert int(np.asarray(st_sh.m.next_kf)) == int(np.asarray(st_ref.m.next_kf))
    assert int(np.asarray(st_sh.m.next_pt)) == int(np.asarray(st_ref.m.next_pt))
    # map point tables agree (same creation order, near-identical geometry)
    v_ref = np.asarray(st_ref.m.pt_valid)
    v_sh = np.asarray(st_sh.m.pt_valid)
    assert (v_ref != v_sh).mean() < 0.01
    both = v_ref & v_sh
    np.testing.assert_allclose(np.asarray(st_sh.m.pt_xyz)[both],
                               np.asarray(st_ref.m.pt_xyz)[both], atol=5e-2)
    # the sharded map is actually distributed: a point-table leaf has one
    # shard per lm-mesh device, each holding 1/4 of the rows
    shards = st_sh.m.pt_xyz.addressable_shards
    assert len({s.device for s in shards}) == 8
    assert shards[0].data.shape[0] == cfg.capacity.max_points // 4
