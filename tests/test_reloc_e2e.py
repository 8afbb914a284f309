"""Relocalization end-to-end: inject a tracking loss (blank frames), then
verify the system recovers its pose via BoW retrieval + RANSAC + pose GN."""

import numpy as np
import pytest

from eao_fusion_tpu.config import SystemConfig, ORBConfig, MapCapacity
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_rgbd_relocalization_after_blackout():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=4096),
        use_planes=False, use_objects=False)
    # disable auto-reset so the loss path exercises relocalization
    cfg = cfg.replace(tracking=cfg.tracking.__class__(
        **{**cfg.tracking.__dict__, "reset_if_lost_below_kfs": 0}))
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames[:12]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    assert int(s.track.status) == 1

    # blackout: three frames of noise -> tracking must fail
    r = np.random.default_rng(0)
    for k in range(3):
        noise = r.uniform(0, 1, seq.frames[0].gray.shape).astype(np.float32)
        s.process_frame(noise, np.zeros_like(seq.frames[0].depth),
                        0.5 + 0.03 * k)

    # revisit a mapped view: the recovery cascade (reference-KF descriptor
    # fallback, then BoW relocalization) must restore the pose
    f = seq.frames[8]
    pose = s.process_frame(f.gray, f.depth, f.timestamp + 1.0)
    d = np.asarray(lie.se3_log(lie.se3_compose(
        lie.se3_inverse(np.asarray(pose)), np.asarray(f.tcw))))
    assert np.linalg.norm(d[3:]) < 0.05, (d, s.n_relocalizations)
    assert np.linalg.norm(d[:3]) < 0.05, (d, s.n_relocalizations)

    # and continue tracking normally afterwards
    for f in seq.frames[9:12]:
        s.process_frame(f.gray, f.depth, f.timestamp + 1.0)
    assert s.diags[-1]["n_inliers"] > 80


def test_reloc_candidate_gating_rejects_near_duplicates():
    """`KeyFrameDatabase::DetectRelocalizationCandidates` parity
    (`src/KeyFrameDatabase.cc:198-310`): a keyframe sharing only ONE word
    with the query is rejected by the 0.8 x max common-word gate even if
    that word gives it an inflated L1 score; candidates come from the
    covisibility group that actually shares vocabulary."""
    import jax.numpy as jnp
    from eao_fusion_tpu.mapping import map_state as ms
    from eao_fusion_tpu.pipeline import relocalization

    cfg = SystemConfig(
        orb=ORBConfig(n_features=100, max_keypoints=128),
        capacity=MapCapacity(max_keyframes=16, max_points=512))
    m = ms.empty_map(cfg)
    K, W = 16, 64
    # two covisibility groups: KFs 0-5 observe points 0-99,
    # KFs 6-11 observe points 100-199 (disjoint -> two groups)
    kf_pt = np.full((K, cfg.orb.max_keypoints), -1, np.int32)
    for k in range(6):
        kf_pt[k, :100] = np.arange(100)
    for k in range(6, 12):
        kf_pt[k, :100] = 100 + np.arange(100)
    m = m._replace(
        kf_valid=jnp.asarray(np.r_[np.ones(12, bool), np.zeros(4, bool)]),
        kf_pt_idx=jnp.asarray(kf_pt),
        pt_valid=jnp.ones((cfg.capacity.max_points,), bool),
        next_kf=jnp.int32(12))
    m = ms.refresh_obs_ind(m)

    bow = np.zeros((K, W), np.float32)
    bow[:6, :20] = 1.0 / 20          # group A: words 0-19
    bow[6:12, 40:60] = 1.0 / 20      # group B: words 40-59
    # spoof: KF 8 (group B) puts ALL its mass on word 0 -> huge L1 overlap
    # with the query on that single word, but only 1 common word
    bow[8] = 0.0
    bow[8, 0] = 1.0
    v = np.zeros(W, np.float32)
    v[:20] = 1.0 / 20                # query speaks group A's vocabulary

    order = relocalization.reloc_candidates(
        m, jnp.asarray(v), jnp.asarray(bow))
    assert len(order) >= 1
    assert all(c < 6 for c in order), order   # only group A survives
    assert 8 not in order
