"""Keyframe-slot lifecycle: compaction, capacity eviction, and the
unbounded-insertion guarantee (round-3 verdict item 1).

The reference inserts and culls keyframes forever — ids grow without bound
while memory is reclaimed (`src/LocalMapping.cc:636-706`,
`src/KeyFrame.cc:489` SetBadFlag). The dense-table equivalent is
map_state.compact_keyframes (slot reuse with full reference remapping) plus
map_state.evict_keyframes (capacity eviction for non-revisiting
exploration, where redundancy culling can never free slots)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import (CameraConfig, MapCapacity, ORBConfig,
                                   SystemConfig, TrackingConfig)
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.mapping import map_state as ms
from eao_fusion_tpu.pipeline.system import System

SMALL_CAM = CameraConfig(width=320, height=240, fx=267.7, fy=269.6,
                         cx=160.0, cy=120.0, bf=40.0, th_depth=40.0)


def _small_cfg(**kw):
    base = dict(
        camera=SMALL_CAM,
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=24, max_points=3072,
                             max_local_ba_kfs=16),
        use_planes=False, use_objects=False)
    base.update(kw)
    return SystemConfig(**base)


def _build_small_map(n_frames=14):
    seq = synthetic.generate_sequence(
        n_frames=n_frames, seed=3, style="arc",
        cache_dir=synthetic.DEFAULT_CACHE)
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=16, max_points=3072,
                             max_local_ba_kfs=16),
        use_planes=False, use_objects=False)
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, timestamp=f.timestamp)
    return s, seq


def test_compact_keyframes_invariants():
    s, seq = _build_small_map()
    m = s.map
    n_kf = int(np.asarray(m.next_kf))
    assert n_kf >= 4
    # cull two mid-table keyframes by hand
    victims = [1, n_kf - 2]
    kf_valid = np.asarray(m.kf_valid).copy()
    kf_valid[victims] = False
    m = m._replace(kf_valid=jnp.asarray(kf_valid))

    m2, remap = jax.jit(ms.compact_keyframes)(m)
    remap = np.asarray(remap)
    live = np.where(kf_valid)[0]

    # insertion order preserved, table prefix-packed
    assert int(np.asarray(m2.next_kf)) == len(live)
    assert np.array_equal(np.asarray(m2.kf_valid)[:len(live)],
                          np.ones(len(live), bool))
    assert not np.asarray(m2.kf_valid)[len(live):].any()
    assert np.all(np.diff(remap[live]) > 0)          # order-preserving
    assert np.all(remap[victims] == -1)

    # per-keyframe channels moved with their slot
    for old, new in zip(live, remap[live]):
        np.testing.assert_array_equal(np.asarray(m.kf_pose)[old],
                                      np.asarray(m2.kf_pose)[new])
        np.testing.assert_array_equal(np.asarray(m.kf_frame_id)[old],
                                      np.asarray(m2.kf_frame_id)[new])
        np.testing.assert_array_equal(np.asarray(m.kf_desc_pm1)[old],
                                      np.asarray(m2.kf_desc_pm1)[new])

    # observations: every surviving point's observer set is the remap of
    # its old observer set restricted to survivors
    Z_old = np.asarray(m.obs_ind) & kf_valid[:, None]
    Z_new = np.asarray(m2.obs_ind) & np.asarray(m2.kf_valid)[:, None]
    pt_valid_new = np.asarray(m2.pt_valid)
    for p in np.where(pt_valid_new)[0][:200]:
        expect = np.zeros(m.max_kf, bool)
        obs_old = np.where(Z_old[:, p])[0]
        expect[remap[obs_old[remap[obs_old] >= 0]]] = True
        np.testing.assert_array_equal(Z_new[:, p], expect, err_msg=str(p))

    # pt_ref_kf: remapped when alive, re-anchored to an observer otherwise
    ref_old = np.asarray(m.pt_ref_kf)
    ref_new = np.asarray(m2.pt_ref_kf)
    for p in np.where(pt_valid_new)[0][:200]:
        if ref_old[p] >= 0 and kf_valid[ref_old[p]]:
            assert ref_new[p] == remap[ref_old[p]]
        else:
            assert ref_new[p] >= 0 and Z_new[ref_new[p], p]
    # a point observed ONLY by victims must be invalidated
    only_victims = (np.asarray(m.pt_valid) & (Z_old.sum(0) == 0))
    assert not (only_victims & pt_valid_new).any()


def test_evict_keyframes_protects_window():
    s, _ = _build_small_map()
    m = s.map
    n_kf = int(np.asarray(m.next_kf))
    m2 = jax.jit(ms.evict_keyframes, static_argnums=(1,))(
        m, 2, protect_recent=2)
    valid2 = np.asarray(m2.kf_valid)
    n_evicted = int(np.asarray(m.kf_valid).sum() - valid2.sum())
    assert 1 <= n_evicted <= 2
    # the newest keyframe and its strong-covisibility window survive
    assert valid2[n_kf - 1]


def test_object_created_kf_exempt_from_culling():
    """`mbCreatedByObjs` guard (`src/LocalMapping.cc:650`): a keyframe
    created for a new object survives a redundancy-cull pass that would
    otherwise remove it."""
    from eao_fusion_tpu.pipeline import local_mapping
    s, _ = _build_small_map()
    m = s.map
    cur = jnp.int32(int(np.asarray(m.next_kf)) - 1)
    cull = jax.jit(lambda m, c: local_mapping.cull_keyframes(
        m, c, redundancy=0.5))
    base = cull(m, cur)
    victims = np.where(np.asarray(m.kf_valid)
                       & ~np.asarray(base.kf_valid))[0]
    assert len(victims) >= 1, "scenario produced no culls; tighten it"
    v = int(victims[0])
    m_obj = m._replace(kf_by_obj=m.kf_by_obj.at[v].set(True))
    out = cull(m_obj, cur)
    assert bool(np.asarray(out.kf_valid)[v])


def test_object_created_kf_deprioritized_in_eviction():
    """Capacity eviction prefers any other candidate over an
    object-created keyframe (it may anchor a young object's points)."""
    s, _ = _build_small_map()
    m = s.map
    ev = jax.jit(ms.evict_keyframes, static_argnums=(1,))(
        m, 2, protect_recent=2)
    victims = np.where(np.asarray(m.kf_valid) & ~np.asarray(ev.kf_valid))[0]
    assert len(victims) >= 1
    v = int(victims[0])
    m_obj = m._replace(kf_by_obj=m.kf_by_obj.at[v].set(True))
    ev2 = jax.jit(ms.evict_keyframes, static_argnums=(1,))(
        m_obj, 2, protect_recent=2)
    assert bool(np.asarray(ev2.kf_valid)[v])


def test_system_compaction_keeps_tracking():
    """Force a compaction mid-run and check tracking + trajectory refs
    survive (the corrected trajectory stays consistent)."""
    seq = synthetic.generate_sequence(
        n_frames=24, seed=0, style="arc",
        cache_dir=synthetic.DEFAULT_CACHE)
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=12, max_points=3072,
                             max_local_ba_kfs=12),
        tracking=TrackingConfig(max_frames_between_kf=1),
        use_planes=False, use_objects=False)
    s = System(cfg)
    gt = []
    for k, f in enumerate(seq.frames):
        s.process_frame(f.gray, f.depth, timestamp=k / 30.0)
        gt.append(f.tcw)
    # at 1 KF / 3 frames over 24 frames, lifetime insertions exceed the
    # 8-slot table — compaction must have fired
    assert s.n_keyframes > cfg.capacity.max_keyframes
    assert int(np.asarray(s.map.next_kf)) <= cfg.capacity.max_keyframes
    assert s.n_resets == 0
    est = s.trajectory_tcw(corrected=True)
    err = tum.evaluate_ate_rpe(est, np.stack(gt))
    assert err.ate_rmse < 0.05, err


@pytest.mark.slow
def test_exploration_unbounded_keyframes():
    """The round-3 verdict's acceptance test: a NON-REVISITING corridor
    whose lifetime keyframe insertions exceed max_keyframes runs to
    completion with bounded tables, no resets, and stable ATE. Redundancy
    culling can't free slots here (nothing is ever redundant), so capacity
    eviction + compaction carry the whole lifecycle."""
    n = 240
    seq = synthetic.generate_sequence(
        n_frames=n, seed=5, style="corridor", camera=SMALL_CAM,
        cache_dir=synthetic.DEFAULT_CACHE)
    cfg = _small_cfg(tracking=TrackingConfig(max_frames_between_kf=6))
    s = System(cfg)
    gt = []
    for k, f in enumerate(seq.frames):
        s.process_frame(f.gray, f.depth, timestamp=f.timestamp)
        gt.append(f.tcw)

    assert s.n_keyframes > cfg.capacity.max_keyframes, s.n_keyframes
    assert int(np.asarray(s.map.next_kf)) <= cfg.capacity.max_keyframes
    assert int(np.asarray(s.map.pt_valid).sum()) <= cfg.capacity.max_points
    assert s.n_resets == 0
    n_lost = sum(1 for d in s.diags[2:] if d["n_inliers"] < 20)
    assert n_lost <= 10, n_lost

    est = s.trajectory_tcw(corrected=True)
    gt = np.stack(gt)
    err = tum.evaluate_ate_rpe(est, gt[:len(est)])
    # pure odometry over 12 m of exploration (no loops possible): a few cm
    assert err.ate_rmse < 0.10, err
    print(f"exploration: {n} frames, {s.n_keyframes} lifetime KFs into "
          f"{int(np.asarray(s.map.kf_valid).sum())} live slots "
          f"(cap {cfg.capacity.max_keyframes}), ATE "
          f"{err.ate_rmse*100:.2f} cm")
