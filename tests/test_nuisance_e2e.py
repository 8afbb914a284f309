"""Photometric-nuisance robustness suite (round-4 verdict item 5).

Every pre-round-5 accuracy number came from ideal synthetic renders; the
reference's canonical sensor is a real D435i with shot noise, exposure
hunting, motion blur, and depth dropouts (`ros_test/config/D435i.yaml`).
Real TUM data is environment-blocked (zero egress), so the achievable
proxy is `synthetic.apply_nuisance`: a physically-shaped sensor model on
top of the clean renders, with end-to-end ATE floors asserted under each
nuisance and their combination, for the RGBD and monocular lanes, plus a
BoW-retrieval degradation check (a nuisanced view must still retrieve
its clean keyframe)."""

import numpy as np
import pytest

from eao_fusion_tpu.config import (MapCapacity, ORBConfig, SystemConfig,
                                   TrackingConfig)
from eao_fusion_tpu.io import synthetic, tum
from eao_fusion_tpu.pipeline.system import System


def _cfg(**kw):
    base = dict(
        orb=ORBConfig(n_features=500, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=32, max_points=8192,
                             max_local_ba_kfs=16),
        use_planes=False, use_objects=False)
    base.update(kw)
    return SystemConfig(**base)


def _run_rgbd(seq):
    s = System(_cfg())
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, timestamp=f.timestamp)
    est = s.trajectory_tcw()
    gt = seq.gt_tcw()
    return s, tum.evaluate_ate_rpe(est[2:], gt[2:len(est)])


# ATE floors per profile (meters). Clean baseline on this arc is ~3-4 mm;
# the floors bound the DEGRADATION each nuisance may cause, with margin
# for the noise draw. Measured round-5 values are recorded in NOTES_R5.
RGBD_FLOORS = {
    "shot": 0.02,
    "exposure": 0.02,
    "blur": 0.03,
    "depth": 0.03,
    "combo": 0.04,
}


@pytest.mark.slow
@pytest.mark.parametrize("profile", sorted(RGBD_FLOORS))
def test_rgbd_ate_under_nuisance(profile):
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    nseq = synthetic.nuisance_sequence(seq, profile, seed=0)
    s, err = _run_rgbd(nseq)
    n_weak = sum(1 for d in s.diags[2:] if d["n_inliers"] < 20)
    print(f"[nuisance:{profile}] ATE {err.ate_rmse*100:.2f} cm "
          f"(floor {RGBD_FLOORS[profile]*100:.0f} cm), weak frames "
          f"{n_weak}")
    assert err.ate_rmse < RGBD_FLOORS[profile], (profile, err)
    assert n_weak <= 2, (profile, n_weak)


@pytest.mark.slow
def test_mono_ate_under_combo():
    """Monocular lane under the combined nuisance: scale-aligned ATE.
    The clean mono bar is 4 cm (tests/test_mono_e2e.py); combo gets 8."""
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    nseq = synthetic.nuisance_sequence(seq, "combo", seed=0)
    s = System(_cfg(sensor="mono",
                    tracking=TrackingConfig(max_frames_between_kf=3)))
    for f in nseq.frames:
        s.process_frame(f.gray, None, timestamp=f.timestamp)
    est = s.trajectory_tcw()
    gt = seq.gt_tcw()
    nonid = [i for i, p in enumerate(s.trajectory)
             if np.linalg.norm(np.asarray(p)[4:]) > 1e-6]
    assert nonid, "mono init never produced motion under combo nuisance"
    i0 = nonid[0]
    err = tum.evaluate_ate_rpe(est[i0:], gt[i0:len(est)], align=True,
                               with_scale=True)
    print(f"[nuisance:mono-combo] scale-aligned ATE "
          f"{err.ate_rmse*100:.2f} cm")
    assert err.ate_rmse < 0.08, err


@pytest.mark.slow
def test_retrieval_survives_nuisance():
    """A nuisanced view of a mapped scene must still retrieve its clean
    keyframe through the BoW database (vocabulary robustness — the
    detector/descriptor chain degrades before retrieval does)."""
    import jax.numpy as jnp
    from eao_fusion_tpu.frontend import extractor
    from eao_fusion_tpu.mapping import vocabulary
    seq = synthetic.generate_sequence(n_frames=20, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    cfg = _cfg()
    s = System(cfg)
    for f in seq.frames:
        s.process_frame(f.gray, f.depth, timestamp=f.timestamp)
    assert s.loop_closer is not None
    lc = s.loop_closer
    kf_valid = np.asarray(s.map.kf_valid)
    kf_fids = np.asarray(s.map.kf_frame_id)
    from eao_fusion_tpu.mapping import covisibility
    Z = covisibility.observation_indicator(s.map)
    covis = np.asarray(covisibility.covisibility_counts(Z))
    nseq = synthetic.nuisance_sequence(seq, "combo", seed=0)
    hits = exact = total = 0
    for slot in np.where(kf_valid)[0]:
        fid = int(kf_fids[slot])
        nf = nseq.frames[fid]
        feats = extractor.extract_features(
            jnp.asarray(nf.gray), jnp.asarray(nf.depth),
            orb_cfg=cfg.orb, cam_cfg=cfg.camera)
        v = vocabulary.bow_vector(lc.vocab, feats.desc_pm1, feats.valid)
        scores = np.asarray(vocabulary.l1_scores(v, lc.bow,
                                                 s.map.kf_valid))
        total += 1
        top = int(np.argmax(scores))
        exact += top == int(slot)
        # relocalization/loop gating only needs a COVISIBLE keyframe of
        # the true view (BoW+PnP then localizes against its points) —
        # adjacent arc keyframes see nearly the same scene, so exact
        # top-1 is stricter than anything the pipeline requires
        hits += (top == int(slot)) or (covis[slot, top] >= 15)
    print(f"[nuisance:retrieval] covisible-top-1 {hits}/{total} "
          f"(exact {exact}/{total}) under combo")
    assert hits >= 0.8 * total, (hits, exact, total)


@pytest.mark.slow
def test_detector_recall_under_nuisance():
    """Online detector recall degradation under the combined photometric
    nuisance (reported for NOTES; floor: recall keeps half its clean
    value and stays >= 0.4)."""
    import os
    weights = os.path.join(os.path.dirname(__file__), "..", "data",
                           "yolox_synth.npz")
    if not os.path.exists(weights):
        pytest.skip("trained weights not present")
    from eao_fusion_tpu.frontend import yolox
    params = yolox.load_params(weights)
    depth_mult, n_classes = yolox.infer_arch(params)
    det_lane = yolox.Detector(params, depth_mult=depth_mult,
                              n_classes=n_classes)
    seq = synthetic.generate_sequence(
        n_frames=24, seed=0, style="arc", n_objects=4, class_textures=True,
        cache_dir=synthetic.DEFAULT_CACHE)

    def _recall(frames):
        n_gt = hits = 0
        for f in frames:
            rgb = np.repeat(np.asarray(f.gray, np.float32)[..., None], 3,
                            axis=-1)
            det_lane.submit(rgb)
            det = det_lane.result()
            for b in f.boxes:
                n_gt += 1
                if det is None or not len(det):
                    continue
                ix0 = np.maximum(det[:, 1], b[1])
                iy0 = np.maximum(det[:, 2], b[2])
                ix1 = np.minimum(det[:, 1] + det[:, 3], b[1] + b[3])
                iy1 = np.minimum(det[:, 2] + det[:, 4], b[2] + b[4])
                inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
                iou = inter / np.maximum(
                    det[:, 3] * det[:, 4] + b[3] * b[4] - inter, 1e-9)
                hits += float(iou.max()) >= 0.4
        return hits / max(n_gt, 1)

    sel = seq.frames[::4]
    r_clean = _recall(sel)
    nseq = synthetic.nuisance_sequence(seq, "combo", seed=0)
    r_noisy = _recall(nseq.frames[::4])
    print(f"[nuisance:detector] recall clean {r_clean:.2f} -> combo "
          f"{r_noisy:.2f}")
    assert r_noisy >= max(0.4, 0.5 * r_clean), (r_clean, r_noisy)
