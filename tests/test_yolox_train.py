"""Synthetic-trained YOLOX: target construction + the online lane with the
shipped in-repo weights (data/yolox_synth.npz, trained by
tools/train_yolox.py — the zero-egress counterpart of the reference's
pretrained TensorRT engine, `/root/reference/src/YOLOX.cc:7-41`)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.frontend import yolox, yolox_train
from eao_fusion_tpu.io import synthetic

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "data",
                       "yolox_synth.npz")


def _seq(n=8):
    return synthetic.generate_sequence(n_frames=n, seed=0, style="arc",
                                       cache_dir=synthetic.DEFAULT_CACHE)


def _seq_ct():
    """The class-textured training-world scene (24-frame cache shared with
    tools/train_yolox.py)."""
    return synthetic.generate_sequence(
        n_frames=24, seed=0, style="arc", n_objects=4, class_textures=True,
        cache_dir=synthetic.DEFAULT_CACHE)


def _iou_1(det, b):
    ix0 = np.maximum(det[:, 1], b[1])
    iy0 = np.maximum(det[:, 2], b[2])
    ix1 = np.minimum(det[:, 1] + det[:, 3], b[1] + b[3])
    iy1 = np.minimum(det[:, 2] + det[:, 4], b[2] + b[4])
    inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
    union = det[:, 3] * det[:, 4] + b[3] * b[4] - inter
    return inter / np.maximum(union, 1e-9)


def test_build_targets_decode_roundtrip():
    """Perfect raw predictions at the assigned cells must decode back to
    the GT boxes (checks the target encoding against decode_and_nms)."""
    f = _seq().frames[2]
    assert len(f.boxes) >= 3
    pos, cls, reg = yolox_train.build_targets(f.boxes, 8)
    A = pos.shape[0]
    raw = np.full((A, 13), -20.0, np.float32)
    raw[:, :4] = 0.0
    raw[pos, 0:4] = reg[pos]
    raw[pos, 4] = 20.0
    raw[np.arange(A)[pos], 5 + cls[pos]] = 20.0
    det = np.asarray(yolox.decode_and_nms(jnp.asarray(raw),
                                          jnp.float32(1.0), n_classes=8))
    det = det[det[:, 5] > 0]
    for b in f.boxes:
        iou = _iou_1(det, b)
        j = int(np.argmax(iou))
        assert iou[j] > 0.99
        assert int(det[j, 0]) == int(b[0])


def test_flip_boxes_involution():
    f = _seq().frames[0]
    b2 = yolox_train.flip_boxes(yolox_train.flip_boxes(f.boxes, 640), 640)
    np.testing.assert_allclose(b2, f.boxes, atol=1e-3)  # f32 rounding


def test_infer_arch():
    p = yolox.init_params(jax.random.PRNGKey(0), depth_mult=1,
                          width_mult=0.25, n_classes=8)
    assert yolox.infer_arch(p) == (1, 8)


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained weights not present")
def test_online_lane_with_trained_weights():
    """The async detector lane, loaded exactly as the System loads it,
    must find the scene objects. Aggregated over several viewpoints of
    the training world (a single frame made the test flaky against the
    detector's per-view variance): box recall >= 0.6 and class accuracy
    >= 0.8 on hits (round-3 verdict item 9 floor)."""
    params = yolox.load_params(WEIGHTS)
    depth_mult, n_classes = yolox.infer_arch(params)
    assert n_classes == 8
    det_lane = yolox.Detector(params, depth_mult=depth_mult,
                              n_classes=n_classes)
    n_gt = hits = cls_hits = 0
    for i in (0, 4, 8, 12, 16, 20):
        f = _seq_ct().frames[i]
        rgb = np.repeat(np.asarray(f.gray, np.float32)[..., None], 3,
                        axis=-1)
        det_lane.submit(rgb)                # async dispatch
        det = det_lane.result()             # join
        for b in f.boxes:
            n_gt += 1
            if det is None or not len(det):
                continue
            iou = _iou_1(det, b)
            j = int(np.argmax(iou))
            if iou[j] >= 0.4:
                hits += 1
                cls_hits += int(det[j, 0]) == int(b[0])
    assert hits >= 0.6 * n_gt, f"recall {hits}/{n_gt}"
    # classes are canonical textures in this world — they must be learned
    assert cls_hits >= 0.8 * hits, (cls_hits, hits, n_gt)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained weights not present")
def test_system_online_semantic_e2e():
    """Full System run with `semantic_online=True` and NO offline boxes:
    the async detector lane must feed the EAO object subsystem — the
    reference's SemanticOnline mode end-to-end
    (`/root/reference/src/System.cc:112-114`, `src/Tracking.cc:318`)."""
    import dataclasses
    from eao_fusion_tpu.config import (SystemConfig, ORBConfig, MapCapacity)
    from eao_fusion_tpu.io import tum
    from eao_fusion_tpu.pipeline.system import System

    os.environ["EAO_YOLOX_WEIGHTS"] = os.path.abspath(WEIGHTS)
    try:
        cfg = SystemConfig(
            orb=ORBConfig(n_features=500, max_keypoints=512),
            capacity=MapCapacity(max_keyframes=64, max_points=4096),
            semantic_online=True)
        assert cfg.use_objects
        seq = _seq_ct()
        s = System(cfg)
        assert s.detector is not None
        for f in seq.frames[:10]:
            s.process_frame(f.gray, f.depth, f.timestamp)  # boxes=None!
        err = tum.evaluate_ate_rpe(s.trajectory_tcw(), seq.gt_tcw()[:10])
        assert err.ate_rmse < 0.03, err
        n_objs = int(np.asarray(s.objects.valid).sum())
        assert n_objs >= 1, "online detections created no map objects"
    finally:
        os.environ.pop("EAO_YOLOX_WEIGHTS", None)


@pytest.mark.slow
def test_training_smoke():
    """A few optimizer steps run end-to-end and reduce the loss."""
    seq = _seq(4)
    data_h = yolox_train.build_dataset([seq], 8, with_flips=False)
    data = {k: jnp.asarray(v) for k, v in data_h.items() if k != "boxes"}
    params = yolox.init_params(jax.random.PRNGKey(0), width_mult=0.125,
                               n_classes=8)
    tx, step = yolox_train.make_train_step(8, 1, batch=2, n_steps=8)
    opt = tx.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        params, opt, key, loss, _aux = step(params, opt, key, data)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
