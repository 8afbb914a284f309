"""Held-out detector numbers for NOTES (class-textured worlds, unseen seeds)."""
import numpy as np
from eao_fusion_tpu.frontend import yolox
from eao_fusion_tpu.io import synthetic

params = yolox.load_params("data/yolox_synth.npz")
depth_mult, n_classes = yolox.infer_arch(params)
det_lane = yolox.Detector(params, depth_mult=depth_mult, n_classes=n_classes)

def _iou_1(det, b):
    x0 = np.maximum(det[:, 1], b[1]); y0 = np.maximum(det[:, 2], b[2])
    x1 = np.minimum(det[:, 1] + det[:, 3], b[1] + b[3])
    y1 = np.minimum(det[:, 2] + det[:, 4], b[2] + b[4])
    inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    return inter / np.maximum(det[:, 3] * det[:, 4] + b[3] * b[4] - inter, 1e-9)

for tag, specs in [
    ("val (trainer's held-out scene)", [("arc", 9, 5, "blocky")]),
    ("held-out unseen seeds", [("arc", 20, 5, "blocky"), ("loop", 21, 6, "aperiodic"),
                               ("spin", 22, 6, "blocky"), ("arc", 23, 8, "aperiodic")]),
]:
    n_gt = hits = cls_hits = 0
    for style, seed, nobj, tex in specs:
        seq = synthetic.generate_sequence(
            n_frames=24, seed=seed, style=style, n_objects=nobj,
            class_textures=True, texture=tex, cache_dir=synthetic.DEFAULT_CACHE)
        for f in seq.frames[::3]:
            rgb = np.repeat(np.asarray(f.gray, np.float32)[..., None], 3, axis=-1)
            det_lane.submit(rgb); det = det_lane.result()
            for b in f.boxes:
                n_gt += 1
                if det is None or not len(det): continue
                iou = _iou_1(det, b); j = int(np.argmax(iou))
                if iou[j] >= 0.4:
                    hits += 1; cls_hits += int(det[j, 0]) == int(b[0])
    print(f"{tag}: n_gt={n_gt} recall={hits/max(n_gt,1):.3f} "
          f"cls_acc_on_hits={cls_hits/max(hits,1):.3f}")
