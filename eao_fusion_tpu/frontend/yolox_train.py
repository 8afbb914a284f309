"""Train the YOLOX detector on the in-repo synthetic renderer.

The reference ships a pretrained TensorRT engine and simply deserializes it
(`/root/reference/src/YOLOX.cc:7-41`); this build environment has zero
egress, so the official checkpoint cannot be fetched. Instead we *train*
the very same detector graph (frontend/yolox.py, width-0.25 variant) on
ray-cast room scenes with exact ground-truth boxes
(io/synthetic.project_boxes) and ship the learned weights, so the ONLINE
semantic lane (`System(online_detector=True)`) runs end-to-end with real
weights — the counterpart of the reference's `SemanticOnline` mode
(`/root/reference/src/Tracking.cc:235-240`).

Assignment is a static FCOS-style center prior instead of SimOTA: each GT
box is routed to one FPN level by its max side, and every cell whose center
lies within `center_radius * stride` of the box center (and inside the box)
is positive. This keeps target construction a fixed-shape host-side
precomputation — the train step itself is one jitted function with
on-device batch sampling (no per-step host->device transfer, which matters
on a tunneled TPU).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.frontend import yolox

# level routing by max box side (pixels, letterboxed 640 input):
# stride 8 takes small boxes, 32 the large ones (FCOS scale ranges).
LEVEL_MAX_SIDE = (64.0, 160.0, 1e9)
CENTER_RADIUS = 1.5
PAD_VAL = 114.0 / 255.0


# ------------------------------------------------------------- target build

def build_targets(boxes: np.ndarray, n_classes: int,
                  input_size: int = yolox.INPUT_SIZE
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """boxes [B, 6] (class, x, y, w, h, score) in letterboxed pixels ->
    (pos [A] bool, cls [A] int32, reg [A, 4] f32) where reg holds the raw
    head regression targets (tx, ty, tw, th): the decode in
    `yolox.decode_and_nms` computes cx = (tx + gx) * s and w = exp(tw) * s,
    so tx = cx/s - gx, tw = log(w/s)."""
    grid, stride = yolox._grids(input_size)
    A = grid.shape[0]
    pos = np.zeros((A,), bool)
    cls = np.zeros((A,), np.int32)
    reg = np.zeros((A, 4), np.float32)
    if len(boxes) == 0:
        return pos, cls, reg
    # smaller boxes assigned last win conflicted cells (they are harder)
    order = np.argsort(-(boxes[:, 3] * boxes[:, 4]))
    cell_cx = (grid[:, 0] + 0.5) * stride
    cell_cy = (grid[:, 1] + 0.5) * stride
    for b in boxes[order]:
        c, x, y, w, h = int(b[0]), b[1], b[2], b[3], b[4]
        if w <= 2 or h <= 2:
            continue
        lvl = int(np.searchsorted(LEVEL_MAX_SIDE, max(w, h)))
        lvl = min(lvl, len(yolox.STRIDES) - 1)
        s = float(yolox.STRIDES[lvl])
        on_lvl = stride == s
        bcx, bcy = x + w / 2, y + h / 2
        near = (np.abs(cell_cx - bcx) <= CENTER_RADIUS * s) & \
               (np.abs(cell_cy - bcy) <= CENTER_RADIUS * s)
        inside = (cell_cx >= x) & (cell_cx <= x + w) & \
                 (cell_cy >= y) & (cell_cy <= y + h)
        sel = on_lvl & near & inside
        if not sel.any():   # tiny/edge box: fall back to the center cell
            d2 = (cell_cx - bcx) ** 2 + (cell_cy - bcy) ** 2
            d2[~on_lvl] = np.inf
            sel = np.zeros((A,), bool)
            sel[int(np.argmin(d2))] = True
        pos |= sel
        cls[sel] = c
        reg[sel, 0] = bcx / s - grid[sel, 0]
        reg[sel, 1] = bcy / s - grid[sel, 1]
        reg[sel, 2] = np.log(max(w, 1e-3) / s)
        reg[sel, 3] = np.log(max(h, 1e-3) / s)
    return pos, cls, reg


def flip_boxes(boxes: np.ndarray, width: int) -> np.ndarray:
    out = boxes.copy()
    if len(out):
        out[:, 1] = width - out[:, 1] - out[:, 3]
    return out


# ------------------------------------------------------------------ dataset

def _zoom_out(gray: np.ndarray, boxes: np.ndarray, scale: float
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Scale-augmentation copy: shrink the frame by `scale` into a
    pad-value canvas of the SAME size (so the scale-1 letterbox path and
    pixel-space targets stay consistent) and scale the boxes. Teaches
    the class head scale invariance — without it the head memorizes the
    object scales/contexts of the training scenes (round-4: train-scene
    class accuracy 0.95 vs held-out 0.43)."""
    h, w = gray.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ys = (np.arange(nh) / scale).astype(np.int32).clip(0, h - 1)
    xs = (np.arange(nw) / scale).astype(np.int32).clip(0, w - 1)
    small = gray[ys][:, xs]
    canvas = np.full_like(gray, PAD_VAL)
    canvas[:nh, :nw] = small
    b = boxes.copy()
    if len(b):
        b[:, 1:5] *= scale
    return canvas, b


def build_dataset(seqs, n_classes: int, with_flips: bool = True,
                  zoom_scales: Tuple[float, ...] = (0.75, 0.55)
                  ) -> Dict[str, np.ndarray]:
    """seqs: iterable of SyntheticSequence. Returns stacked host arrays:
    gray [N, H, W] f32, pos [N, A] bool, cls [N, A] i32, reg [N, A, 4]."""
    grays, poss, clss, regs, boxes_all = [], [], [], [], []

    def add(g, b):
        p, c, r = build_targets(b, n_classes)
        grays.append(np.asarray(g, np.float32))
        poss.append(p)
        clss.append(c)
        regs.append(r)
        boxes_all.append(b)

    for seq in seqs:
        w = seq.camera.width
        for i, f in enumerate(seq.frames):
            for flip in ((False, True) if with_flips else (False,)):
                g = f.gray[:, ::-1] if flip else f.gray
                b = flip_boxes(f.boxes, w) if flip else f.boxes
                add(g, b)
                # one zoomed copy per frame, scale cycled by frame index
                if zoom_scales:
                    s = zoom_scales[i % len(zoom_scales)]
                    add(*_zoom_out(g, b, s))
    return {"gray": np.stack(grays), "pos": np.stack(poss),
            "cls": np.stack(clss), "reg": np.stack(regs),
            "boxes": boxes_all}


# ----------------------------------------------------------------- training

def _letterbox_batch(gray: jax.Array, size: int) -> jax.Array:
    """[B, H, W] grayscale -> [B, size, size, 3] letterboxed RGB (the
    synthetic camera is 640x480: scale 1, bottom padding — matches
    yolox.letterbox for this geometry)."""
    b, h, w = gray.shape
    if max(h, w) != size:
        # this pad-only path is valid only when letterbox scale == 1;
        # any other camera would silently mismatch yolox.letterbox's
        # resize and the pixel-space targets from build_targets
        raise ValueError(
            f"_letterbox_batch requires max(h, w) == {size} (scale-1 "
            f"letterbox); got {h}x{w} — resize the training images or "
            f"generalize this function first")
    img = jnp.pad(gray, ((0, 0), (0, size - h), (0, size - w)),
                  constant_values=PAD_VAL)
    return jnp.repeat(img[..., None], 3, axis=-1)


def make_train_step(n_classes: int, depth_mult: int, batch: int,
                    n_steps: int, lr_peak: float = 1e-3):
    import optax
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr_peak, warmup_steps=min(100, n_steps // 10 + 1),
        decay_steps=n_steps, end_value=lr_peak * 1e-2)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(sched, weight_decay=5e-4))

    def loss_fn(params, gray, pos, cls, reg, key):
        imgs = _letterbox_batch(gray, yolox.INPUT_SIZE)
        # photometric jitter: contrast/brightness/noise
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.uniform(k1, (batch, 1, 1, 1), minval=0.8, maxval=1.2)
        bsh = jax.random.uniform(k2, (batch, 1, 1, 1), minval=-0.1, maxval=0.1)
        imgs = jnp.clip(imgs * a + bsh
                        + 0.01 * jax.random.normal(k3, imgs.shape), 0.0, 1.3)
        raw = jax.vmap(
            lambda im: yolox.yolox_forward(params, im[None], depth_mult))(imgs)
        import optax as _ox
        posf = pos.astype(jnp.float32)
        npos = jnp.maximum(posf.sum(), 1.0)
        l_obj = _ox.sigmoid_binary_cross_entropy(raw[..., 4], posf).sum()
        # class head: plain BCE at 2x weight (focal modulation was tried
        # round 4 and COLLAPSED the head to 0.40 held-out accuracy — with
        # 8 balanced classes there is no easy-negative imbalance for the
        # (1-p_t)^2 term to fix; it just starves the gradient)
        cls1h = jax.nn.one_hot(cls, n_classes)
        bce = _ox.sigmoid_binary_cross_entropy(raw[..., 5:], cls1h)
        l_cls = (bce.sum(-1) * posf).sum()
        l_reg = (jnp.abs(raw[..., 0:4] - reg).sum(-1) * posf).sum()
        return (l_obj + l_cls + 5.0 * l_reg) / npos, \
            {"obj": l_obj / npos, "cls": l_cls / npos, "reg": l_reg / npos}

    @jax.jit
    def step(params, opt_state, key, data):
        k_idx, k_aug, k_next = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch,), 0, data["gray"].shape[0])
        g = jnp.take(data["gray"], idx, axis=0)
        p = jnp.take(data["pos"], idx, axis=0)
        c = jnp.take(data["cls"], idx, axis=0)
        r = jnp.take(data["reg"], idx, axis=0)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, g, p, c, r, k_aug)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, k_next, loss, aux

    return tx, step


def evaluate(params: Dict, depth_mult: int, n_classes: int,
             grays: Sequence[np.ndarray], boxes: Sequence[np.ndarray],
             iou_thresh: float = 0.4) -> Dict[str, float]:
    """Box recall + class accuracy of decoded detections vs GT."""
    det_fn = jax.jit(lambda p, im, sc: yolox.decode_and_nms(
        yolox.yolox_forward(p, im, depth_mult), sc, n_classes=n_classes))
    n_gt = n_hit = n_cls = n_det = 0
    for g, gt in zip(grays, boxes):
        x, scale = yolox.letterbox(
            jnp.repeat(jnp.asarray(g, jnp.float32)[..., None], 3, -1))
        det = np.asarray(det_fn(params, x, scale))
        det = det[det[:, 5] > 0]
        n_det += len(det)
        for b in gt:
            n_gt += 1
            if len(det) == 0:
                continue
            ix0 = np.maximum(det[:, 1], b[1])
            iy0 = np.maximum(det[:, 2], b[2])
            ix1 = np.minimum(det[:, 1] + det[:, 3], b[1] + b[3])
            iy1 = np.minimum(det[:, 2] + det[:, 4], b[2] + b[4])
            inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
            union = det[:, 3] * det[:, 4] + b[3] * b[4] - inter
            iou = inter / np.maximum(union, 1e-9)
            j = int(np.argmax(iou))
            if iou[j] >= iou_thresh:
                n_hit += 1
                n_cls += int(det[j, 0]) == int(b[0])
    return {"recall": n_hit / max(n_gt, 1),
            "cls_acc": n_cls / max(n_hit, 1),
            "dets_per_img": n_det / max(len(grays), 1)}


def train(train_seqs, val_seq, *, n_classes: int = 8, width_mult: float = 0.25,
          depth_mult: int = 1, batch: int = 8, n_steps: int = 1200,
          seed: int = 0, log=print) -> Tuple[Dict, Dict[str, float]]:
    """Full training run; returns (trained param tree, held-out metrics)."""
    data_h = build_dataset(train_seqs, n_classes)
    log(f"dataset: {data_h['gray'].shape[0]} images "
        f"(pos cells/img {data_h['pos'].sum(1).mean():.1f})")
    data = {k: jnp.asarray(v) for k, v in data_h.items() if k != "boxes"}

    params = yolox.init_params(jax.random.PRNGKey(seed),
                               depth_mult=depth_mult, width_mult=width_mult,
                               n_classes=n_classes)
    tx, step = make_train_step(n_classes, depth_mult, batch, n_steps)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + 1)

    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, key, loss, aux = step(params, opt_state, key, data)
        if i % 100 == 0 or i == n_steps - 1:
            log(f"step {i:5d} loss {float(loss):8.3f} "
                f"obj {float(aux['obj']):7.3f} cls {float(aux['cls']):6.3f} "
                f"reg {float(aux['reg']):6.3f} [{time.time()-t0:.0f}s]")
    val_grays = [f.gray for f in val_seq.frames]
    val_boxes = [f.boxes for f in val_seq.frames]
    m = evaluate(params, depth_mult, n_classes, val_grays, val_boxes)
    log(f"held-out: recall {m['recall']:.3f} cls_acc {m['cls_acc']:.3f} "
        f"dets/img {m['dets_per_img']:.1f}")
    return params, m
