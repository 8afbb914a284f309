"""YOLOX object detector as a JAX inference lane.

Re-design of the reference's TensorRT YOLOX thread (`src/YOLOX.cc`,
`include/YOLOX.h`): the same YOLOX-s graph (CSPDarknet53-s backbone, PAFPN
neck, decoupled anchor-free head, strides {8, 16, 32}), the same pre/post
processing — 640x640 letterbox resize (`StaticResize` :51), grid decode
(`GenerateGridsAndStride`/`GenerateYoloxProposals` :64-209), score filter +
class-wise NMS 0.65 (:85-164) — implemented as pure jnp with fixed-shape
top-k NMS instead of dynamic lists.

Weights: the runtime loads a converted checkpoint (.npz). A converter from
the official torch yolox_s.pth is provided (`convert_torch_checkpoint`) so
users with the reference's engine weights can port them offline; tests use
a tiny randomly-initialized variant plus the offline-box reader path (the
reference's own parity mode, `src/Tracking.cc:476-524`).

The thread protocol of the reference (latest-wins image/result queues,
bounded 25 ms wait — `src/YOLOX.cc:412-461`, `src/Tracking.cc:409-420`)
maps to JAX async dispatch: `Detector.submit` launches the jitted forward
without blocking; `Detector.result` materializes it — extraction overlaps
detection exactly like the reference's thread pair (SURVEY.md §3.5).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INPUT_SIZE = 640
STRIDES = (8, 16, 32)
NMS_THRESHOLD = 0.65
CONF_THRESHOLD = 0.3
MAX_DETECTIONS = 32


# ------------------------------------------------------------------ layers

def _conv(p, x, stride=1, groups=1):
    """'BaseConv': conv + BN (folded) + SiLU."""
    w = p["w"]  # [kh, kw, cin/groups, cout]
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    y = y + p["b"]
    return y * jax.nn.sigmoid(y)     # SiLU


def _dwconv(p, x, stride=1):
    y = _conv(p["dw"], x, stride, groups=x.shape[-1])
    return _conv(p["pw"], y, 1)


def _bottleneck(p, x, shortcut=True):
    y = _conv(p["c1"], x)
    y = _conv(p["c2"], y)
    return x + y if shortcut else y


def _csp(p, x, n, shortcut=True):
    a = _conv(p["c1"], x)
    b = _conv(p["c2"], x)
    for i in range(n):
        a = _bottleneck(p[f"m{i}"], a, shortcut)
    return _conv(p["c3"], jnp.concatenate([a, b], axis=-1))


def _focus(p, x):
    """Space-to-depth stem."""
    tl = x[:, ::2, ::2]
    bl = x[:, 1::2, ::2]
    tr = x[:, ::2, 1::2]
    br = x[:, 1::2, 1::2]
    return _conv(p["conv"], jnp.concatenate([tl, bl, tr, br], axis=-1))


def _sppf(p, x):
    a = _conv(p["c1"], x)
    def pool(v, k):
        return jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                     (1, k, k, 1), (1, 1, 1, 1), "SAME")
    p5 = pool(a, 5)
    p9 = pool(a, 9)
    p13 = pool(a, 13)
    return _conv(p["c2"], jnp.concatenate([a, p5, p9, p13], axis=-1))


def _upsample(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), "nearest")


# --------------------------------------------------------------- the model

def yolox_forward(params: Dict, img: jax.Array, depth_mult: int = 1
                  ) -> jax.Array:
    """img: [1, 640, 640, 3] normalized. Returns raw head outputs
    concatenated as [n_anchors, 5 + n_classes] (pre-decode)."""
    n = depth_mult
    # backbone (CSPDarknet)
    x = _focus(params["stem"], img)                       # /2
    x = _conv(params["dark2_down"], x, 2)                 # /4
    x = _csp(params["dark2_csp"], x, n)
    x = _conv(params["dark3_down"], x, 2)                 # /8
    c3 = _csp(params["dark3_csp"], x, 3 * n)
    x = _conv(params["dark4_down"], c3, 2)                # /16
    c4 = _csp(params["dark4_csp"], x, 3 * n)
    x = _conv(params["dark5_down"], c4, 2)                # /32
    x = _sppf(params["sppf"], x)
    c5 = _csp(params["dark5_csp"], x, n, shortcut=False)

    # PAFPN
    lat5 = _conv(params["lateral5"], c5)
    f4 = _csp(params["fpn4"], jnp.concatenate([_upsample(lat5), c4], -1),
              n, shortcut=False)
    lat4 = _conv(params["lateral4"], f4)
    f3 = _csp(params["fpn3"], jnp.concatenate([_upsample(lat4), c3], -1),
              n, shortcut=False)                          # /8 out
    d3 = _conv(params["down3"], f3, 2)
    p4 = _csp(params["pan4"], jnp.concatenate([d3, lat4], -1),
              n, shortcut=False)                          # /16 out
    d4 = _conv(params["down4"], p4, 2)
    p5 = _csp(params["pan5"], jnp.concatenate([d4, lat5], -1),
              n, shortcut=False)                          # /32 out

    outs = []
    for name, feat in (("head8", f3), ("head16", p4), ("head32", p5)):
        hp = params[name]
        s = _conv(hp["stem"], feat)
        cls = _conv(hp["cls1"], s)
        cls = _conv(hp["cls2"], cls)
        cls_out = _conv_linear(hp["cls_pred"], cls)
        reg = _conv(hp["reg1"], s)
        reg = _conv(hp["reg2"], reg)
        reg_out = _conv_linear(hp["reg_pred"], reg)
        obj_out = _conv_linear(hp["obj_pred"], reg)
        o = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
        outs.append(o.reshape(-1, o.shape[-1]))
    return jnp.concatenate(outs, axis=0)


def _conv_linear(p, x):
    w = p["w"]
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


# -------------------------------------------------------------- decode/NMS

def _grids(input_size: int = INPUT_SIZE):
    gs, ss = [], []
    for s in STRIDES:
        n = input_size // s
        gy, gx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        gs.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        ss.append(np.full((n * n,), s))
    return (np.concatenate(gs).astype(np.float32),
            np.concatenate(ss).astype(np.float32))


_GRID, _STRIDE = _grids()


@functools.partial(jax.jit, static_argnames=("n_classes",))
def decode_and_nms(raw: jax.Array, scale: jax.Array, n_classes: int = 80
                   ) -> jax.Array:
    """raw [A, 5+n_classes] -> detections [MAX_DETECTIONS, 6]
    (class, x, y, w, h, score) in original-image pixels; empty rows have
    score 0. Anchor-free decode (`GenerateYoloxProposals`) + CLASS-AGNOSTIC
    greedy NMS over the top-k candidates (matching the reference's
    NmsSortedBboxes, `src/YOLOX.cc:131-163`, which compares boxes
    regardless of label)."""
    grid = jnp.asarray(_GRID)
    stride = jnp.asarray(_STRIDE)
    cx = (raw[:, 0] + grid[:, 0]) * stride
    cy = (raw[:, 1] + grid[:, 1]) * stride
    w = jnp.exp(raw[:, 2]) * stride
    h = jnp.exp(raw[:, 3]) * stride
    obj = jax.nn.sigmoid(raw[:, 4])
    cls = jax.nn.sigmoid(raw[:, 5:5 + n_classes])
    score = obj[:, None] * cls
    best_cls = jnp.argmax(score, axis=1)
    best_score = jnp.max(score, axis=1)

    K = 128
    top_s, top_i = jax.lax.top_k(best_score, K)
    bx0 = (cx - w / 2)[top_i] / scale
    by0 = (cy - h / 2)[top_i] / scale
    bw = w[top_i] / scale
    bh = h[top_i] / scale
    bc = best_cls[top_i]
    alive = top_s > CONF_THRESHOLD

    # greedy NMS over the K candidates (already score-sorted)
    x0, y0 = bx0, by0
    x1, y1 = bx0 + bw, by0 + bh
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    area = jnp.maximum(bw, 0) * jnp.maximum(bh, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    # CLASS-AGNOSTIC suppression: the reference's NmsSortedBboxes compares
    # boxes regardless of label (`src/YOLOX.cc:131-163`) — a class-wise NMS
    # (official multi-label YOLOX style) keeps near-duplicate boxes with
    # different class heads alive, which measurably corrupted the online
    # lane's class assignments on the synthetic-trained detector

    def body(i, keep):
        sup = keep & (iou[i] > NMS_THRESHOLD) & \
            (jnp.arange(K) > i) & keep[i]
        return keep & (~sup)

    keep = jax.lax.fori_loop(0, K, body, alive)
    order = jnp.argsort(~keep)  # kept first
    sel = order[:MAX_DETECTIONS]
    det = jnp.stack([bc[sel].astype(jnp.float32), x0[sel], y0[sel],
                     bw[sel], bh[sel],
                     jnp.where(keep[sel], top_s[sel], 0.0)], axis=-1)
    return det


# ------------------------------------------------------------ preprocessing

def letterbox(img_rgb: jax.Array, size: int = INPUT_SIZE
              ) -> Tuple[jax.Array, jax.Array]:
    """[H, W, 3] float [0,1] -> ([1, size, size, 3], scale). The reference
    letterboxes with gray padding (`StaticResize`, `src/YOLOX.cc:51`)."""
    h, w, _ = img_rgb.shape
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(img_rgb, (nh, nw, 3), "bilinear")
    canvas = jnp.full((size, size, 3), 114.0 / 255.0, img_rgb.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
    return canvas[None], jnp.float32(scale)


# ---------------------------------------------------------------- detector

class Detector:
    """Async detection lane with the reference's latest-wins semantics."""

    def __init__(self, params: Dict, depth_mult: int = 1, n_classes: int = 80):
        self.params = params
        self.n_classes = n_classes
        self.depth_mult = depth_mult
        self._pending = None

        @jax.jit
        def _run(params, img1, scale):
            raw = yolox_forward(params, img1, depth_mult)
            return decode_and_nms(raw, scale, n_classes=n_classes)
        self._run = _run

    def submit(self, img_rgb: np.ndarray) -> None:
        """Non-blocking dispatch (InsertImage, `src/YOLOX.cc:457`)."""
        x, scale = letterbox(jnp.asarray(img_rgb, jnp.float32))
        self._pending = self._run(self.params, x, scale)

    def result(self) -> Optional[np.ndarray]:
        """Materialize the latest result (GetResult, `src/YOLOX.cc:412`)."""
        if self._pending is None:
            return None
        det = np.asarray(self._pending)
        self._pending = None
        return det[det[:, 5] > 0]


# ------------------------------------------------------------ param init/io

def init_params(key, depth_mult: int = 1, width_mult: float = 0.5,
                n_classes: int = 80) -> Dict:
    """Random init with YOLOX-s dimensions (width 0.5, depth 0.33 -> n=1)."""
    wb = int(64 * width_mult)

    def conv(key, cin, cout, k=3):
        k1, key = jax.random.split(key)
        std = 1.0 / np.sqrt(cin * k * k)
        return {"w": jax.random.normal(k1, (k, k, cin, cout)) * std,
                "b": jnp.zeros((cout,))}, key

    key = jax.random.PRNGKey(0) if key is None else key
    p: Dict = {}

    def csp(key, cin, cout, n, expand=0.5):
        d = {}
        hid = int(cout * expand)
        d["c1"], key = conv(key, cin, hid, 1)
        d["c2"], key = conv(key, cin, hid, 1)
        d["c3"], key = conv(key, 2 * hid, cout, 1)
        for i in range(n):
            m = {}
            m["c1"], key = conv(key, hid, hid, 1)
            m["c2"], key = conv(key, hid, hid, 3)
            d[f"m{i}"] = m
        return d, key

    n = depth_mult
    p["stem"] = {}
    p["stem"]["conv"], key = conv(key, 12, wb, 3)
    p["dark2_down"], key = conv(key, wb, 2 * wb, 3)
    p["dark2_csp"], key = csp(key, 2 * wb, 2 * wb, n)
    p["dark3_down"], key = conv(key, 2 * wb, 4 * wb, 3)
    p["dark3_csp"], key = csp(key, 4 * wb, 4 * wb, 3 * n)
    p["dark4_down"], key = conv(key, 4 * wb, 8 * wb, 3)
    p["dark4_csp"], key = csp(key, 8 * wb, 8 * wb, 3 * n)
    p["dark5_down"], key = conv(key, 8 * wb, 16 * wb, 3)
    p["sppf"] = {}
    p["sppf"]["c1"], key = conv(key, 16 * wb, 8 * wb, 1)
    p["sppf"]["c2"], key = conv(key, 32 * wb, 16 * wb, 1)
    p["dark5_csp"], key = csp(key, 16 * wb, 16 * wb, n)

    p["lateral5"], key = conv(key, 16 * wb, 8 * wb, 1)
    p["fpn4"], key = csp(key, 16 * wb, 8 * wb, n)
    p["lateral4"], key = conv(key, 8 * wb, 4 * wb, 1)
    p["fpn3"], key = csp(key, 8 * wb, 4 * wb, n)
    p["down3"], key = conv(key, 4 * wb, 4 * wb, 3)
    p["pan4"], key = csp(key, 8 * wb, 8 * wb, n)
    p["down4"], key = conv(key, 8 * wb, 8 * wb, 3)
    p["pan5"], key = csp(key, 16 * wb, 16 * wb, n)

    for name, cin in (("head8", 4 * wb), ("head16", 8 * wb),
                      ("head32", 16 * wb)):
        h = {}
        h["stem"], key = conv(key, cin, 4 * wb, 1)
        h["cls1"], key = conv(key, 4 * wb, 4 * wb, 3)
        h["cls2"], key = conv(key, 4 * wb, 4 * wb, 3)
        h["cls_pred"], key = conv(key, 4 * wb, n_classes, 1)
        h["reg1"], key = conv(key, 4 * wb, 4 * wb, 3)
        h["reg2"], key = conv(key, 4 * wb, 4 * wb, 3)
        h["reg_pred"], key = conv(key, 4 * wb, 4, 1)
        h["obj_pred"], key = conv(key, 4 * wb, 1, 1)
        p[name] = h
    return p


def save_params(path: str, params: Dict, dtype=None) -> None:
    """dtype=np.float16 halves the on-disk size (weights are re-cast to
    f32 on load; detection is insensitive to f16 storage rounding)."""
    flat = {}

    def rec(prefix, d):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(f"{prefix}{k}.", v)
            else:
                a = np.asarray(v)
                flat[f"{prefix}{k}"] = a.astype(dtype) if dtype else a
    rec("", params)
    np.savez_compressed(path, **flat)


def infer_arch(params: Dict) -> Tuple[int, int]:
    """(depth_mult, n_classes) from a loaded tree — lets the runtime open
    any width/depth/class variant without a sidecar config."""
    n_classes = int(np.asarray(params["head8"]["cls_pred"]["w"]).shape[-1])
    n_m = len([k for k in params["dark3_csp"] if k.startswith("m")])
    return max(n_m // 3, 1), n_classes


def load_params(path: str) -> Dict:
    z = np.load(path)
    params: Dict = {}
    for key in z.files:
        parts = key.split(".")
        d = params
        for part in parts[:-1]:
            d = d.setdefault(part, {})
        d[parts[-1]] = jnp.asarray(z[key], jnp.float32)
    return params


# ------------------------------------------------- torch checkpoint import

# our module name -> torch module path in the official YOLOX layout
# (Megvii YOLOX: YOLOX = {backbone: YOLOPAFPN{backbone: CSPDarknet, ...},
#  head: YOLOXHead}; the reference serializes exactly this graph into its
# TensorRT engine, `/root/reference/src/YOLOX.cc:7-41`)
_TORCH_MAP = {
    "stem.conv": "backbone.backbone.stem.conv",
    "dark2_down": "backbone.backbone.dark2.0",
    "dark2_csp": "backbone.backbone.dark2.1",
    "dark3_down": "backbone.backbone.dark3.0",
    "dark3_csp": "backbone.backbone.dark3.1",
    "dark4_down": "backbone.backbone.dark4.0",
    "dark4_csp": "backbone.backbone.dark4.1",
    "dark5_down": "backbone.backbone.dark5.0",
    "sppf.c1": "backbone.backbone.dark5.1.conv1",
    "sppf.c2": "backbone.backbone.dark5.1.conv2",
    "dark5_csp": "backbone.backbone.dark5.2",
    "lateral5": "backbone.lateral_conv0",
    "fpn4": "backbone.C3_p4",
    "lateral4": "backbone.reduce_conv1",
    "fpn3": "backbone.C3_p3",
    "down3": "backbone.bu_conv2",
    "pan4": "backbone.C3_n3",
    "down4": "backbone.bu_conv1",
    "pan5": "backbone.C3_n4",
}
for _i, _h in enumerate(("head8", "head16", "head32")):
    _TORCH_MAP.update({
        f"{_h}.stem": f"head.stems.{_i}",
        f"{_h}.cls1": f"head.cls_convs.{_i}.0",
        f"{_h}.cls2": f"head.cls_convs.{_i}.1",
        f"{_h}.cls_pred": f"head.cls_preds.{_i}",
        f"{_h}.reg1": f"head.reg_convs.{_i}.0",
        f"{_h}.reg2": f"head.reg_convs.{_i}.1",
        f"{_h}.reg_pred": f"head.reg_preds.{_i}",
        f"{_h}.obj_pred": f"head.obj_preds.{_i}",
    })
_CSP_SUB = {"c1": "conv1", "c2": "conv2", "c3": "conv3"}
_PLAIN_CONVS = ("cls_pred", "reg_pred", "obj_pred")  # bias, no BN
_BN_EPS = 1e-3   # YOLOX builds BatchNorm2d(eps=0.001, momentum=0.03)


def fold_conv_bn(w_oihw: np.ndarray, gamma, beta, mean, var,
                 eps: float = _BN_EPS) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm into the preceding conv: y = BN(conv(x)) becomes one
    conv with w' = w * gamma/sqrt(var+eps) (per output channel) and
    b' = beta - mean * gamma/sqrt(var+eps). Returns (w_hwio, b)."""
    scale = gamma / np.sqrt(var + eps)
    w = w_oihw * scale[:, None, None, None]
    b = beta - mean * scale
    return w.transpose(2, 3, 1, 0).astype(np.float32), b.astype(np.float32)


def convert_torch_state_dict(sd: Dict, n_classes: int = 80) -> Dict:
    """Map an official YOLOX state dict (numpy or torch tensors) to this
    module's param tree, folding every BatchNorm into its conv."""
    def arr(key):
        v = sd[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    def base_conv(tpath):
        return fold_conv_bn(arr(f"{tpath}.conv.weight"),
                            arr(f"{tpath}.bn.weight"),
                            arr(f"{tpath}.bn.bias"),
                            arr(f"{tpath}.bn.running_mean"),
                            arr(f"{tpath}.bn.running_var"))

    def plain_conv(tpath):
        w = arr(f"{tpath}.weight").transpose(2, 3, 1, 0).astype(np.float32)
        return w, arr(f"{tpath}.bias").astype(np.float32)

    # strip a potential DataParallel "module." prefix
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    params: Dict = {}

    def put(ours, w, b):
        parts = ours.split(".")
        d = params
        for part in parts[:-1]:
            d = d.setdefault(part, {})
        d[parts[-1]] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    for ours, tpath in _TORCH_MAP.items():
        if ours.endswith("_csp") or ours in ("fpn3", "fpn4", "pan4", "pan5"):
            for sub, tsub in _CSP_SUB.items():
                put(f"{ours}.{sub}", *base_conv(f"{tpath}.{tsub}"))
            i = 0
            while f"{tpath}.m.{i}.conv1.conv.weight" in sd:
                put(f"{ours}.m{i}.c1", *base_conv(f"{tpath}.m.{i}.conv1"))
                put(f"{ours}.m{i}.c2", *base_conv(f"{tpath}.m.{i}.conv2"))
                i += 1
        elif ours.split(".")[-1] in _PLAIN_CONVS:
            put(ours, *plain_conv(tpath))
        else:
            put(ours, *base_conv(tpath))
    return params


def convert_torch_checkpoint(pth_path: str, out_path: str) -> None:
    """Convert an official YOLOX torch checkpoint (e.g. yolox_s.pth) into
    this module's npz layout with BN folded into convs. Offline utility;
    uses the CPU torch wheel baked into the image."""
    import torch
    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    save_params(out_path, convert_torch_state_dict(sd))
