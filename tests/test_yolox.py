"""YOLOX lane tests: decode/NMS oracle, letterbox geometry, async protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.frontend import yolox


def logit(p):
    return float(np.log(p / (1 - p)))


def make_raw(boxes, n_classes=80):
    """Hand-craft a raw head output that decodes to the given boxes.
    boxes: list of (cls, cx, cy, w, h, score) in 640-space."""
    A = yolox._GRID.shape[0]
    raw = np.full((A, 5 + n_classes), -20.0, np.float32)
    raw[:, 0:4] = 0.0
    for cls, cx, cy, w, h, score in boxes:
        # choose the stride-8 cell containing the center
        gx, gy = int(cx // 8), int(cy // 8)
        a = gy * 80 + gx
        raw[a, 0] = cx / 8 - gx
        raw[a, 1] = cy / 8 - gy
        raw[a, 2] = np.log(w / 8)
        raw[a, 3] = np.log(h / 8)
        raw[a, 4] = logit(np.sqrt(score))
        raw[a, 5 + cls] = logit(np.sqrt(score))
    return jnp.asarray(raw)


class TestDecode:
    def test_single_box_roundtrip(self):
        raw = make_raw([(3, 320.0, 240.0, 64.0, 48.0, 0.9)])
        det = np.asarray(yolox.decode_and_nms(raw, jnp.float32(1.0)))
        det = det[det[:, 5] > 0]
        assert len(det) == 1
        cls, x, y, w, h, s = det[0]
        assert cls == 3
        np.testing.assert_allclose([x + w / 2, y + h / 2], [320, 240],
                                   atol=1.0)
        np.testing.assert_allclose([w, h], [64, 48], rtol=0.05)
        assert abs(s - 0.9) < 0.02

    def test_nms_suppresses_duplicates(self):
        raw = make_raw([(5, 300.0, 200.0, 80.0, 80.0, 0.9),
                        (5, 308.0, 200.0, 80.0, 80.0, 0.7),   # IoU >> 0.65
                        (5, 500.0, 400.0, 60.0, 60.0, 0.8)])
        det = np.asarray(yolox.decode_and_nms(raw, jnp.float32(1.0)))
        det = det[det[:, 5] > 0]
        assert len(det) == 2
        # NMS is CLASS-AGNOSTIC per the reference's NmsSortedBboxes
        # (src/YOLOX.cc:131-163): an overlapping lower-score box is
        # suppressed even when its class differs, and the survivor is
        # the higher-score box.
        raw2 = make_raw([(5, 300.0, 200.0, 80.0, 80.0, 0.9),
                         (6, 308.0, 200.0, 80.0, 80.0, 0.7)])
        det2 = np.asarray(yolox.decode_and_nms(raw2, jnp.float32(1.0)))
        det2 = det2[det2[:, 5] > 0]
        assert len(det2) == 1
        assert det2[0, 0] == 5 and abs(det2[0, 5] - 0.9) < 0.02

    def test_scale_rescales_to_original_image(self):
        raw = make_raw([(0, 320.0, 240.0, 64.0, 48.0, 0.9)])
        det = np.asarray(yolox.decode_and_nms(raw, jnp.float32(0.5)))
        det = det[det[:, 5] > 0]
        np.testing.assert_allclose(det[0, 1:5],
                                   [(320 - 32) / 0.5, (240 - 24) / 0.5,
                                    64 / 0.5, 48 / 0.5], rtol=0.05)

    def test_conf_threshold(self):
        raw = make_raw([(0, 320.0, 240.0, 64.0, 48.0, 0.1)])  # below 0.3
        det = np.asarray(yolox.decode_and_nms(raw, jnp.float32(1.0)))
        assert len(det[det[:, 5] > 0]) == 0


class TestLetterbox:
    def test_aspect_preserved(self):
        img = jnp.ones((480, 640, 3), jnp.float32)
        x, scale = yolox.letterbox(img)
        assert x.shape == (1, 640, 640, 3)
        assert abs(float(scale) - 1.0) < 1e-6
        # bottom padding (480*1.0 rows of content, rest gray)
        assert abs(float(x[0, 479, 0, 0]) - 1.0) < 1e-5
        np.testing.assert_allclose(float(x[0, 500, 0, 0]), 114 / 255, atol=1e-5)


class TestDetectorProtocol:
    def test_async_submit_result(self):
        params = yolox.init_params(jax.random.PRNGKey(0))
        det = yolox.Detector(params)
        assert det.result() is None
        img = np.random.default_rng(0).uniform(0, 1, (480, 640, 3)) \
            .astype(np.float32)
        det.submit(img)
        r = det.result()
        assert r is not None and r.shape[1] == 6
        assert det.result() is None   # consumed (latest-wins)


def make_torch_state_dict(params, rng):
    """Build an official-layout YOLOX state dict whose tensor SHAPES mirror
    `params` (an init_params tree) with random values — the converter
    round-trip can then be validated without downloading weights."""
    sd = {}

    def add_base_conv(tpath, w_hwio):
        k, _, cin, cout = w_hwio.shape
        sd[f"{tpath}.conv.weight"] = rng.normal(
            0, 0.1, (cout, cin, k, k)).astype(np.float32)
        sd[f"{tpath}.bn.weight"] = rng.uniform(
            0.5, 1.5, cout).astype(np.float32)
        sd[f"{tpath}.bn.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{tpath}.bn.running_mean"] = rng.normal(
            0, 0.1, cout).astype(np.float32)
        sd[f"{tpath}.bn.running_var"] = rng.uniform(
            0.5, 2.0, cout).astype(np.float32)

    def add_plain_conv(tpath, w_hwio):
        k, _, cin, cout = w_hwio.shape
        sd[f"{tpath}.weight"] = rng.normal(
            0, 0.1, (cout, cin, k, k)).astype(np.float32)
        sd[f"{tpath}.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)

    for ours, tpath in yolox._TORCH_MAP.items():
        node = params
        for part in ours.split("."):
            node = node[part]
        if ours.endswith("_csp") or ours in ("fpn3", "fpn4", "pan4", "pan5"):
            for sub, tsub in yolox._CSP_SUB.items():
                add_base_conv(f"{tpath}.{tsub}", np.asarray(node[sub]["w"]))
            i = 0
            while f"m{i}" in node:
                add_base_conv(f"{tpath}.m.{i}.conv1",
                              np.asarray(node[f"m{i}"]["c1"]["w"]))
                add_base_conv(f"{tpath}.m.{i}.conv2",
                              np.asarray(node[f"m{i}"]["c2"]["w"]))
                i += 1
        elif ours.split(".")[-1] in yolox._PLAIN_CONVS:
            add_plain_conv(tpath, np.asarray(node["w"]))
        else:
            add_base_conv(tpath, np.asarray(node["w"]))
    return sd


class TestTorchConverter:
    def test_tree_structure_and_shapes_match(self):
        tmpl = yolox.init_params(jax.random.PRNGKey(0), width_mult=0.25)
        sd = make_torch_state_dict(tmpl, np.random.default_rng(0))
        conv = yolox.convert_torch_state_dict(sd)

        def flat(d, prefix=""):
            out = {}
            for k, v in d.items():
                if isinstance(v, dict):
                    out.update(flat(v, f"{prefix}{k}."))
                else:
                    out[f"{prefix}{k}"] = np.asarray(v).shape
            return out
        a, b = flat(tmpl), flat(conv)
        assert a == b, set(a) ^ set(b)

    def test_bn_folding_matches_torch(self):
        """Converted conv+bias must equal torch's conv -> BN -> SiLU."""
        import torch
        import torch.nn.functional as F

        tmpl = yolox.init_params(jax.random.PRNGKey(1), width_mult=0.25)
        rng = np.random.default_rng(1)
        sd = make_torch_state_dict(tmpl, rng)
        conv = yolox.convert_torch_state_dict(sd)

        tp = "backbone.backbone.dark2.0"   # our dark2_down, stride 2
        x = rng.normal(0, 1, (1, 16, 16, 16)).astype(np.float32)
        y_ours = np.asarray(yolox._conv(conv["dark2_down"],
                                        jnp.asarray(x), 2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = F.conv2d(xt, torch.from_numpy(sd[f"{tp}.conv.weight"]),
                     stride=2, padding=1)
        y = F.batch_norm(y,
                         torch.from_numpy(sd[f"{tp}.bn.running_mean"]),
                         torch.from_numpy(sd[f"{tp}.bn.running_var"]),
                         torch.from_numpy(sd[f"{tp}.bn.weight"]),
                         torch.from_numpy(sd[f"{tp}.bn.bias"]),
                         training=False, eps=yolox._BN_EPS)
        y_torch = (F.silu(y)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(y_ours, y_torch, atol=2e-5, rtol=1e-4)

    def test_identical_boxes_through_both_weight_paths(self, tmp_path):
        """save_params/load_params round trip of a converted checkpoint
        produces bit-identical detections."""
        tmpl = yolox.init_params(jax.random.PRNGKey(2), width_mult=0.25)
        sd = make_torch_state_dict(tmpl, np.random.default_rng(2))
        conv = yolox.convert_torch_state_dict(sd)
        path = str(tmp_path / "w.npz")
        yolox.save_params(path, conv)
        loaded = yolox.load_params(path)

        img = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (1, 640, 640, 3)).astype(np.float32))
        raw_a = yolox.yolox_forward(conv, img)
        raw_b = yolox.yolox_forward(loaded, img)
        det_a = np.asarray(yolox.decode_and_nms(raw_a, jnp.float32(1.0)))
        det_b = np.asarray(yolox.decode_and_nms(raw_b, jnp.float32(1.0)))
        np.testing.assert_array_equal(det_a, det_b)
