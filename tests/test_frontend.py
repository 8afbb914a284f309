"""Extractor + matcher tests against numpy oracles and geometric GT."""

import numpy as np
import pytest

import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig, ORBConfig
from eao_fusion_tpu.frontend import extractor, matcher
from eao_fusion_tpu.ops import fast as fast_ops
from eao_fusion_tpu.ops import hamming, lie, orb as orb_ops


@pytest.fixture(scope="module")
def seq():
    from eao_fusion_tpu.io import synthetic
    return synthetic.generate_sequence(n_frames=3, seed=0, style="arc", cache_dir=synthetic.DEFAULT_CACHE)


@pytest.fixture(scope="module")
def cfg():
    return SystemConfig(orb=ORBConfig(n_features=500, max_keypoints=512))


@pytest.fixture(scope="module")
def feats_pair(seq, cfg):
    f0, f1 = seq.frames[0], seq.frames[2]
    a = extractor.extract_features(jnp.asarray(f0.gray), jnp.asarray(f0.depth),
                                   orb_cfg=cfg.orb, cam_cfg=cfg.camera)
    b = extractor.extract_features(jnp.asarray(f1.gray), jnp.asarray(f1.depth),
                                   orb_cfg=cfg.orb, cam_cfg=cfg.camera)
    return a, b


class TestFAST:
    def test_oracle_corner(self):
        """A bright isolated square's corners must fire; flat regions must not."""
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 1.0
        s = np.asarray(fast_ops.fast_score(jnp.asarray(img), 0.2))
        assert s[20, 20] > 0 or s[20, 21] > 0 or s[21, 20] > 0
        assert np.all(s[5:15, 5:15] == 0)          # flat black
        assert np.all(s[28:32, 28:32] == 0)        # flat white

    def test_oracle_segment_test(self):
        """Compare against a tiny brute-force FAST-9 oracle on random images."""
        r = np.random.default_rng(0)
        img = r.uniform(0, 1, (32, 32)).astype(np.float32)
        th = 0.15
        s = np.asarray(fast_ops.fast_score(jnp.asarray(img), th))
        offs = fast_ops.CIRCLE_OFFSETS

        def oracle(y, x):
            c = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dy, dx in offs])
            for margin in (vals - c, c - vals):
                m2 = np.concatenate([margin, margin[:8]])
                for st in range(16):
                    if np.all(m2[st:st + 9] >= th):
                        return True
            return False

        for y in range(4, 28):
            for x in range(4, 28):
                assert (s[y, x] > 0) == oracle(y, x), (y, x)

    def test_nms_keeps_maxima(self):
        s = np.zeros((32, 32), np.float32)
        s[10, 10] = 5.0
        s[10, 11] = 3.0
        out = np.asarray(fast_ops.nms3x3(jnp.asarray(s)))
        assert out[10, 10] == 5.0 and out[10, 11] == 0.0


class TestHamming:
    def test_matrix_matches_popcount(self):
        r = np.random.default_rng(1)
        bits_a = r.integers(0, 2, (16, 256)).astype(bool)
        bits_b = r.integers(0, 2, (24, 256)).astype(bool)
        pm1_a = np.where(bits_a, 1, -1).astype(np.int8)
        pm1_b = np.where(bits_b, 1, -1).astype(np.int8)
        d = np.asarray(hamming.hamming_matrix(jnp.asarray(pm1_a),
                                              jnp.asarray(pm1_b)))
        oracle = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, oracle)

    def test_packed_popcount(self):
        r = np.random.default_rng(2)
        a = r.integers(0, 2 ** 32, (8, 8), dtype=np.uint32)
        b = r.integers(0, 2 ** 32, (8, 8), dtype=np.uint32)
        d = np.asarray(hamming.hamming_packed(jnp.asarray(a), jnp.asarray(b)))
        oracle = np.array([bin(int(x) ^ int(y)).count("1")
                           for ra, rb in zip(a, b)
                           for x, y in zip(ra, rb)]).reshape(8, 8).sum(-1)
        np.testing.assert_array_equal(d, oracle)


class TestDescriptors:
    def test_pack_consistency(self, feats_pair):
        """packed bits and ±1 form must encode the same descriptor."""
        a, _ = feats_pair
        packed = np.asarray(a.desc_packed)
        pm1 = np.asarray(a.desc_pm1)
        valid = np.asarray(a.valid)
        i = int(np.argmax(valid))
        bits_from_packed = np.unpackbits(
            packed[i].view(np.uint8), bitorder="little")
        np.testing.assert_array_equal(bits_from_packed, (pm1[i] > 0))

    def test_rotation_invariance(self, cfg):
        """Descriptors of a pattern and its 90°-rotated copy should be close
        (steered BRIEF compensates orientation)."""
        r = np.random.default_rng(3)
        base = r.uniform(0, 1, (16, 16)).astype(np.float32)
        img = np.kron(base, np.ones((4, 4), np.float32))  # 64x64 blocky
        img_rot = np.rot90(img).copy()
        a = extractor.extract_features(jnp.asarray(img), None,
                                       orb_cfg=cfg.orb, cam_cfg=cfg.camera,
                                       with_depth=False)
        b = extractor.extract_features(jnp.asarray(img_rot), None,
                                       orb_cfg=cfg.orb, cam_cfg=cfg.camera,
                                       with_depth=False)
        m = matcher.mutual_match(a.desc_pm1, a.valid, a.angle,
                                 b.desc_pm1, b.valid, b.angle,
                                 th=80, use_ratio=False, check_rotation=False)
        n_va = int(np.asarray(a.valid).sum())
        n_m = int((np.asarray(m.target_idx) >= 0).sum())
        # at least a third of keypoints survive a 90° rotation match
        assert n_m > n_va / 3, (n_m, n_va)


class TestEndToEndMatching:
    def test_geometric_consistency(self, seq, cfg, feats_pair):
        a, b = feats_pair
        cam = cfg.camera
        m = matcher.mutual_match(a.desc_pm1, a.valid, a.angle,
                                 b.desc_pm1, b.valid, b.angle,
                                 th=64, use_ratio=True, check_rotation=True)
        idx0 = np.where((np.asarray(m.target_idx) >= 0)
                        & (np.asarray(a.depth) > 0))[0]
        assert len(idx0) > 60
        idx1 = np.asarray(m.target_idx)[idx0]
        uv0 = np.asarray(a.uv)[idx0]
        d0 = np.asarray(a.depth)[idx0]
        k = (cam.fx, cam.fy, cam.cx, cam.cy)
        xc0 = np.asarray(lie.backproject(k, uv0, d0))
        t10 = np.asarray(lie.se3_compose(seq.frames[2].tcw,
                                         lie.se3_inverse(seq.frames[0].tcw)))
        uv1 = np.asarray(lie.project(k, np.asarray(lie.se3_apply(t10, xc0))))
        err = np.linalg.norm(uv1 - np.asarray(b.uv)[idx1], axis=1)
        assert np.median(err) < 2.0
        assert np.mean(err < 5.0) > 0.85

    def test_extractor_budget_and_validity(self, feats_pair):
        a, _ = feats_pair
        assert a.uv.shape[0] == 512
        assert int(a.valid.sum()) > 400
        lv = np.asarray(a.level)[np.asarray(a.valid)]
        assert lv.min() == 0 and lv.max() >= 4  # multi-level spread
