"""Native host runtime tests (skipped when the .so isn't built)."""

import os

import numpy as np
import pytest

from eao_fusion_tpu.io import native_loader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native/libeao_host.so not built")


def _write_pngs(tmp_path, n=4, w=64, h=48, seed=0):
    from PIL import Image
    r = np.random.default_rng(seed)
    rgbs, deps, ts = [], [], []
    imgs, dimgs = [], []
    for i in range(n):
        img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        dep = (r.uniform(0.5, 5.0, (h, w)) * 5000).astype(np.uint16)
        rp = str(tmp_path / f"rgb{i}.png")
        dp = str(tmp_path / f"dep{i}.png")
        Image.fromarray(img).save(rp)
        Image.fromarray(dep).save(dp)
        rgbs.append(rp)
        deps.append(dp)
        ts.append(i / 30.0)
        imgs.append(img)
        dimgs.append(dep)
    return rgbs, deps, ts, imgs, dimgs


def test_png_decode_exact(tmp_path):
    rgbs, deps, _, imgs, dimgs = _write_pngs(tmp_path, n=1)
    arr, c, bd = native_loader.decode_png(open(rgbs[0], "rb").read())
    assert (c, bd) == (3, 8)
    np.testing.assert_array_equal(arr, imgs[0])
    arr2, c2, bd2 = native_loader.decode_png(open(deps[0], "rb").read())
    assert (c2, bd2) == (1, 16)
    np.testing.assert_array_equal(arr2, dimgs[0])


def test_prefetcher_fifo(tmp_path):
    rgbs, deps, ts, imgs, dimgs = _write_pngs(tmp_path)
    pf = native_loader.FramePrefetcher(rgbs, deps, ts, width=64, height=48)
    frames = list(pf)
    pf.close()
    assert [f[0] for f in frames] == [0, 1, 2, 3]
    for (idx, t, gray, depth), img, dep in zip(frames, imgs, dimgs):
        expect = (img @ np.array([0.299, 0.587, 0.114])) / 255.0
        np.testing.assert_allclose(gray, expect, atol=0.01)
        np.testing.assert_allclose(depth, dep / 5000.0, atol=1e-4)


def test_prefetcher_skips_bad_files(tmp_path):
    rgbs, deps, ts, _, _ = _write_pngs(tmp_path, n=3)
    bad = str(tmp_path / "bad.png")
    open(bad, "wb").write(b"not a png")
    rgbs[1] = bad
    pf = native_loader.FramePrefetcher(rgbs, deps, ts, width=64, height=48)
    frames = list(pf)
    pf.close()
    assert [f[0] for f in frames] == [0, 2]
