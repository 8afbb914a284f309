"""Two-view monocular initialization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig, ORBConfig
from eao_fusion_tpu.frontend import extractor, matcher
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.ops import lie, twoview

CFG = SystemConfig(orb=ORBConfig(n_features=500, max_keypoints=512))
CAM = (CFG.camera.fx, CFG.camera.fy, CFG.camera.cx, CFG.camera.cy)


def test_two_view_init_recovers_motion():
    seq = synthetic.generate_sequence(n_frames=8, seed=0, style="arc",
                                      cache_dir=synthetic.DEFAULT_CACHE)
    f0, f1 = seq.frames[0], seq.frames[5]
    a = extractor.extract_features(jnp.asarray(f0.gray), None,
                                   orb_cfg=CFG.orb, cam_cfg=CFG.camera,
                                   with_depth=False)
    b = extractor.extract_features(jnp.asarray(f1.gray), None,
                                   orb_cfg=CFG.orb, cam_cfg=CFG.camera,
                                   with_depth=False)
    mm = matcher.mutual_match(a.desc_pm1, a.valid, a.angle,
                              b.desc_pm1, b.valid, b.angle,
                              th=64, use_ratio=True, check_rotation=True)
    tgt = np.asarray(mm.target_idx)
    ia = np.where(tgt >= 0)[0]
    ib = tgt[ia]
    n = 512
    uv1 = np.zeros((n, 2), np.float32)
    uv2 = np.zeros((n, 2), np.float32)
    valid = np.zeros(n, bool)
    uv1[:len(ia)] = np.asarray(a.uv)[ia]
    uv2[:len(ia)] = np.asarray(b.uv)[ib]
    valid[:len(ia)] = True
    assert len(ia) > 100

    res = twoview.initialize_two_view(jnp.asarray(uv1), jnp.asarray(uv2),
                                      jnp.asarray(valid),
                                      jax.random.PRNGKey(0), cam=CAM)
    assert bool(res.success), int(res.ok.sum())

    # GT relative pose (frame-1 frame): T_21 = Tcw2 ∘ Twc1
    t21 = np.asarray(lie.se3_compose(jnp.asarray(f1.tcw),
                                     lie.se3_inverse(jnp.asarray(f0.tcw))))
    est = np.asarray(res.tcw2)
    # rotation error
    dq = np.asarray(lie.quat_mul(lie.quat_conj(jnp.asarray(t21[:4])),
                                 jnp.asarray(est[:4])))
    rot_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dq))))
    assert rot_err < 0.02, rot_err
    # translation direction error (scale is unobservable)
    tg = t21[4:7] / np.linalg.norm(t21[4:7])
    te = est[4:7] / max(np.linalg.norm(est[4:7]), 1e-9)
    assert np.dot(tg, te) > 0.995, (tg, te)

    # triangulations should reproject well and have sane cheirality
    assert int(res.ok.sum()) > 80
