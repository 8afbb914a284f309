"""Ensemble object data association: IoU, Wilcoxon rank-sum, projected-box
IoU, and t-test — batched over (frame objects x map objects).

Re-design of `Object_2D::ObjectDataAssociation` + `NoParaDataAssociation`
(`src/Object.cc:161-724, 728-962`): the reference's sequential cascade
becomes dense [F, O] gate matrices with the same priority order
(IoU > nonparametric > projected box > t-test), the same thresholds, and
the same accept check (`DataAssociateUpdate` step 1: projected-rect
consistency, :1364-1437). The ablation `mode` string ("Full"/"NA"/"IoU"/
"NP"/...) gates methods exactly like the reference's flag.

Method codes: 0 none, 1 IoU, 2 NP, 3 t-test, 4 projected box.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.objects import ttable
from eao_fusion_tpu.objects.object_map import (FrameObjects, ObjectTable,
                                               project_members, rect_iou,
                                               rect_overlap_former)


class AssocResult(NamedTuple):
    target: jax.Array   # [F] int32 map-object row, -1 = none
    method: jax.Array   # [F] int32 (0..4)
    potential: jax.Array  # [F, O] bool — passed some gate but not chosen


@functools.partial(jax.jit, static_argnames=("cfg",))
def ensemble_associate(tab: ObjectTable, fo: FrameObjects, pt_xyz: jax.Array,
                       tcw: jax.Array, frame_id: jax.Array,
                       *, cfg: SystemConfig) -> AssocResult:
    oc = cfg.objects
    mode = oc.mode
    F = fo.box.shape[0]
    O = tab.cls.shape[0]
    W, H = cfg.camera.width, cfg.camera.height
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)

    cls_eq = fo.cls[:, None] == tab.cls[None, :]
    alive = tab.valid[None, :] & fo.valid[:, None] & cls_eq

    # ---------------- STEP 1: IoU with motion-predicted box --------------
    seen_last = tab.last_frame == frame_id - 1
    seen_ll = tab.lastlast_frame == frame_id - 2
    pred = 2.0 * tab.last_rect - tab.lastlast_rect
    pred = jnp.stack([jnp.clip(pred[:, 0], 0, W), jnp.clip(pred[:, 1], 0, H),
                      jnp.clip(pred[:, 2], 0, W), jnp.clip(pred[:, 3], 0, H)],
                     axis=-1)
    rect_pred = jnp.where(seen_ll[:, None], pred, tab.last_rect)
    iou = rect_iou(fo.box[:, None, :], rect_pred[None, :, :])   # [F, O]
    iou_th = jnp.where(seen_ll, 0.6, oc.iou_threshold)
    iou_ok = alive & seen_last[None, :] & (iou > iou_th[None, :])

    # ---------------- shared projections ---------------------------------
    uv_o, ok_o, rect_proj = project_members(tab, pt_xyz, tcw, cam, W, H)
    n_o = tab.pt_ok.sum(axis=1)                                  # [O]
    df = tab.n_frames                                            # [O]

    # accept check used by NP and t-test (projected-rect consistency):
    # rect2 = bbox of frame-object pixels U projected members; accept if
    # IoU(rect_proj, rect2) >= 0.5 or inter/area(rect2 vs box) >= 0.8
    big = 1e9
    u2min = jnp.minimum(fo.feat_rect[:, None, 0], rect_proj[None, :, 0])
    v2min = jnp.minimum(fo.feat_rect[:, None, 1], rect_proj[None, :, 1])
    u2max = jnp.maximum(fo.feat_rect[:, None, 2], rect_proj[None, :, 2])
    v2max = jnp.maximum(fo.feat_rect[:, None, 3], rect_proj[None, :, 3])
    rect2 = jnp.stack([u2min, v2min, u2max, v2max], axis=-1)     # [F, O, 4]
    acc1 = rect_iou(rect_proj[None, :, :], rect2)
    acc2 = rect_overlap_former(rect2, fo.box[:, None, :])
    accept = (acc1 >= 0.5) | (acc2 >= 0.8)

    # ---------------- STEP 2: Wilcoxon rank-sum (NP) ---------------------
    # frame sample [F, S, 3] vs member points [O, M, 3], per dimension
    ow = pt_xyz[jnp.clip(tab.pt_idx, 0, None)]                   # [O, M, 3]
    fw = fo.pt_w                                                  # [F, S, 3]
    fvalid = fo.pt_valid                                          # [F, S]
    ovalid = tab.pt_ok                                            # [O, M]
    pair_ok = (fvalid[:, None, :, None] & ovalid[None, :, None, :])
    gt = (fw[:, None, :, None, :] > ow[None, :, None, :, :])      # [F,O,S,M,3]
    lt = (fw[:, None, :, None, :] < ow[None, :, None, :, :])
    w12 = jnp.sum(gt & pair_ok[..., None], axis=(2, 3)).astype(jnp.float32)
    w21 = jnp.sum(lt & pair_ok[..., None], axis=(2, 3)).astype(jnp.float32)
    mf = fo.pt_valid.sum(axis=1).astype(jnp.float32)[:, None]     # [F, 1]
    nf = n_o.astype(jnp.float32)[None, :]                         # [1, O]
    w00 = mf[..., None] * nf[..., None] - w12 - w21
    Wst = jnp.minimum(w12 + (mf * (mf + 1) / 2)[..., None],
                      w21 + (nf * (nf + 1) / 2)[..., None]) + w00 / 2
    mn1 = (mf * nf * (mf + nf + 1) / 12)[..., None]
    mid = (0.5 * mf * (mf + nf + 1))[..., None]
    r_lo = mid - 1.282 * jnp.sqrt(jnp.maximum(mn1, 1e-9))
    r_hi = mid + 1.282 * jnp.sqrt(jnp.maximum(mn1, 1e-9))
    np_dim_ok = (Wst > r_lo) & (Wst < r_hi)                       # [F, O, 3]
    np_ok = (alive & np_dim_ok.all(axis=-1)
             & (mf >= 20) & (nf >= 20) & accept)

    # ---------------- STEP 3: projected-box IoU --------------------------
    fiou = jnp.maximum(rect_iou(fo.box[:, None, :], rect_proj[None, :, :]),
                       rect_iou(fo.feat_rect[:, None, :],
                                rect_proj[None, :, :]))
    # reference gate: skip when frame obj has >=10 pts AND df > 8
    proj_applicable = ~((fo.n_pts[:, None] >= 10) & (df[None, :] > 8))
    proj_ok = alive & proj_applicable & \
        (fiou >= oc.projected_iou_threshold)

    # ---------------- STEP 4: t-test --------------------------------------
    dfl = jnp.maximum(df, 1)
    cen_mean = tab.cen_sum / jnp.maximum(df, 1).astype(jnp.float32)[:, None]
    cen_var = (tab.cen_sq / jnp.maximum(df, 1).astype(jnp.float32)[:, None]
               - cen_mean * cen_mean)
    cen_std = jnp.sqrt(jnp.maximum(cen_var, 1e-12))               # [O, 3]
    dis = jnp.abs(tab.center[None, :, :] - fo.center[:, None, :])  # [F, O, 3]
    t = dis / (cen_std[None] / jnp.sqrt(dfl.astype(jnp.float32))[None, :, None]
               + 1e-12)
    crit05 = ttable.crit(df - 1, ttable.COL_ALPHA_05)[None, :, None]
    crit001 = ttable.crit(df - 1, ttable.COL_ALPHA_001)[None, :, None]
    t_mean = t.mean(axis=-1)
    strict = (t < crit05).all(axis=-1)
    relaxed = (fiou > 0.25) & ((t < crit001).all(axis=-1) | (t_mean < 10.0))
    forced = (t_mean < 4.0) & (fiou > 0.25)
    t_ok = alive & (df[None, :] > 8) & (strict | relaxed | forced) & accept

    # ---------------- priority selection ----------------------------------
    def pick(ok, score):
        any_ok = ok.any(axis=1)
        best = jnp.argmax(jnp.where(ok, score, -big), axis=1).astype(jnp.int32)
        return any_ok, jnp.where(any_ok, best, -1)

    obj_recency = jnp.arange(O, dtype=jnp.float32)[None, :]  # newest first tie
    has_iou, tgt_iou = pick(iou_ok, iou)
    has_np, tgt_np = pick(np_ok, obj_recency)
    has_proj, tgt_proj = pick(proj_ok, fiou)
    has_t, tgt_t = pick(t_ok, obj_recency)

    if mode == "NA":
        has_iou = has_np = has_proj = has_t = jnp.zeros((F,), bool)
    elif mode == "IoU":
        has_np = has_proj = has_t = jnp.zeros((F,), bool)
    elif mode == "NP":
        has_iou = has_proj = has_t = jnp.zeros((F,), bool)

    target = jnp.where(has_iou, tgt_iou,
                       jnp.where(has_np, tgt_np,
                                 jnp.where(has_proj, tgt_proj,
                                           jnp.where(has_t, tgt_t, -1))))
    method = jnp.where(has_iou, 1,
                       jnp.where(has_np, 2,
                                 jnp.where(has_proj, 4,
                                           jnp.where(has_t, 3, 0))))
    method = jnp.where(target >= 0, method, 0)

    # potentials: candidates that passed any gate but were not chosen
    passed = iou_ok | np_ok | proj_ok | t_ok
    chosen = jax.nn.one_hot(jnp.clip(target, 0, O - 1), O, dtype=bool) \
        & (target >= 0)[:, None]
    potential = passed & (~chosen) & (target >= 0)[:, None]
    return AssocResult(target=target, method=method, potential=potential)
