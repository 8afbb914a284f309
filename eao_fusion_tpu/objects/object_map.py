"""Object landmarks: fixed-capacity table, per-frame 2D objects, and the
association-update step.

Re-design of `Object_2D` / `Object_Map` (`src/Object.cc`, SURVEY.md §2.1):
objects are rows of a dense table; member map points are id slots into the
global point table (so BA moves object points automatically — fixing the
reference's stale-position hazard); all per-object statistics are masked
reductions.

Semantics kept from the reference:
  * per-frame object = detector box + the tracked map points whose keypoint
    falls inside it (`Tracking::AssociateObjAndPoints`, `src/Tracking.cc:3031`),
    with depth-boxplot outlier rejection (IQR rule, far side only,
    `Object_2D::RemoveOutliersByBoxPlot` :104).
  * member addition gated by distance to center <= th * rMax (th = 1.0, or
    0.9 after 5 observations) (`DataAssociateUpdate` :1466-1476).
  * historical members projecting inside the image but outside the current
    box are removed unless seen >8 times (:1540-1597).
  * per-object cuboid = axis-aligned point bounds; yaw stays 0 in this fork
    (EAO's line-based yaw sampling was removed upstream, SURVEY §2.2), so
    the axis-aligned cuboid is the faithful live behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.ops import lie

MEMBERS = 256  # member point slots per object


class ObjectTable(NamedTuple):
    cls: jax.Array          # [O] int32 detector class
    valid: jax.Array        # [O] bool
    pt_idx: jax.Array       # [O, M] int32 member map-point ids
    pt_ok: jax.Array        # [O, M] bool
    pt_addcnt: jax.Array    # [O, M] int32 times re-associated
    n_frames: jax.Array     # [O] int32 frame observations (df)
    last_frame: jax.Array   # [O] int32
    lastlast_frame: jax.Array  # [O] int32
    last_rect: jax.Array    # [O, 4] (x0,y0,x1,y1)
    lastlast_rect: jax.Array  # [O, 4]
    center: jax.Array       # [O, 3] mean of member points
    std: jax.Array          # [O, 3]
    cen_sum: jax.Array      # [O, 3] running sum of frame-object centers
    cen_sq: jax.Array       # [O, 3] running sum of squares
    cub_min: jax.Array      # [O, 3]
    cub_max: jax.Array      # [O, 3]
    rmax: jax.Array         # [O] max center-to-corner radius
    reobj: jax.Array        # [O, O] int32 potential-association counters
    sametime: jax.Array     # [O, O] int32 co-appearance counters
    next_obj: jax.Array     # [] int32


class FrameObjects(NamedTuple):
    """Per-frame 2D objects after filtering + point stats (Object_2D)."""
    cls: jax.Array          # [F] int32
    score: jax.Array        # [F]
    box: jax.Array          # [F, 4] (x0,y0,x1,y1)
    valid: jax.Array        # [F] bool
    kp_mask: jax.Array      # [F, N] member keypoints
    pt_ids: jax.Array       # [F, S] compacted member point ids (-1 pad)
    pt_w: jax.Array         # [F, S, 3] member world positions
    pt_valid: jax.Array     # [F, S]
    n_pts: jax.Array        # [F] int32
    center: jax.Array       # [F, 3]
    std: jax.Array          # [F, 3]
    feat_rect: jax.Array    # [F, 4] bbox of member keypoints
    on_edge: jax.Array      # [F] bool


def empty_table(cfg: SystemConfig) -> ObjectTable:
    O = cfg.objects.max_map_objects
    f32 = jnp.float32
    return ObjectTable(
        cls=jnp.full((O,), -1, jnp.int32),
        valid=jnp.zeros((O,), bool),
        pt_idx=jnp.full((O, MEMBERS), -1, jnp.int32),
        pt_ok=jnp.zeros((O, MEMBERS), bool),
        pt_addcnt=jnp.zeros((O, MEMBERS), jnp.int32),
        n_frames=jnp.zeros((O,), jnp.int32),
        last_frame=jnp.full((O,), -9, jnp.int32),
        lastlast_frame=jnp.full((O,), -9, jnp.int32),
        last_rect=jnp.zeros((O, 4), f32),
        lastlast_rect=jnp.zeros((O, 4), f32),
        center=jnp.zeros((O, 3), f32),
        std=jnp.zeros((O, 3), f32),
        cen_sum=jnp.zeros((O, 3), f32),
        cen_sq=jnp.zeros((O, 3), f32),
        cub_min=jnp.zeros((O, 3), f32),
        cub_max=jnp.zeros((O, 3), f32),
        rmax=jnp.zeros((O,), f32),
        reobj=jnp.zeros((O, O), jnp.int32),
        sametime=jnp.zeros((O, O), jnp.int32),
        next_obj=jnp.int32(0))


SAMPLE = 64  # compacted member sample per frame object


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_frame_objects(boxes: jax.Array, feats, kp_pt: jax.Array,
                        pt_xyz: jax.Array, pt_valid: jax.Array,
                        tcw: jax.Array, *, cfg: SystemConfig) -> FrameObjects:
    """boxes [F, 6] rows (class, x, y, w, h, score) — detector output after
    the score/class filter (`src/Tracking.cc:431-470`)."""
    oc = cfg.objects
    F = oc.max_objects_2d
    W, H = cfg.camera.width, cfg.camera.height
    n_in = boxes.shape[0]
    # pad/trim to F rows
    pad = jnp.zeros((F, 6), jnp.float32)
    boxes = jax.lax.dynamic_update_slice(pad, boxes[:F].astype(jnp.float32),
                                         (0, 0))
    present = jnp.arange(F) < n_in
    score_ok = boxes[:, 5] >= oc.min_box_score
    x0, y0 = boxes[:, 1], boxes[:, 2]
    x1, y1 = x0 + boxes[:, 3], y0 + boxes[:, 4]
    box = jnp.stack([x0, y0, x1, y1], axis=-1)
    on_edge = ((x0 < oc.image_border) | (y0 < oc.image_border)
               | (x1 > W - oc.image_border) | (y1 > H - oc.image_border))
    valid = present & score_ok & (boxes[:, 3] > 4) & (boxes[:, 4] > 4)

    # member keypoints: inside box, with a tracked, valid map point
    u, v = feats.uv[:, 0], feats.uv[:, 1]
    inb = ((u[None] >= x0[:, None]) & (u[None] <= x1[:, None])
           & (v[None] >= y0[:, None]) & (v[None] <= y1[:, None]))
    has_pt = (kp_pt >= 0) & feats.valid & pt_valid[jnp.clip(kp_pt, 0, None)]
    member = inb & has_pt[None] & valid[:, None]            # [F, N]

    pw_all = pt_xyz[jnp.clip(kp_pt, 0, None)]               # [N, 3]
    pc_all = lie.se3_apply(tcw, pw_all)                     # [N, 3]

    # ---- depth boxplot (far-side IQR cut, reference semantics) ----------
    z = jnp.where(member, pc_all[None, :, 2], jnp.inf)      # [F, N]
    zs = jnp.sort(z, axis=1)
    cnt = jnp.sum(member, axis=1)
    q1 = jnp.take_along_axis(zs, (cnt // 4)[:, None], 1)[:, 0]
    q3 = jnp.take_along_axis(zs, jnp.minimum(3 * cnt // 4,
                                             z.shape[1] - 1)[:, None], 1)[:, 0]
    iqr = q3 - q1
    zmax = jnp.where(cnt >= 4, q3 + 1.5 * iqr, jnp.inf)
    member = member & (pc_all[None, :, 2] <= zmax[:, None])

    # ---- central-anchor depth gate (improvement over the reference) -----
    # the reference's far-tail cut leaves background surfaces inside the
    # box (wall behind / floor below), the dominant object-center bias.
    # Anchor on the median depth of the box's central region — where the
    # detected object dominates — and keep only points near that shell.
    cx0 = 0.75 * x0 + 0.25 * x1
    cx1 = 0.25 * x0 + 0.75 * x1
    cy0 = 0.75 * y0 + 0.25 * y1
    cy1 = 0.25 * y0 + 0.75 * y1
    central = (member & (u[None] >= cx0[:, None]) & (u[None] <= cx1[:, None])
               & (v[None] >= cy0[:, None]) & (v[None] <= cy1[:, None]))
    zc = jnp.where(central, pc_all[None, :, 2], jnp.inf)
    zcs = jnp.sort(zc, axis=1)
    ccnt = jnp.sum(central, axis=1)
    anchor = jnp.take_along_axis(zcs, (ccnt // 2)[:, None], 1)[:, 0]
    have_anchor = ccnt >= 3
    tol = jnp.maximum(0.45, 0.15 * anchor)
    near = jnp.abs(pc_all[None, :, 2] - anchor[:, None]) <= tol[:, None]
    member = member & jnp.where(have_anchor[:, None], near, True)

    n_pts = jnp.sum(member, axis=1)
    valid = valid & (n_pts >= 2)

    # ---- compact member sample (static S slots) ------------------------
    sel_val, sel_idx = jax.lax.top_k(member.astype(jnp.int32), SAMPLE)
    pt_ids = jnp.where(sel_val > 0,
                       kp_pt[sel_idx.reshape(-1)].reshape(F, SAMPLE), -1)
    pt_w = pw_all[sel_idx.reshape(-1)].reshape(F, SAMPLE, 3)
    pt_ok = sel_val > 0

    # ---- stats ---------------------------------------------------------
    wm = member.astype(jnp.float32)
    denom = jnp.maximum(n_pts.astype(jnp.float32), 1.0)[:, None]
    center = (wm @ pw_all) / denom
    sq = (wm @ (pw_all * pw_all)) / denom
    std = jnp.sqrt(jnp.maximum(sq - center * center, 0.0))

    big = 1e9
    fu = jnp.where(member, u[None], big)
    fv = jnp.where(member, v[None], big)
    fr_min = jnp.stack([fu.min(1), fv.min(1)], -1)
    fu = jnp.where(member, u[None], -big)
    fv = jnp.where(member, v[None], -big)
    fr_max = jnp.stack([fu.max(1), fv.max(1)], -1)
    feat_rect = jnp.concatenate([fr_min, fr_max], axis=-1)

    return FrameObjects(cls=boxes[:, 0].astype(jnp.int32), score=boxes[:, 5],
                        box=box, valid=valid, kp_mask=member, pt_ids=pt_ids,
                        pt_w=pt_w, pt_valid=pt_ok, n_pts=n_pts,
                        center=center, std=std, feat_rect=feat_rect,
                        on_edge=on_edge)


@functools.partial(jax.jit, static_argnames=("cfg",))
def merge_frame_objects(fo: FrameObjects, last: FrameObjects,
                        pt_valid: jax.Array, *, cfg: SystemConfig
                        ) -> FrameObjects:
    """Frame-to-frame object enrichment (`Object_2D::MergeTwoFrameObj`,
    `src/Object.cc:965-996` driven from `src/Tracking.cc:1996-2021`): a
    current-frame object absorbs the member points of the same-class
    last-frame object it overlaps (IoU > 0.5), deduplicated — boosting the
    sample size feeding the ensemble association tests."""
    F, S = fo.pt_ids.shape
    iou = rect_iou(fo.box[:, None, :], last.box[None, :, :])
    ok = (fo.valid[:, None] & last.valid[None, :]
          & (fo.cls[:, None] == last.cls[None, :]) & (iou > 0.5))
    best = jnp.argmax(jnp.where(ok, iou, -1.0), axis=1)
    has = ok.any(axis=1)

    l_ids = last.pt_ids[best]                                # [F, S]
    l_ok = (last.pt_valid[best] & has[:, None]
            & pt_valid[jnp.clip(l_ids, 0, None)] & (l_ids >= 0))
    l_w = last.pt_w[best]
    exists = ((l_ids[:, :, None] == fo.pt_ids[:, None, :])
              & fo.pt_valid[:, None, :]).any(-1)
    new = l_ok & (~exists)
    # place into free slots of the current object's sample
    _, free_idx = jax.lax.top_k((~fo.pt_valid).astype(jnp.int32), S)
    n_free = (~fo.pt_valid).sum(axis=1)
    rank = jnp.cumsum(new, axis=1) - 1
    place = new & (rank < n_free[:, None])
    slot = jnp.take_along_axis(free_idx, jnp.clip(rank, 0, S - 1), axis=1)
    rows = jnp.where(place, jnp.arange(F)[:, None], F).reshape(-1)
    cols = slot.reshape(-1)
    pt_ids = fo.pt_ids.at[rows, cols].set(l_ids.reshape(-1), mode="drop")
    pt_w = fo.pt_w.at[rows, cols].set(l_w.reshape(-1, 3), mode="drop")
    pt_ok = fo.pt_valid.at[rows, cols].set(True, mode="drop")

    # refresh count/center/std from the enriched sample
    wm = pt_ok.astype(jnp.float32)[..., None]
    n = jnp.maximum(pt_ok.sum(axis=1).astype(jnp.float32), 1.0)[:, None]
    center = (pt_w * wm).sum(axis=1) / n
    sq = (pt_w * pt_w * wm).sum(axis=1) / n
    std = jnp.sqrt(jnp.maximum(sq - center * center, 0.0))
    n_pts = fo.n_pts + jnp.sum(place, axis=1)
    return fo._replace(pt_ids=pt_ids, pt_w=pt_w, pt_valid=pt_ok,
                       n_pts=n_pts, center=center, std=std)


# ----------------------------------------------------------------- helpers

def rect_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of rects [..., 4] (x0,y0,x1,y1), broadcasting."""
    x0 = jnp.maximum(a[..., 0], b[..., 0])
    y0 = jnp.maximum(a[..., 1], b[..., 1])
    x1 = jnp.minimum(a[..., 2], b[..., 2])
    y1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * \
        jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def rect_overlap_former(a: jax.Array, b: jax.Array) -> jax.Array:
    """intersection / area(a) (`Converter::bboxOverlapratioFormer`)."""
    x0 = jnp.maximum(a[..., 0], b[..., 0])
    y0 = jnp.maximum(a[..., 1], b[..., 1])
    x1 = jnp.minimum(a[..., 2], b[..., 2])
    y1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * \
        jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    return inter / jnp.maximum(area_a, 1e-6)


def project_members(tab: ObjectTable, pt_xyz: jax.Array, tcw: jax.Array,
                    cam: Tuple[float, float, float, float],
                    width: int, height: int
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project member points of every object. Returns (uv [O,M,2],
    ok [O,M], rect [O,4] clipped) — `Object_Map::ComputeProjectRectFrame`
    (`src/Object.cc:1606-1652`)."""
    pw = pt_xyz[jnp.clip(tab.pt_idx, 0, None)]              # [O, M, 3]
    pc = lie.se3_apply(tcw[None, None], pw)
    ok = tab.pt_ok & (pc[..., 2] > 0.05)
    uv = lie.project(cam, pc)
    big = 1e9
    umin = jnp.where(ok, uv[..., 0], big).min(axis=1)
    vmin = jnp.where(ok, uv[..., 1], big).min(axis=1)
    umax = jnp.where(ok, uv[..., 0], -big).max(axis=1)
    vmax = jnp.where(ok, uv[..., 1], -big).max(axis=1)
    rect = jnp.stack([jnp.clip(umin, 0, width), jnp.clip(vmin, 0, height),
                      jnp.clip(umax, 0, width), jnp.clip(vmax, 0, height)],
                     axis=-1)
    has = ok.any(axis=1)
    rect = jnp.where(has[:, None], rect, 0.0)
    return uv, ok, rect


def member_stats(tab: ObjectTable, pt_xyz: jax.Array) -> ObjectTable:
    """Recompute center/std/cuboid/rmax from member points
    (`Object_Map::ComputeMeanAndStandard`, `src/Object.cc:999-1235`)."""
    pw = pt_xyz[jnp.clip(tab.pt_idx, 0, None)]
    okf = tab.pt_ok.astype(jnp.float32)[..., None]
    n = jnp.maximum(tab.pt_ok.sum(axis=1).astype(jnp.float32), 1.0)[:, None]
    center = (pw * okf).sum(axis=1) / n
    sq = (pw * pw * okf).sum(axis=1) / n
    std = jnp.sqrt(jnp.maximum(sq - center * center, 0.0))
    big = 1e9
    cmin = jnp.where(tab.pt_ok[..., None], pw, big).min(axis=1)
    cmax = jnp.where(tab.pt_ok[..., None], pw, -big).max(axis=1)
    has = tab.pt_ok.any(axis=1)
    cmin = jnp.where(has[:, None], cmin, 0.0)
    cmax = jnp.where(has[:, None], cmax, 0.0)
    # max distance from the point-mean to a cuboid corner
    d1 = jnp.abs(cmin - center)
    d2 = jnp.abs(cmax - center)
    rmax = jnp.linalg.norm(jnp.maximum(d1, d2), axis=-1)
    return tab._replace(center=center, std=std, cub_min=cmin, cub_max=cmax,
                        rmax=rmax)
