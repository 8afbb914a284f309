"""Object-table update after association: member fusion, projection culling,
statistics refresh, isolation-forest culling, and new-object creation.

Re-design of `Object_Map::DataAssociateUpdate` (`src/Object.cc:1352-1602`)
and the creation branch of `ObjectDataAssociation` (:663-722) as one
scattered batch update over the fixed-capacity table."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.objects.association import AssocResult
from eao_fusion_tpu.objects.iforest import cull_mask
from eao_fusion_tpu.objects.object_map import (MEMBERS, SAMPLE, FrameObjects,
                                               ObjectTable, member_stats)
from eao_fusion_tpu.ops import lie

IFOREST_SKIP_CLASSES = (75, 64, 65)   # reference `src/Object.cc:1244-1246`
IFOREST_SPECIAL_CLASS = 62            # threshold 0.65 instead of 0.6


@functools.partial(jax.jit, static_argnames=("cfg", "compact"))
def iforest_cull(tab: ObjectTable, pt_xyz: jax.Array, key: jax.Array,
                 touched=None, *, cfg: SystemConfig,
                 compact: int = 0) -> ObjectTable:
    """Isolation-forest member culling over (a subset of) the object table
    (`Object_Map::IsolationForestDeleteOutliers`).

    `compact` > 0 gathers only that many gated rows (most recently seen
    first), runs the forest on the compact subset, and scatters the culled
    membership back — the reference only re-culls objects whose membership
    changed (the cull runs inside `DataAssociateUpdate`,
    `src/Object.cc:1352-1602`), so bounding the per-pass row count to the
    recently-updated set preserves behavior while keeping the forest cost
    independent of table capacity (full-table vmap: 36 ms/KF on v5e; the
    steady-state hotspot of round 2)."""
    oc = cfg.objects
    O = tab.cls.shape[0]
    thresh = jnp.where(tab.cls == IFOREST_SPECIAL_CLASS,
                       oc.iforest_threshold_merged, oc.iforest_threshold)
    skip = jnp.zeros((O,), bool)
    for c in IFOREST_SKIP_CLASSES:
        skip = skip | (tab.cls == c)
    gate = tab.valid & (~skip)
    if touched is not None:
        gate = gate & touched

    if compact and compact < O:
        K = compact
        # most-recently-observed gated rows first (membership only changes
        # on observation, so stale rows were already culled when touched)
        score = jnp.where(gate, tab.last_frame, jnp.int32(-1))
        _, rows = jax.lax.top_k(score, K)                    # distinct rows
        rgate = gate[rows]
        pw = pt_xyz[jnp.clip(tab.pt_idx[rows], 0, None)]     # [K, M, 3]
        keys = jax.random.split(key, K)
        cull = jax.vmap(
            lambda p, v, k, t: cull_mask(p, v, k, t,
                                         n_trees=oc.iforest_trees))(
            pw, tab.pt_ok[rows], keys, thresh[rows])
        cull = cull & rgate[:, None]
        sink_rows = jnp.where(rgate, rows, O)
        tab = tab._replace(pt_ok=tab.pt_ok.at[sink_rows].set(
            tab.pt_ok[rows] & (~cull), mode="drop"))
        return member_stats(tab, pt_xyz)

    pw = pt_xyz[jnp.clip(tab.pt_idx, 0, None)]
    keys = jax.random.split(key, O)
    cull = jax.vmap(
        lambda p, v, k, t: cull_mask(p, v, k, t, n_trees=oc.iforest_trees))(
        pw, tab.pt_ok, keys, thresh)
    cull = cull & gate[:, None]
    tab = tab._replace(pt_ok=tab.pt_ok & (~cull))
    return member_stats(tab, pt_xyz)


@functools.partial(jax.jit, static_argnames=("cfg",))
def object_update(tab: ObjectTable, fo: FrameObjects, assoc: AssocResult,
                  pt_xyz: jax.Array, tcw: jax.Array, frame_id: jax.Array,
                  key: jax.Array, *, cfg: SystemConfig) -> ObjectTable:
    oc = cfg.objects
    F = fo.box.shape[0]
    O = tab.cls.shape[0]
    W, H = cfg.camera.width, cfg.camera.height
    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)

    # ---- resolve duplicate targets (keep the larger frame object) -------
    target = assoc.target
    key_score = jnp.where(target >= 0, fo.n_pts, -1)
    best_per_o = jnp.full((O,), -1, jnp.int32).at[
        jnp.where(target >= 0, target, O)].max(key_score, mode="drop")
    winner = (target >= 0) & (key_score == best_per_o[jnp.clip(target, 0, O - 1)])
    # tie-break by frame-object index
    first_f = jnp.full((O,), F, jnp.int32).at[
        jnp.where(winner, target, O)].min(jnp.arange(F, dtype=jnp.int32),
                                          mode="drop")
    winner = winner & (jnp.arange(F) == first_f[jnp.clip(target, 0, O - 1)])
    target = jnp.where(winner, target, -1)
    tgt_row = jnp.where(target >= 0, target, O)   # O = sink row

    # ---- 1. member addition (dedup + distance gate) ----------------------
    # distance gate: || p - center_o || <= th * rmax_o, th = 1.0 / 0.9
    th = jnp.where(tab.n_frames > 5, 0.9, 1.0)               # [O]
    cen_t = tab.center[jnp.clip(target, 0, O - 1)]           # [F, 3]
    rmax_t = (tab.rmax * th)[jnp.clip(target, 0, O - 1)]     # [F]
    first_obs = tab.n_frames[jnp.clip(target, 0, O - 1)] == 0
    dist = jnp.linalg.norm(fo.pt_w - cen_t[:, None, :], axis=-1)
    dist_ok = (dist <= rmax_t[:, None]) | first_obs[:, None]
    cand = fo.pt_valid & dist_ok & (target >= 0)[:, None]    # [F, S]

    # dedup: does pid already exist in the target row?
    row_ids = tab.pt_idx[jnp.clip(target, 0, O - 1)]         # [F, M]
    row_ok = tab.pt_ok[jnp.clip(target, 0, O - 1)]
    eq = (fo.pt_ids[:, :, None] == row_ids[:, None, :]) & row_ok[:, None, :]
    exists = eq.any(axis=-1)                                 # [F, S]
    # addcnt increment for re-observed members
    slot_of = jnp.argmax(eq, axis=-1)                        # [F, S]
    inc_ok = exists & cand
    tab = tab._replace(pt_addcnt=tab.pt_addcnt.at[
        jnp.where(inc_ok, tgt_row[:, None], O).reshape(-1),
        slot_of.reshape(-1)].add(1, mode="drop"))

    new = cand & (~exists)                                   # [F, S]
    # free-slot assignment in each target row
    free_val, free_idx = jax.lax.top_k((~row_ok).astype(jnp.int32), MEMBERS)
    n_free = (~row_ok).sum(axis=1)
    rank = jnp.cumsum(new, axis=1) - 1                       # [F, S]
    can_place = new & (rank < n_free[:, None])
    slot = jnp.take_along_axis(free_idx, jnp.clip(rank, 0, MEMBERS - 1),
                               axis=1)
    r_f = jnp.where(can_place, tgt_row[:, None], O).reshape(-1)
    r_s = slot.reshape(-1)
    tab = tab._replace(
        pt_idx=tab.pt_idx.at[r_f, r_s].set(fo.pt_ids.reshape(-1), mode="drop"),
        pt_ok=tab.pt_ok.at[r_f, r_s].set(True, mode="drop"),
        pt_addcnt=tab.pt_addcnt.at[r_f, r_s].set(1, mode="drop"))

    # ---- 2. bookkeeping --------------------------------------------------
    upd = jnp.zeros((O,), bool).at[tgt_row].set(True, mode="drop")
    box_of_o = jnp.zeros((O + 1, 4), jnp.float32).at[tgt_row].set(
        fo.box, mode="drop")[:O]
    cen_of_o = jnp.zeros((O + 1, 3), jnp.float32).at[tgt_row].set(
        fo.center, mode="drop")[:O]
    tab = tab._replace(
        n_frames=jnp.where(upd, tab.n_frames + 1, tab.n_frames),
        lastlast_frame=jnp.where(upd, tab.last_frame, tab.lastlast_frame),
        last_frame=jnp.where(upd, frame_id, tab.last_frame),
        lastlast_rect=jnp.where(upd[:, None], tab.last_rect,
                                tab.lastlast_rect),
        last_rect=jnp.where(upd[:, None], box_of_o, tab.last_rect),
        cen_sum=jnp.where(upd[:, None], tab.cen_sum + cen_of_o, tab.cen_sum),
        cen_sq=jnp.where(upd[:, None], tab.cen_sq + cen_of_o * cen_of_o,
                         tab.cen_sq))

    # ---- 3. projection culling (members outside the current box) ---------
    # only when the box is well inside the image (25 px margin,
    # `src/Object.cc:1540-1546`) and member seen <= 8 times
    margin_ok_f = ((fo.box[:, 0] > 25) & (fo.box[:, 1] > 25)
                   & (fo.box[:, 2] < W - 25) & (fo.box[:, 3] < H - 25))
    margin_of_o = jnp.zeros((O + 1,), bool).at[tgt_row].set(
        margin_ok_f, mode="drop")[:O]
    pw = pt_xyz[jnp.clip(tab.pt_idx, 0, None)]
    pc = lie.se3_apply(tcw[None, None], pw)
    uv = lie.project(cam, pc)
    in_img = ((pc[..., 2] > 0.05) & (uv[..., 0] > 0) & (uv[..., 0] < W)
              & (uv[..., 1] > 0) & (uv[..., 1] < H))
    inside_box = ((uv[..., 0] >= box_of_o[:, None, 0])
                  & (uv[..., 0] <= box_of_o[:, None, 2])
                  & (uv[..., 1] >= box_of_o[:, None, 1])
                  & (uv[..., 1] <= box_of_o[:, None, 3]))
    cull_proj = (tab.pt_ok & in_img & (~inside_box)
                 & (tab.pt_addcnt <= 8)
                 & (upd & margin_of_o)[:, None])
    tab = tab._replace(pt_ok=tab.pt_ok & (~cull_proj))

    # ---- 4. creation ------------------------------------------------------
    create = fo.valid & (assoc.target < 0) & (~fo.on_edge) & \
        (fo.n_pts >= oc.min_points_init)
    order = jnp.cumsum(create.astype(jnp.int32)) - 1
    new_row = jnp.where(create, tab.next_obj + order, O)
    new_row = jnp.where(new_row >= O, O, new_row)
    pad = MEMBERS - SAMPLE
    mem_ids = jnp.concatenate([fo.pt_ids,
                               jnp.full((F, pad), -1, jnp.int32)], axis=1)
    mem_ok = jnp.concatenate([fo.pt_valid, jnp.zeros((F, pad), bool)], axis=1)
    tab = tab._replace(
        cls=tab.cls.at[new_row].set(fo.cls, mode="drop"),
        valid=tab.valid.at[new_row].set(True, mode="drop"),
        pt_idx=tab.pt_idx.at[new_row].set(mem_ids, mode="drop"),
        pt_ok=tab.pt_ok.at[new_row].set(mem_ok, mode="drop"),
        pt_addcnt=tab.pt_addcnt.at[new_row].set(
            mem_ok.astype(jnp.int32), mode="drop"),
        n_frames=tab.n_frames.at[new_row].set(1, mode="drop"),
        last_frame=tab.last_frame.at[new_row].set(frame_id, mode="drop"),
        lastlast_frame=tab.lastlast_frame.at[new_row].set(frame_id, mode="drop"),
        last_rect=tab.last_rect.at[new_row].set(fo.box, mode="drop"),
        lastlast_rect=tab.lastlast_rect.at[new_row].set(fo.box, mode="drop"),
        cen_sum=tab.cen_sum.at[new_row].set(fo.center, mode="drop"),
        cen_sq=tab.cen_sq.at[new_row].set(fo.center * fo.center, mode="drop"),
        next_obj=jnp.minimum(tab.next_obj
                             + jnp.sum(create.astype(jnp.int32)), O))
    touched = upd | jnp.zeros((O,), bool).at[new_row].set(True, mode="drop")

    # ---- 5. stats + isolation forest -------------------------------------
    tab = member_stats(tab, pt_xyz)
    if oc.mode not in ("None", "NA") and not oc.iforest_keyframe_rate:
        tab = iforest_cull(tab, pt_xyz, key, touched, cfg=cfg,
                           compact=cfg.objects.iforest_compact_rows)

    # ---- 6. co-occurrence + potential-association counters ---------------
    present_rows = jnp.concatenate([
        jnp.where(target >= 0, target, O),
        new_row])                                           # [2F]
    pr_onehot = jnp.zeros((2 * F, O + 1), jnp.float32).at[
        jnp.arange(2 * F), present_rows].set(1.0)[:, :O]
    pvec = pr_onehot.max(axis=0)                            # [O] present now
    co = jnp.outer(pvec, pvec) * (1.0 - jnp.eye(O))
    tab = tab._replace(sametime=tab.sametime + co.astype(jnp.int32))

    pot = assoc.potential & (target >= 0)[:, None]          # [F, O]
    add_re = jnp.zeros((O + 1, O), jnp.int32).at[tgt_row].add(
        pot.astype(jnp.int32), mode="drop")[:O]
    tab = tab._replace(reobj=tab.reobj + add_re)
    return tab
