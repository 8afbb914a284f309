"""Map-object merge and overlap resolution (keyframe-rate maintenance).

Re-design of `Object_Map::WhetherMergeTwoMapObjs` / `MergeTwoMapObjs` /
`WhetherOverlap` / `DealTwoOverlapObjs` / `BigToSmall` /
`DivideEquallyTwoObjs` (`src/Object.cc:1655-2228`) driven from the
LocalMapping thread (`src/LocalMapping.cc:798-883`). Sequential pairwise
merges become a small fixed number of one-pair-per-iteration passes (each
pass picks the strongest candidate), which converges across keyframes.

Merge gate parity note: the reference's double-t-test
(`DoubleSampleTtest`, :1708) pools MEANS instead of standard deviations —
and its result is irrelevant anyway because the caller merges whenever the
pair never co-appeared (`(!bSametime || bDoubelTtest)` with bSametime
false, :1681-1703). We keep the effective behavior: reobj >= 3 and no
co-appearance => merge, smaller object absorbed by the bigger one.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.objects.object_map import MEMBERS, ObjectTable, member_stats


def _absorb(tab: ObjectTable, big: jax.Array, small: jax.Array,
            pt_xyz: jax.Array, active: jax.Array) -> ObjectTable:
    """Merge `small` into `big` (both scalar row indices); no-op if ~active."""
    O = tab.cls.shape[0]
    sink = O
    bigr = jnp.where(active, big, sink)
    smallr = jnp.where(active, small, sink)

    # member transfer with the 1.1x-cuboid gate (`MergeTwoMapObjs` :1768-1778)
    sm_ids = tab.pt_idx[jnp.clip(small, 0, O - 1)]
    sm_ok = tab.pt_ok[jnp.clip(small, 0, O - 1)] & active
    cub_c = 0.5 * (tab.cub_min[jnp.clip(big, 0, O - 1)]
                   + tab.cub_max[jnp.clip(big, 0, O - 1)])
    half = 0.55 * (tab.cub_max[jnp.clip(big, 0, O - 1)]
                   - tab.cub_min[jnp.clip(big, 0, O - 1)])  # 1.1 * dims/2
    pw = pt_xyz[jnp.clip(sm_ids, 0, None)]
    inside = jnp.all(jnp.abs(pw - cub_c) <= half + 1e-6, axis=-1)
    sm_ok = sm_ok & inside
    # dedup vs big's members
    bg_ids = tab.pt_idx[jnp.clip(big, 0, O - 1)]
    bg_ok = tab.pt_ok[jnp.clip(big, 0, O - 1)]
    exists = ((sm_ids[:, None] == bg_ids[None, :]) & bg_ok[None, :]).any(1)
    sm_ok = sm_ok & (~exists)
    # free slots of big
    _, free_idx = jax.lax.top_k((~bg_ok).astype(jnp.int32), MEMBERS)
    n_free = (~bg_ok).sum()
    rank = jnp.cumsum(sm_ok) - 1
    place = sm_ok & (rank < n_free)
    slot = free_idx[jnp.clip(rank, 0, MEMBERS - 1)]
    rows = jnp.where(place, bigr, sink)
    tab = tab._replace(
        pt_idx=tab.pt_idx.at[rows, slot].set(sm_ids, mode="drop"),
        pt_ok=tab.pt_ok.at[rows, slot].set(True, mode="drop"),
        pt_addcnt=tab.pt_addcnt.at[rows, slot].set(1, mode="drop"))

    # counters / recency bookkeeping
    nf_s = tab.n_frames[jnp.clip(small, 0, O - 1)]
    more_recent = tab.last_frame[jnp.clip(small, 0, O - 1)] > \
        tab.last_frame[jnp.clip(big, 0, O - 1)]
    tab = tab._replace(
        n_frames=tab.n_frames.at[bigr].add(nf_s, mode="drop"),
        cen_sum=tab.cen_sum.at[bigr].add(
            tab.cen_sum[jnp.clip(small, 0, O - 1)], mode="drop"),
        cen_sq=tab.cen_sq.at[bigr].add(
            tab.cen_sq[jnp.clip(small, 0, O - 1)], mode="drop"),
        last_frame=tab.last_frame.at[
            jnp.where(active & more_recent, big, sink)].set(
            tab.last_frame[jnp.clip(small, 0, O - 1)], mode="drop"),
        last_rect=tab.last_rect.at[
            jnp.where(active & more_recent, big, sink)].set(
            tab.last_rect[jnp.clip(small, 0, O - 1)], mode="drop"),
        reobj=tab.reobj.at[bigr].add(
            tab.reobj[jnp.clip(small, 0, O - 1)], mode="drop"),
        sametime=tab.sametime.at[bigr].add(
            tab.sametime[jnp.clip(small, 0, O - 1)], mode="drop"),
        valid=tab.valid.at[smallr].set(False, mode="drop"))
    return tab


def _pair_volumes(tab: ObjectTable) -> Tuple[jax.Array, jax.Array, jax.Array]:
    dims = jnp.maximum(tab.cub_max - tab.cub_min, 0.0)
    vol = dims.prod(axis=-1)
    olo = jnp.maximum(tab.cub_min[:, None, :], tab.cub_min[None, :, :])
    ohi = jnp.minimum(tab.cub_max[:, None, :], tab.cub_max[None, :, :])
    odim = jnp.maximum(ohi - olo, 0.0)
    ovol = odim.prod(axis=-1)
    return vol, ovol, odim


@functools.partial(jax.jit, static_argnames=("cfg", "n_rounds"))
def merge_and_overlap(tab: ObjectTable, pt_xyz: jax.Array, key: jax.Array,
                      *, cfg: SystemConfig, n_rounds: int = 3) -> ObjectTable:
    O = tab.cls.shape[0]
    neye = ~jnp.eye(O, dtype=bool)

    def round_body(i, tab):
        # ---------- potential-association merge (reobj >= 3, never
        # co-appearing) ----------
        cand = (tab.valid[:, None] & tab.valid[None, :] & neye
                & (tab.reobj >= 3) & (tab.sametime == 0))
        score = jnp.where(cand, tab.reobj, -1)
        flat = jnp.argmax(score)
        i0, j0 = flat // O, flat % O
        active = score.reshape(-1)[flat] > 0
        bigger = tab.n_frames[i0] >= tab.n_frames[j0]
        big = jnp.where(bigger, i0, j0)
        small = jnp.where(bigger, j0, i0)
        tab = _absorb(tab, big, small, pt_xyz, active)
        # clear the processed counter either way
        tab = tab._replace(reobj=tab.reobj.at[i0, j0].set(0).at[j0, i0].set(0))

        # ---------- cuboid overlap resolution ----------
        vol, ovol, odim = _pair_volumes(tab)
        overlapping = (tab.valid[:, None] & tab.valid[None, :] & neye
                       & (ovol > 1e-9))
        iou3 = ovol / jnp.maximum(vol[:, None] + vol[None, :] - ovol, 1e-9)
        b_iou = iou3 >= 0.3
        b_volume = (vol[:, None] > 2 * vol[None, :]) | \
                   (vol[None, :] > 2 * vol[:, None])
        b_same = tab.sametime > 3
        b_class = tab.cls[:, None] == tab.cls[None, :]
        case1 = overlapping & b_iou & (~b_volume) & (~b_same) & b_class
        case2 = overlapping & b_volume & (~b_same) & b_class
        case5 = overlapping & b_iou & (~b_same) & b_class
        nf = tab.n_frames
        case5 = case5 & ((nf[:, None] // 2 >= nf[None, :])
                         | (nf[None, :] // 2 >= nf[:, None]))
        merge_pair = case1 | case5
        score2 = jnp.where(merge_pair, ovol, -1.0)
        flat2 = jnp.argmax(score2)
        i1, j1 = flat2 // O, flat2 % O
        act2 = score2.reshape(-1)[flat2] > 0
        bigger2 = nf[i1] >= nf[j1]
        tab = _absorb(tab, jnp.where(bigger2, i1, j1),
                      jnp.where(bigger2, j1, i1), pt_xyz, act2)

        # case 2 (false detection): erase the smaller/less-observed one
        e_ij = case2 & (nf[:, None] >= nf[None, :]) & \
            (vol[:, None] > vol[None, :]) & (~merge_pair)
        erase = e_ij.any(axis=0)          # column j erased by some row i
        tab = tab._replace(valid=tab.valid & (~erase))
        return tab

    tab = jax.lax.fori_loop(0, n_rounds, round_body, tab)
    tab = member_stats(tab, pt_xyz)
    if (cfg.objects.iforest_keyframe_rate
            and cfg.objects.mode not in ("None", "NA")):
        from eao_fusion_tpu.objects.update import iforest_cull
        tab = iforest_cull(tab, pt_xyz, key, cfg=cfg,
                           compact=cfg.objects.iforest_compact_rows)
    return tab
