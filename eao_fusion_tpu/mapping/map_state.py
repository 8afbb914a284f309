"""The global map as one fixed-capacity pytree.

Functional replacement for the reference's mutex-guarded pointer graph
(`src/Map.cc`, `src/KeyFrame.cc`, `src/MapPoint.cc`, `src/MapPlane.cc`):
keyframes, map points, planes and (later) objects live in dense arrays with
validity masks; observations are the per-keyframe slot table `kf_pt_idx`
([K, N] map-point id per keypoint slot, −1 = none) — exactly the
`mvpMapPoints` layout of the reference, but as a tensor.

Derived structure is recomputed on device instead of being maintained
incrementally under locks:
  * covisibility graph  = indicator-matrix matmul (see covisibility.py),
    replacing `KeyFrame::UpdateConnections` (`src/KeyFrame.cc:325`).
  * point statistics (normals, view ranges, distinctive descriptor) are
    recomputed batched at keyframe rate.

This removes the reference's race class between Tracking and LocalMapping
(SURVEY.md §5.2) by construction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.types import FrameFeatures


class MapState(NamedTuple):
    # --- keyframes -------------------------------------------------------
    kf_pose: jax.Array        # [K, 7] Tcw
    kf_valid: jax.Array       # [K] bool
    kf_frame_id: jax.Array    # [K] int32 source frame index
    kf_timestamp: jax.Array   # [K] float64-as-float32 pair? store float32 sec
    # per-keyframe keypoint channels (SoA mirror of FrameFeatures)
    kf_kp_uv: jax.Array       # [K, N, 2]
    kf_kp_level: jax.Array    # [K, N] int32
    kf_kp_angle: jax.Array    # [K, N]
    kf_kp_depth: jax.Array    # [K, N]
    kf_kp_uright: jax.Array   # [K, N]
    kf_kp_valid: jax.Array    # [K, N] bool
    kf_desc_pm1: jax.Array    # [K, N, 256] int8
    kf_pt_idx: jax.Array      # [K, N] int32 — map-point id per slot, -1 none
    kf_by_obj: jax.Array      # [K] bool — created for a new map object
                              # (`mbCreatedByObjs`: exempt from redundancy
                              # culling, `src/LocalMapping.cc:650`)
    # --- map points ------------------------------------------------------
    pt_xyz: jax.Array         # [P, 3]
    pt_valid: jax.Array       # [P] bool
    pt_desc_pm1: jax.Array    # [P, 256] int8 (distinctive descriptor)
    pt_normal: jax.Array      # [P, 3] mean viewing direction
    pt_min_dist: jax.Array    # [P] scale-invariance range
    pt_max_dist: jax.Array    # [P]
    pt_ref_kf: jax.Array      # [P] int32 creating keyframe
    pt_found: jax.Array       # [P] int32 (tracking found counter)
    pt_visible: jax.Array     # [P] int32 (frustum-visible counter)
    pt_first_frame: jax.Array  # [P] int32 frame id at creation (for culling)
    # --- planes ----------------------------------------------------------
    pl_coeff: jax.Array       # [L, 4] world Hessian plane [n, d]
    pl_valid: jax.Array       # [L] bool
    pl_boundary: jax.Array    # [L, B, 3] world boundary points
    pl_boundary_valid: jax.Array  # [L, B] bool
    pl_obs_count: jax.Array   # [L] int32
    pl_ref_kf: jax.Array      # [L] int32 creating keyframe (loop correction
                              # moves planes through it, like pt_ref_kf)
    # per-keyframe plane observations: camera-frame measured coeffs +
    # associated plane landmark id (feeds plane factors into local/global
    # BA — the reference stores these on the KeyFrame,
    # `include/KeyFrame.h:260-265`)
    kf_pl_coeff: jax.Array    # [K, F, 4]
    kf_pl_idx: jax.Array      # [K, F] int32, -1 = none
    # --- derived (cached at keyframe rate) -------------------------------
    # observation indicator Z [K, P]: kf k observes point p. Derived from
    # kf_pt_idx; every kf_pt_idx mutator must call refresh_obs_ind. Cached
    # because the scatter is keyframe-rate work (~4 ms) that the per-frame
    # tracking path would otherwise pay.
    obs_ind: jax.Array        # [K, P] bool
    # --- counters --------------------------------------------------------
    next_kf: jax.Array        # [] int32 — next free keyframe slot
    next_pt: jax.Array        # [] int32 — next free point slot (ring-ish)
    next_pl: jax.Array        # [] int32

    @property
    def max_kf(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def max_pt(self) -> int:
        return self.pt_xyz.shape[0]


def empty_map(cfg: SystemConfig) -> MapState:
    K = cfg.capacity.max_keyframes
    N = cfg.orb.max_keypoints
    P = cfg.capacity.max_points
    L = cfg.capacity.max_planes
    B = cfg.planes.max_boundary_points
    f32 = jnp.float32
    return MapState(
        kf_pose=jnp.tile(jnp.array([1, 0, 0, 0, 0, 0, 0], f32), (K, 1)),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_timestamp=jnp.zeros((K,), f32),
        kf_kp_uv=jnp.zeros((K, N, 2), f32),
        kf_kp_level=jnp.zeros((K, N), jnp.int32),
        kf_kp_angle=jnp.zeros((K, N), f32),
        kf_kp_depth=jnp.zeros((K, N), f32),
        kf_kp_uright=jnp.full((K, N), -1.0, f32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_desc_pm1=jnp.zeros((K, N, 256), jnp.int8),
        kf_pt_idx=jnp.full((K, N), -1, jnp.int32),
        kf_by_obj=jnp.zeros((K,), bool),
        pt_xyz=jnp.zeros((P, 3), f32),
        pt_valid=jnp.zeros((P,), bool),
        pt_desc_pm1=jnp.zeros((P, 256), jnp.int8),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_min_dist=jnp.zeros((P,), f32),
        pt_max_dist=jnp.full((P,), 1e6, f32),
        pt_ref_kf=jnp.full((P,), -1, jnp.int32),
        pt_found=jnp.zeros((P,), jnp.int32),
        pt_visible=jnp.zeros((P,), jnp.int32),
        pt_first_frame=jnp.full((P,), -1, jnp.int32),
        pl_coeff=jnp.zeros((L, 4), f32),
        pl_valid=jnp.zeros((L,), bool),
        pl_boundary=jnp.zeros((L, B, 3), f32),
        pl_boundary_valid=jnp.zeros((L, B), bool),
        pl_obs_count=jnp.zeros((L,), jnp.int32),
        pl_ref_kf=jnp.full((L,), -1, jnp.int32),
        kf_pl_coeff=jnp.zeros((K, cfg.planes.max_planes_per_frame, 4), f32),
        kf_pl_idx=jnp.full((K, cfg.planes.max_planes_per_frame), -1,
                           jnp.int32),
        obs_ind=jnp.zeros((K, P), bool),
        next_kf=jnp.int32(0),
        next_pt=jnp.int32(0),
        next_pl=jnp.int32(0),
    )


# --------------------------------------------------------------- insertion

def insert_keyframe(m: MapState, feats: FrameFeatures, pose: jax.Array,
                    frame_id, timestamp, kp_pt_idx: jax.Array,
                    by_obj=False) -> Tuple[MapState, jax.Array]:
    """Append a keyframe at slot next_kf. kp_pt_idx [N] carries the tracked
    map-point association of each keypoint slot (-1 = none). `by_obj` marks
    a keyframe inserted because a new map object appeared (the reference's
    `mbCreatedByObjs`) — it is exempt from redundancy culling. Returns
    (new_map, kf_slot). Pure; caller gates on capacity."""
    k = m.next_kf
    m = m._replace(
        kf_by_obj=m.kf_by_obj.at[k].set(jnp.asarray(by_obj, bool)),
        kf_pose=m.kf_pose.at[k].set(pose),
        kf_valid=m.kf_valid.at[k].set(True),
        kf_frame_id=m.kf_frame_id.at[k].set(jnp.int32(frame_id)),
        kf_timestamp=m.kf_timestamp.at[k].set(jnp.float32(timestamp)),
        kf_kp_uv=m.kf_kp_uv.at[k].set(feats.uv),
        kf_kp_level=m.kf_kp_level.at[k].set(feats.level),
        kf_kp_angle=m.kf_kp_angle.at[k].set(feats.angle),
        kf_kp_depth=m.kf_kp_depth.at[k].set(feats.depth),
        kf_kp_uright=m.kf_kp_uright.at[k].set(feats.uright),
        kf_kp_valid=m.kf_kp_valid.at[k].set(feats.valid),
        kf_desc_pm1=m.kf_desc_pm1.at[k].set(feats.desc_pm1),
        kf_pt_idx=m.kf_pt_idx.at[k].set(kp_pt_idx),
        next_kf=k + 1,
    )
    return m, k


def create_points_from_depth(m: MapState, kf_slot: jax.Array,
                             feats: FrameFeatures, pose: jax.Array,
                             kp_pt_idx: jax.Array, max_depth: float,
                             cam: Tuple[float, float, float, float],
                             frame_id, *, scale_factor: float = 1.2,
                             n_levels: int = 8) -> MapState:
    """RGBD landmark creation (semantics of `Tracking::CreateNewKeyFrame`
    `src/Tracking.cc:2521-2576` + `StereoInitialization` :1209): every valid
    keypoint with 0 < depth < max_depth and no associated point spawns a map
    point at its back-projection; its descriptor/normal/view-range seed from
    this observation. New points are written to consecutive slots starting at
    next_pt; slot indices wrap nothing — capacity overflow drops writes.
    """
    from eao_fusion_tpu.ops import lie

    n = feats.uv.shape[0]
    make = (feats.valid & (feats.depth > 0) & (feats.depth < max_depth)
            & (kp_pt_idx < 0))
    # assign consecutive point ids to the selected slots
    order = jnp.cumsum(make.astype(jnp.int32)) - 1
    new_ids = jnp.where(make, m.next_pt + order, -1)
    overflow = new_ids >= m.max_pt
    new_ids = jnp.where(overflow, -1, new_ids)
    make = make & (~overflow)

    xc = lie.backproject(cam, feats.uv, feats.depth)
    twc = lie.se3_inverse(pose)
    xw = lie.se3_apply(twc, xc)
    cam_center = twc[4:7]
    view = xw - cam_center
    dist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist[:, None], 1e-9)

    # scale-invariance limits from the observation octave (MapPoint ctor
    # semantics, `src/MapPoint.cc`): maxDist = dist * scale^level,
    # minDist = maxDist / scale^(L-1).
    # scale factors are static per config; caller passes through feats.level.
    lvl = feats.level.astype(jnp.float32)
    max_d = dist * (scale_factor ** lvl) * scale_factor
    min_d = max_d / (scale_factor ** n_levels)

    if m.max_pt < n:
        # tiny test maps: plain scatter (the slice-block fast path below
        # needs a full [N]-row window inside the table)
        tgt = jnp.where(make, new_ids, m.max_pt)
        m = m._replace(
            pt_xyz=m.pt_xyz.at[tgt].set(xw, mode="drop"),
            pt_valid=m.pt_valid.at[tgt].set(True, mode="drop"),
            pt_desc_pm1=m.pt_desc_pm1.at[tgt].set(feats.desc_pm1,
                                                  mode="drop"),
            pt_normal=m.pt_normal.at[tgt].set(normal, mode="drop"),
            pt_min_dist=m.pt_min_dist.at[tgt].set(min_d, mode="drop"),
            pt_max_dist=m.pt_max_dist.at[tgt].set(max_d, mode="drop"),
            pt_ref_kf=m.pt_ref_kf.at[tgt].set(kf_slot, mode="drop"),
            pt_first_frame=m.pt_first_frame.at[tgt].set(
                jnp.int32(frame_id), mode="drop"),
            pt_found=m.pt_found.at[tgt].set(1, mode="drop"),
            pt_visible=m.pt_visible.at[tgt].set(1, mode="drop"),
            next_pt=jnp.minimum(
                m.next_pt + jnp.sum(make.astype(jnp.int32)), m.max_pt))
        kp_pt_new = jnp.where(make, new_ids, kp_pt_idx)
        return m._replace(
            kf_pt_idx=m.kf_pt_idx.at[kf_slot].set(kp_pt_new))

    # New ids are CONSECUTIVE from next_pt, so the writes are one
    # contiguous [N]-row block: compact the maker rows to the block head
    # (one gather), then dynamic_update_slice each channel — TPU scatters
    # with random indices cost ~1 ms each and there are ten channels
    # (measured 10.9 ms/KF as scatters, ~1 ms as slice updates). Rows of
    # the block that are not makers keep their current table values.
    P, N = m.max_pt, n
    n_make = jnp.sum(make.astype(jnp.int32))
    offset = jnp.clip(m.next_pt, 0, P - N)
    shift = m.next_pt - offset                     # block row of 1st maker
    perm = jnp.argsort(~make, stable=True)         # makers first, in order
    rows = jnp.arange(N, dtype=jnp.int32)
    src_idx = perm[(rows - shift) % N]             # block row -> source kp
    sel = (rows >= shift) & (rows < shift + n_make)

    def put(table, vals, fill_sel=None):
        blk = jax.lax.dynamic_slice_in_dim(table, offset, N, axis=0)
        v = vals if fill_sel is not None else vals[src_idx]
        cond = sel
        if blk.ndim > 1:
            cond = sel.reshape((N,) + (1,) * (blk.ndim - 1))
        blk = jnp.where(cond, v, blk)
        return jax.lax.dynamic_update_slice_in_dim(table, blk, offset,
                                                   axis=0)

    m = m._replace(
        pt_xyz=put(m.pt_xyz, xw),
        pt_valid=put(m.pt_valid, True, fill_sel=True),
        pt_desc_pm1=put(m.pt_desc_pm1, feats.desc_pm1),
        pt_normal=put(m.pt_normal, normal),
        pt_min_dist=put(m.pt_min_dist, min_d),
        pt_max_dist=put(m.pt_max_dist, max_d),
        pt_ref_kf=put(m.pt_ref_kf, kf_slot, fill_sel=True),
        pt_first_frame=put(m.pt_first_frame, jnp.int32(frame_id),
                           fill_sel=True),
        pt_found=put(m.pt_found, 1, fill_sel=True),
        pt_visible=put(m.pt_visible, 1, fill_sel=True),
        next_pt=jnp.minimum(m.next_pt + n_make, m.max_pt),
    )
    # record observations on the keyframe row
    kp_pt_new = jnp.where(make, new_ids, kp_pt_idx)
    m = m._replace(kf_pt_idx=m.kf_pt_idx.at[kf_slot].set(kp_pt_new))
    return m


def refresh_obs_ind(m: MapState) -> MapState:
    """Recompute the cached observation indicator from kf_pt_idx, ALL rows.
    262k-index scatter, ~10 ms on a v5e — reserve for episodic callers
    (map compaction, loop closure, checkpoint load); keyframe-rate mutators
    use refresh_obs_rows / merge_obs_columns below."""
    K, N = m.kf_pt_idx.shape
    P = m.max_pt
    kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    pt = m.kf_pt_idx.reshape(-1)
    ok = (pt >= 0) & m.kf_valid[kf]
    Z = jnp.zeros((K, P + 1), bool)
    Z = Z.at[kf, jnp.where(ok, pt, P)].set(True)
    return m._replace(obs_ind=Z[:, :P])


def refresh_obs_rows(m: MapState, rows: jax.Array) -> MapState:
    """Recompute the observation-indicator rows for the given keyframe
    slots only ([R] int32; duplicates and invalid slots are harmless —
    each row is rebuilt from its own kf_pt_idx row). O(R*N) instead of
    the full O(K*N) scatter; keyframe-rate mutators touch <= window-size
    rows per keyframe."""
    R = rows.shape[0]
    N = m.kf_pt_idx.shape[1]
    P = m.max_pt
    sub = m.kf_pt_idx[rows]                                  # [R, N]
    ok = (sub >= 0) & m.kf_valid[rows][:, None]
    r = jnp.repeat(jnp.arange(R, dtype=jnp.int32), N)
    Zr = jnp.zeros((R, P + 1), bool).at[
        r, jnp.where(ok, sub, P).reshape(-1)].set(True)[:, :P]
    return m._replace(obs_ind=m.obs_ind.at[rows].set(Zr))


def merge_obs_columns(m: MapState, remap: jax.Array,
                      max_merges: int = 512) -> MapState:
    """Apply a point-id remap (loser -> winner, identity elsewhere; [P]
    int32) to the observation indicator: winner columns absorb loser
    columns, loser columns clear — mirroring the kf_pt_idx entry remap of
    point fusion without rebuilding the whole indicator. Non-identity
    entries are compacted to a static max_merges budget (fusion merges
    tens of points per keyframe; overflow beyond the budget is dropped
    and healed by the next full refresh at compaction/loop time)."""
    P = m.max_pt
    K = m.obs_ind.shape[0]
    moved = remap != jnp.arange(P, dtype=remap.dtype)
    order = jnp.argsort(~moved, stable=True)[:max_merges]
    live = moved[order]
    src = jnp.where(live, order, P)
    dst = jnp.where(live, remap[order], P)
    Zt = jnp.zeros((P + 1, K), bool).at[:P].set(m.obs_ind.T)
    g = Zt[src]                       # loser columns (pre-mutation)
    Zt = Zt.at[src].set(False)        # clear losers FIRST: a winner may
    Zt = Zt.at[dst].max(g)            # itself be a later-round loser
    return m._replace(obs_ind=Zt[:P].T)


def compact_points(m: MapState) -> MapState:
    """Compact valid map points into the table prefix and remap every
    reference (keyframe observation rows). Invalid slots freed by culling
    and fusion become reusable; `next_pt` drops to the live count.

    The reference's pointer graph frees points via delete; the dense-table
    equivalent is this periodic compaction (keyframe-rate, jitted). Object
    member ids are remapped by the caller (System) which owns that table.
    Returns (new_map, remap [P] int32 with -1 for dropped slots)."""
    P = m.max_pt
    alive = m.pt_valid
    new_idx = jnp.cumsum(alive.astype(jnp.int32)) - 1       # [P]
    remap = jnp.where(alive, new_idx, -1)
    n_alive = jnp.sum(alive.astype(jnp.int32))

    def scatter_rows(x, fill):
        tgt = jnp.where(alive, new_idx, P)
        out = jnp.full_like(x, fill)
        return out.at[tgt].set(x, mode="drop")

    m = m._replace(
        pt_xyz=scatter_rows(m.pt_xyz, 0.0),
        pt_valid=jnp.arange(P) < n_alive,
        pt_desc_pm1=scatter_rows(m.pt_desc_pm1, 0),
        pt_normal=scatter_rows(m.pt_normal, 0.0),
        pt_min_dist=scatter_rows(m.pt_min_dist, 0.0),
        pt_max_dist=scatter_rows(m.pt_max_dist, 1e6),
        pt_ref_kf=scatter_rows(m.pt_ref_kf, -1),
        pt_found=scatter_rows(m.pt_found, 0),
        pt_visible=scatter_rows(m.pt_visible, 0),
        pt_first_frame=scatter_rows(m.pt_first_frame, -1),
        next_pt=n_alive,
    )
    kf_pt = jnp.where(m.kf_pt_idx >= 0,
                      remap[jnp.clip(m.kf_pt_idx, 0, None)], -1)
    m = m._replace(kf_pt_idx=kf_pt)
    return refresh_obs_ind(m), remap


def compact_keyframes(m: MapState) -> Tuple[MapState, jax.Array]:
    """Compact valid keyframes into the table prefix, preserving insertion
    order, and remap every keyframe-slot reference. Slots freed by keyframe
    culling (`local_mapping.cull_keyframes`) become reusable, so LIFETIME
    keyframe insertions are unbounded — the dense-table equivalent of the
    reference's erase-forever pointer graph (`src/KeyFrame.cc:489`
    SetBadFlag + `src/LocalMapping.cc:636` culling; the reference's mnId
    grows without bound while memory is reclaimed per-KF).

    Remapped in-table: every kf_* row table, obs_ind rows, pt_ref_kf and
    pl_ref_kf values, next_kf. A point/plane whose reference keyframe was
    culled is re-anchored to its first surviving observer (the reference's
    `mpRefKF = mObservations.begin()->first` on erase,
    `src/MapPoint.cc:~erase paths`); one with NO surviving observer is
    invalidated (it has no constraints left).

    HOST STATE IS NOT TOUCHED: callers (System._maybe_compact_keyframes)
    must remap TrackState.ref_kf, LoopCloser bow/edges/groups, and
    trajectory references with the returned remap ([K] int32, -1 for
    dropped slots)."""
    K = m.max_kf
    alive = m.kf_valid
    new_idx = jnp.cumsum(alive.astype(jnp.int32)) - 1        # [K]
    remap = jnp.where(alive, new_idx, -1)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    tgt = jnp.where(alive, new_idx, K)

    def scat(x, fill):
        out = jnp.full_like(x, fill)
        return out.at[tgt].set(x, mode="drop")

    ident_pose = jnp.tile(jnp.array([1, 0, 0, 0, 0, 0, 0], jnp.float32),
                          (K, 1))
    m2 = m._replace(
        kf_pose=ident_pose.at[tgt].set(m.kf_pose, mode="drop"),
        kf_valid=jnp.arange(K) < n_alive,
        kf_frame_id=scat(m.kf_frame_id, -1),
        kf_timestamp=scat(m.kf_timestamp, 0.0),
        kf_kp_uv=scat(m.kf_kp_uv, 0.0),
        kf_kp_level=scat(m.kf_kp_level, 0),
        kf_kp_angle=scat(m.kf_kp_angle, 0.0),
        kf_kp_depth=scat(m.kf_kp_depth, 0.0),
        kf_kp_uright=scat(m.kf_kp_uright, -1.0),
        kf_kp_valid=scat(m.kf_kp_valid, False),
        kf_desc_pm1=scat(m.kf_desc_pm1, 0),
        kf_pt_idx=scat(m.kf_pt_idx, -1),
        kf_by_obj=scat(m.kf_by_obj, False),
        kf_pl_coeff=scat(m.kf_pl_coeff, 0.0),
        kf_pl_idx=scat(m.kf_pl_idx, -1),
        obs_ind=scat(m.obs_ind, False),
        next_kf=n_alive,
    )

    # --- re-anchor point references ------------------------------------
    ref = m.pt_ref_kf
    ref_live = (ref >= 0) & alive[jnp.clip(ref, 0, None)]
    new_ref = jnp.where(ref_live, remap[jnp.clip(ref, 0, None)], -1)
    Zc = m2.obs_ind & m2.kf_valid[:, None]                   # [K, P]
    has_obs = jnp.any(Zc, axis=0)
    first_obs = jnp.argmax(Zc, axis=0).astype(jnp.int32)
    new_ref = jnp.where(new_ref >= 0, new_ref,
                        jnp.where(has_obs, first_obs, -1))
    pt_valid = m.pt_valid & (new_ref >= 0)

    # --- re-anchor plane references (observers from kf_pl_idx) ----------
    L = m.pl_coeff.shape[0]
    F = m.kf_pl_idx.shape[1]
    pl_tgt = jnp.where((m2.kf_pl_idx >= 0) & m2.kf_valid[:, None],
                       m2.kf_pl_idx, L)
    rows = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    pl_ind = jnp.zeros((K, L + 1), bool).at[
        rows, pl_tgt.reshape(-1)].set(True)[:, :L]           # [K, L]
    pl_has = jnp.any(pl_ind, axis=0)
    pl_first = jnp.argmax(pl_ind, axis=0).astype(jnp.int32)
    pref = m.pl_ref_kf
    pref_live = (pref >= 0) & alive[jnp.clip(pref, 0, None)]
    new_pref = jnp.where(pref_live, remap[jnp.clip(pref, 0, None)], -1)
    new_pref = jnp.where(new_pref >= 0, new_pref,
                         jnp.where(pl_has, pl_first, -1))
    pl_valid = m.pl_valid & (new_pref >= 0)

    m2 = m2._replace(pt_ref_kf=jnp.where(m.pt_valid, new_ref, -1),
                     pt_valid=pt_valid,
                     pl_ref_kf=jnp.where(m.pl_valid, new_pref, -1),
                     pl_valid=pl_valid)
    # points invalidated above must also leave the observation tables
    kf_pt = m2.kf_pt_idx
    kf_pt = jnp.where((kf_pt >= 0)
                      & pt_valid[jnp.clip(kf_pt, 0, None)], kf_pt, -1)
    m2 = m2._replace(kf_pt_idx=kf_pt)
    return refresh_obs_ind(m2), remap


def evict_keyframes(m: MapState, n_evict: int,
                    protect_recent: int = 10,
                    min_covis_protect: float = 15.0) -> MapState:
    """Capacity eviction: invalidate up to `n_evict` keyframes that are
    least relevant to the CURRENT mapping window. Called only when the
    table is nearly full of live keyframes and redundancy culling freed
    nothing (a non-revisiting exploratory trajectory) — the fixed-capacity
    analogue of a sliding window: tracking/local mapping only ever touch
    the covisible window, so distant old keyframes can be dropped at the
    cost of loop-closure coverage of the evicted region (unavoidable with
    bounded tables; the reference instead grows memory without bound).

    HARD-protected: the `protect_recent` most recent keyframes (the active
    tracking/mapping window must survive). Everything else is scored by
    its strongest covisibility tie to that recent window — lowest first,
    oldest on ties — so distant disconnected keyframes go long before
    window-covisible ones, but eviction always frees the requested slots
    (the caller only asks when the table is genuinely full). Landmarks
    that lose their last observer are reclaimed by the following
    compact_keyframes call."""
    del min_covis_protect   # superseded by the soft covisibility score
    K = m.max_kf
    Z = (m.obs_ind & m.kf_valid[:, None]).astype(jnp.float32)
    covis = Z @ Z.T                                           # [K, K]
    idx = jnp.arange(K)
    order_rank = jnp.where(m.kf_valid, idx, -1)
    recent_cut = jnp.sort(order_rank)[K - protect_recent]
    protected = m.kf_valid & (idx >= recent_cut)
    # relevance = strongest tie to the protected (recent) window
    rel = jnp.max(jnp.where(protected[None, :], covis, -1.0), axis=1)
    # evict lowest relevance, oldest first on ties (rel is integer-valued
    # shared-point counts, so a 1e4 scale keeps idx strictly a tie-break);
    # object-created keyframes (the only observers anchoring a young
    # object's points) are deprioritized below everything else
    score = rel * 1e4 + idx.astype(jnp.float32) \
        + jnp.where(m.kf_by_obj, 1e8, 0.0)
    score = jnp.where(m.kf_valid & (~protected), score, jnp.inf)
    victim_score, victims = jax.lax.top_k(-score, n_evict)
    ok = victim_score > -jnp.inf
    kf_valid = m.kf_valid.at[jnp.where(ok, victims, K)].set(
        False, mode="drop")
    return m._replace(kf_valid=kf_valid)


def update_point_stats(m: MapState) -> MapState:
    """Batched recomputation of per-point aggregates from all observations:
    mean viewing normal. Replaces `MapPoint::UpdateNormalAndDepth`
    (`src/MapPoint.cc:300-340`).

    PRECONDITION: obs_ind is current (callers refresh it first).
    MXU form, no scatters: with Z the [K, P] observation indicator and
    W = Z / dist(cam_k, point_p),
        sum_of_unit_dirs[p] = x_p * sum_k W[k,p] - (W^T C)[p]
    because each unit viewing dir is (x_p - c_k)/d[k,p]. The pairwise
    distance matrix comes from one [K,3]@[3,P] matmul (norm expansion)."""
    from eao_fusion_tpu.ops import lie

    Z = (m.obs_ind & m.kf_valid[:, None]).astype(jnp.float32)   # [K, P]
    twc = lie.se3_inverse(m.kf_pose)
    C = twc[:, 4:7]                                             # [K, 3]
    X = m.pt_xyz                                                # [P, 3]
    G = C @ X.T                                                 # [K, P]
    d2 = (jnp.sum(X * X, axis=-1)[None, :]
          + jnp.sum(C * C, axis=-1)[:, None] - 2.0 * G)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    W = Z / jnp.maximum(d, 1e-9)
    w1 = jnp.sum(W, axis=0)                                     # [P]
    normal = X * w1[:, None] - W.T @ C                          # [P, 3]
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = jnp.where(nrm > 1e-6, normal / jnp.maximum(nrm, 1e-9),
                       m.pt_normal)
    return m._replace(pt_normal=jnp.where(m.pt_valid[:, None], normal,
                                          m.pt_normal))
