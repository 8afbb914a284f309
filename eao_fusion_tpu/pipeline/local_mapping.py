"""Local mapping at keyframe rate: point culling, window selection, local
BA, outlier observation removal, batched point-statistic refresh.

Re-design of `LocalMapping::Run` (`src/LocalMapping.cc:41-116`): the
reference's mapping thread becomes one pure function invoked per keyframe.
RGBD landmark creation happens at keyframe insertion (system.py); epipolar
triangulation (`CreateNewMapPoints`, needed for mono) lives in
solvers/triangulation.py and is wired for the monocular path.

Design notes vs the reference:
  * `MapPointCulling` (`src/LocalMapping.cc:174`): found/visible ratio
    < 0.25, or < 3 observations within 2 keyframes of creation.
  * window = top-covisible keyframes of the new KF (optimized) + the
    best-connected frontier keyframes (fixed), capacities from
    MapCapacity.max_local_ba_kfs — the reference takes *all* covisible and
    *all* frontier KFs; fixed caps + top-k keep shapes static.
  * the distinctive point descriptor (`MapPoint::ComputeDistinctiveDescriptors`,
    medoid by median Hamming) is replaced by the Hamming-space centroid:
    per-bit majority vote over observations — one segment-sum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.mapping import covisibility
from eao_fusion_tpu.mapping.map_state import MapState, update_point_stats
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers import ba


@functools.partial(jax.jit, static_argnames=("cfg",))
def create_points_mono(m: MapState, kf_slot: jax.Array, *,
                       cfg: SystemConfig) -> MapState:
    """Monocular new-point creation: epipolar triangulation of unmatched
    keypoints between the new keyframe and its best covisible neighbors
    (`LocalMapping::CreateNewMapPoints`, `src/LocalMapping.cc:211-456` with
    `ORBmatcher::SearchForTriangulation`)."""
    from eao_fusion_tpu.frontend import matcher as fm
    from eao_fusion_tpu.solvers import triangulation

    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    s = cfg.orb.scale_factor
    Z = covisibility.observation_indicator(m)
    covis = covisibility.covisibility_counts(Z)
    row = covis[kf_slot].at[kf_slot].set(0.0)
    row = jnp.where(m.kf_valid, row, -1.0)
    n_tri = cfg.capacity.triangulation_neighbors
    _, nbrs = jax.lax.top_k(row, n_tri)

    def with_neighbor(m, nb):
        ok_nb = (covis[kf_slot, nb] > 10) & m.kf_valid[nb] & (nb != kf_slot)
        # unassociated keypoints on both sides
        va = m.kf_kp_valid[kf_slot] & (m.kf_pt_idx[kf_slot] < 0)
        vb = m.kf_kp_valid[nb] & (m.kf_pt_idx[nb] < 0)
        mm = fm.mutual_match(m.kf_desc_pm1[kf_slot], va,
                             m.kf_kp_angle[kf_slot],
                             m.kf_desc_pm1[nb], vb, m.kf_kp_angle[nb],
                             th=cfg.matcher.th_low, use_ratio=True,
                             check_rotation=True)
        tgt = mm.target_idx
        pair_ok = (tgt >= 0) & ok_nb
        jb = jnp.clip(tgt, 0, None)
        res = triangulation.triangulate_checked(
            m.kf_pose[kf_slot], m.kf_pose[nb],
            m.kf_kp_uv[kf_slot], m.kf_kp_uv[nb][jb], pair_ok,
            s ** (-2.0 * m.kf_kp_level[kf_slot].astype(jnp.float32)),
            s ** (-2.0 * m.kf_kp_level[nb][jb].astype(jnp.float32)),
            cam=cam)
        make = res.ok & pair_ok
        order = jnp.cumsum(make.astype(jnp.int32)) - 1
        new_ids = jnp.where(make, m.next_pt + order, -1)
        overflow = new_ids >= m.max_pt
        make = make & (~overflow)
        new_ids = jnp.where(make, new_ids, -1)
        tgt_pt = jnp.where(make, new_ids, m.max_pt)

        cam_center = lie.se3_inverse(m.kf_pose[kf_slot])[4:7]
        view = res.xyz - cam_center
        dist = jnp.linalg.norm(view, axis=-1)
        lvl = m.kf_kp_level[kf_slot].astype(jnp.float32)
        max_d = dist * (s ** lvl) * 1.2
        m = m._replace(
            pt_xyz=m.pt_xyz.at[tgt_pt].set(res.xyz, mode="drop"),
            pt_valid=m.pt_valid.at[tgt_pt].set(True, mode="drop"),
            pt_desc_pm1=m.pt_desc_pm1.at[tgt_pt].set(
                m.kf_desc_pm1[kf_slot], mode="drop"),
            pt_normal=m.pt_normal.at[tgt_pt].set(
                view / jnp.maximum(dist[:, None], 1e-9), mode="drop"),
            pt_min_dist=m.pt_min_dist.at[tgt_pt].set(
                max_d / (s ** cfg.orb.n_levels), mode="drop"),
            pt_max_dist=m.pt_max_dist.at[tgt_pt].set(max_d, mode="drop"),
            pt_ref_kf=m.pt_ref_kf.at[tgt_pt].set(kf_slot, mode="drop"),
            pt_found=m.pt_found.at[tgt_pt].set(1, mode="drop"),
            pt_visible=m.pt_visible.at[tgt_pt].set(1, mode="drop"),
            pt_first_frame=m.pt_first_frame.at[tgt_pt].set(
                m.kf_frame_id[kf_slot], mode="drop"),
            next_pt=jnp.minimum(m.next_pt
                                + jnp.sum(make.astype(jnp.int32)), m.max_pt))
        # record observations in both keyframes
        kp_a = jnp.where(make, new_ids, m.kf_pt_idx[kf_slot])
        m = m._replace(kf_pt_idx=m.kf_pt_idx.at[kf_slot].set(kp_a))
        n_slots = m.kf_pt_idx.shape[1]
        row_b = m.kf_pt_idx[nb]
        row_b = row_b.at[jnp.where(make, jb, n_slots)].set(
            new_ids, mode="drop")
        m = m._replace(kf_pt_idx=m.kf_pt_idx.at[nb].set(row_b))
        return m

    for k in range(n_tri):
        m = with_neighbor(m, nbrs[k])
    from eao_fusion_tpu.mapping.map_state import refresh_obs_rows
    return refresh_obs_rows(m, jnp.concatenate([kf_slot[None], nbrs]))


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_neighbors(m: MapState, kf_slot: jax.Array, *,
                   cfg: SystemConfig) -> MapState:
    """Duplicate map-point fusion with covisible neighbors
    (`LocalMapping::SearchInNeighbors` + `ORBmatcher::Fuse`,
    `src/LocalMapping.cc:458-634`, `src/ORBmatcher.cc:825`):

    BOTH fuse directions of the reference are run, per neighbor:
      * new KF's points -> neighbor frame (first loop, `:554-562`)
      * neighbor's points -> the NEW keyframe (second loop, `:564-576`) —
        this is the direction that gives old, currently-untracked
        landmarks fresh observations in the new keyframe; without it they
        starve below the obs>=3 culling bar during exploration.
    A projection that lands on a keypoint with a matching descriptor
    either merges the two map points (the better-observed id wins, all
    references redirected) or adds the missing observation.

    The reference visits nn=10 covisible keyframes (RGBD,
    `src/LocalMapping.cc:462`) plus 5 second-level neighbors of each; here
    the top `cfg.capacity.fuse_neighbors` covisible keyframes are matched
    in ONE vmapped batch (all 2*n directions against the same pre-fuse
    state — the matches are independent, so the 2n masked-Hamming passes
    ride the MXU together), and the loser->winner redirects compose
    sequentially afterwards. The second-level extension is subsumed: the
    top-10 covisibility row of a fresh keyframe already covers the
    reference's deduped first+second-level set at our keyframe density."""
    from eao_fusion_tpu.frontend import matcher as fm
    from eao_fusion_tpu.types import FrameFeatures

    cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    W, H = cfg.camera.width, cfg.camera.height
    s = cfg.orb.scale_factor
    Z = covisibility.observation_indicator(m)
    covis = covisibility.covisibility_counts(Z)
    obs_count = jnp.sum(Z, axis=0)
    row = covis[kf_slot].at[kf_slot].set(0.0)
    row = jnp.where(m.kf_valid, row, -1.0)
    n_fuse = cfg.capacity.fuse_neighbors
    _, nbrs = jax.lax.top_k(row, n_fuse)

    def match_pair(src, dst, ok_pair):
        """Project src keyframe's tracked points into dst's frame; return
        per-dst-slot merge/add proposals (no state mutation — all four
        pairs are matched against the SAME pre-fuse state so the expensive
        [K, N] reference-remap gather is applied once, not four times;
        measured 4x2.9 ms -> 1x on a v5e)."""
        src_pt = m.kf_pt_idx[src]
        src_ok = (src_pt >= 0) & ok_pair & \
            m.pt_valid[jnp.clip(src_pt, 0, None)]
        pts_w = m.pt_xyz[jnp.clip(src_pt, 0, None)]
        dst_feats = FrameFeatures(
            uv=m.kf_kp_uv[dst], response=jnp.ones_like(m.kf_kp_angle[dst]),
            level=m.kf_kp_level[dst], angle=m.kf_kp_angle[dst],
            desc_packed=jnp.zeros((m.kf_kp_uv.shape[1], 8), jnp.uint32),
            desc_pm1=m.kf_desc_pm1[dst], valid=m.kf_kp_valid[dst],
            depth=m.kf_kp_depth[dst], uright=m.kf_kp_uright[dst])
        radius = 3.0 * s ** m.kf_kp_level[src].astype(jnp.float32)
        res = fm.match_points_to_frame(
            pts_w, m.kf_desc_pm1[src], src_ok,
            m.kf_kp_angle[src], m.kf_kp_level[src],
            radius, m.kf_kp_level[src] - 1,
            m.kf_kp_level[src] + 1, dst_feats, m.kf_pose[dst],
            cam=cam, width=W, height=H, th=cfg.matcher.th_low,
            check_rotation=False)
        # res.target_idx: per dst-kp slot -> index into src's kp slots
        src_slot = res.target_idx
        has = src_slot >= 0
        pt_new = src_pt[jnp.clip(src_slot, 0, None)]        # fused-in id
        pt_old = m.kf_pt_idx[dst]                           # existing id
        both = has & (pt_old >= 0) & (pt_new != pt_old) & \
            m.pt_valid[jnp.clip(pt_old, 0, None)]
        # keep the better-observed point
        keep_new = obs_count[jnp.clip(pt_new, 0, None)] >= \
            obs_count[jnp.clip(pt_old, 0, None)]
        winner = jnp.where(both, jnp.where(keep_new, pt_new, pt_old), -1)
        loser = jnp.where(both, jnp.where(keep_new, pt_old, pt_new), -1)
        # add missing observations (projection matched an orphan keypoint)
        add = has & (pt_old < 0)
        return winner, loser, jnp.where(add, pt_new, -1)

    ok_nb = (covis[kf_slot, nbrs] > 15) & m.kf_valid[nbrs] & \
        (nbrs != kf_slot)
    kf_rep = jnp.full((n_fuse,), kf_slot, dtype=nbrs.dtype)
    srcs = jnp.concatenate([kf_rep, nbrs])
    dsts = jnp.concatenate([nbrs, kf_rep])
    oks = jnp.concatenate([ok_nb, ok_nb])
    winners, losers, add_pts = jax.vmap(match_pair)(srcs, dsts, oks)

    # compose the 2n loser->winner redirects on a [P+1] table, then
    # apply ONE full-reference remap (chains resolve because each pair's
    # map enters the composition in sequence order). The fold is a
    # BALANCED TREE — composition is associative, so log2(2n) batched
    # [m, P+1] gathers replace 2n serial [P+1] gathers (the serial chain
    # was ~40 dependent micro-kernels per keyframe)
    P = m.max_pt

    def pair_map(winner, loser):
        r = jnp.arange(P + 1, dtype=jnp.int32).at[
            jnp.where(loser >= 0, loser, P)].set(
            jnp.where(loser >= 0, winner, P), mode="drop")
        return r.at[P].set(P)

    R = jax.vmap(pair_map)(winners, losers)            # [2n, P+1]
    while R.shape[0] > 1:
        if R.shape[0] % 2:
            R = jnp.concatenate(
                [R, jnp.arange(P + 1, dtype=jnp.int32)[None]], axis=0)
        # sequence order: later map applied AFTER earlier -> a[b[i]]
        R = jax.vmap(lambda later, earlier: later[earlier])(
            R[1::2], R[0::2])
    total = R[0]
    # loser invalidation is order-independent: one batched scatter
    all_losers = jnp.where(losers >= 0, losers, P).reshape(-1)
    pt_valid = m.pt_valid.at[all_losers].set(False, mode="drop")[:P]
    kf_pt = jnp.where(m.kf_pt_idx >= 0,
                      total[jnp.clip(m.kf_pt_idx, 0, None)],
                      m.kf_pt_idx)
    # row-local observation additions (remapped through the composition)
    for k in range(2 * n_fuse):
        add_pt, dst = add_pts[k], dsts[k]
        row = kf_pt[dst]
        new = total[jnp.clip(add_pt, 0, None)]
        row = jnp.where((add_pt >= 0) & (row < 0), new, row)
        kf_pt = kf_pt.at[dst].set(row)
    m = m._replace(kf_pt_idx=kf_pt, pt_valid=pt_valid)
    # indicator upkeep without the full-table rebuild: loser->winner
    # column merges mirror the entry remap applied to every row above;
    # the observation ADDS touched only the window rows, which are
    # rebuilt exactly from their final kf_pt_idx content
    from eao_fusion_tpu.mapping.map_state import (merge_obs_columns,
                                                  refresh_obs_rows)
    m = merge_obs_columns(m, total[:P])
    return refresh_obs_rows(m, jnp.concatenate([kf_slot[None], nbrs]))


def cull_keyframes(m: MapState, cur_kf: jax.Array,
                   redundancy: float = 0.9, max_cull: int = 3) -> MapState:
    """KeyFrame culling (`LocalMapping::KeyFrameCulling`,
    `src/LocalMapping.cc:636-706`): a covisible keyframe is removed when
    >= 90% of its tracked points are observed by at least 3 other
    keyframes. The reference's same-or-finer-scale condition is
    approximated by the raw observation count; keyframe 0 and the two most
    recent keyframes are protected. Up to `max_cull` victims are removed
    per call (most-redundant first), recomputing redundancy between
    victims — each removal lowers other keyframes' redundant-point counts,
    so a one-shot mask would over-cull (the reference's sequential loop
    sees the same effect through the erased observations)."""

    def round_(_, m):
        Z = covisibility.observation_indicator(m)
        covis = covisibility.covisibility_counts(Z)
        obs_count = jnp.sum(Z, axis=0)                   # [P]

        # tracked/redundant counts as Z-matvecs (a [K, N] gather from the
        # point table costs ~2.5 ms on TPU; the matmul is free) — counts
        # unique points per keyframe, matching the reference's per-
        # MapPoint loop semantics
        pv = m.pt_valid.astype(jnp.float32)
        red = (m.pt_valid & (obs_count >= 4.0)).astype(jnp.float32)
        counts = Z @ jnp.stack([pv, red], axis=-1)       # [K, 2]
        n_tracked = counts[:, 0]
        n_red = counts[:, 1]
        ratio = n_red / jnp.maximum(n_tracked, 1.0)

        local = covis[cur_kf] >= 15
        # keyframes created for a new object are never culled — they are
        # the only observers anchoring the young object's points
        # (`mbCreatedByObjs` guard, `src/LocalMapping.cc:650`)
        cand = (m.kf_valid & local & (ratio > redundancy) & (n_tracked > 20)
                & (~m.kf_by_obj)
                & (jnp.arange(m.max_kf) != 0)
                & (jnp.arange(m.max_kf) < m.next_kf - 2))
        victim = jnp.argmax(jnp.where(cand, ratio, -1.0))
        do_cull = jnp.any(cand)
        return m._replace(kf_valid=m.kf_valid.at[victim].set(
            m.kf_valid[victim] & (~do_cull)))

    return jax.lax.fori_loop(0, max_cull, round_, m)


def cull_points(m: MapState, cur_kf: jax.Array,
                min_obs: int = 2) -> MapState:
    """MapPointCulling (`src/LocalMapping.cc:174-209`). The reference only
    tests points still in `mlpRecentAddedMapPoints` — a point that survives
    3 keyframes graduates and is never re-tested. Applying the obs rule
    to ALL points retro-culls graduated landmarks whenever keyframe culling
    or outlier removal drops their count, which strip-mines the map's
    reserve during rotation-heavy motion (measured on the spin15 loop
    scenario: 491 -> 181 valid points in 4 keyframes).

    `min_obs` is the surviving DISTINCT-keyframe observation count. The
    reference's gate is `Observations() <= 3` where an RGBD/stereo
    observation counts DOUBLE (`nObs += 2`, `src/MapPoint.cc:106`) — so
    an RGBD point seen by just 2 keyframes has nObs=4 and survives:
    min_obs=2. A monocular point needs 3 distinct keyframes (nObs += 1,
    cnThObs=2 in mono mode): min_obs=3. Requiring 3 distinct keyframes
    of RGBD points was the round-4 natural-cadence churn: on revisit
    laps it culled ~97% of lifetime point insertions, starving
    tracked_close and locking NeedNewKeyFrame into a need_close ->
    create -> cull loop (1 KF / 2.4 frames)."""
    Z = covisibility.observation_indicator(m)
    obs = jnp.sum(Z, axis=0)                                # [P]
    age = cur_kf - m.pt_ref_kf
    recent = (m.pt_ref_kf >= 0) & (age >= 0) & (age <= 3)
    ratio_bad = recent & (m.pt_visible >= 4) & \
        (m.pt_found.astype(jnp.float32)
         < 0.25 * m.pt_visible.astype(jnp.float32))
    young_weak = recent & (age >= 2) & (obs < min_obs)
    # points with zero observations are dead regardless of age
    orphan = obs < 1
    cull = m.pt_valid & (ratio_bad | young_weak | orphan)
    return m._replace(pt_valid=m.pt_valid & (~cull))


def _select_window(m: MapState, kf_slot: jax.Array, n_local: int,
                   n_fixed: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (kf_idx [C], sel_valid [C], fixed [C]) with local KFs first."""
    Z = covisibility.observation_indicator(m)
    covis = covisibility.covisibility_counts(Z)
    row = covis[kf_slot].at[kf_slot].set(1e9)      # self always first
    row = jnp.where(m.kf_valid, row, -1.0)
    loc_val, loc_idx = jax.lax.top_k(row, n_local)
    local_ok = loc_val > 0.0

    local_mask = jnp.zeros((m.max_kf,), bool).at[
        jnp.where(local_ok, loc_idx, m.max_kf)].set(True, mode="drop")
    local_pts = covisibility.points_of_keyframes(Z, local_mask)
    votes = Z @ local_pts.astype(jnp.float32)
    votes = jnp.where(m.kf_valid & (~local_mask), votes, -1.0)
    fix_val, fix_idx = jax.lax.top_k(votes, n_fixed)
    fixed_ok = fix_val > 0.0

    kf_idx = jnp.concatenate([loc_idx, fix_idx])
    sel_valid = jnp.concatenate([local_ok, fixed_ok])
    fixed = jnp.concatenate([jnp.zeros((n_local,), bool),
                             jnp.ones((n_fixed,), bool)])
    # gauge anchoring: if no frontier keyframe was found (early map), fix
    # the oldest selected local keyframe
    no_fix = ~jnp.any(fixed_ok)
    oldest = jnp.argmin(jnp.where(local_ok, kf_idx[:n_local], 1 << 30))
    fixed = fixed.at[oldest].set(fixed[oldest] | no_fix)
    # also always fix keyframe slot 0 if selected (world anchor)
    fixed = fixed | (kf_idx == 0)
    return kf_idx, sel_valid, fixed, local_pts


@functools.partial(jax.jit, static_argnames=("cfg",))
def local_mapping_step(m: MapState, kf_slot: jax.Array, *,
                       cfg: SystemConfig) -> MapState:
    cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            cfg.camera.bf)
    m = cull_points(m, kf_slot,
                    min_obs=3 if cfg.sensor == "mono" else 2)
    m = fuse_neighbors(m, kf_slot, cfg=cfg)

    n_fixed = 8
    n_local = cfg.capacity.max_local_ba_kfs - n_fixed
    kf_idx, sel_valid, fixed, local_pts = _select_window(
        m, kf_slot, n_local, n_fixed)

    # ---- window compaction (on-device): local BA runs on a compact
    # [Pw] point table and a compact [E] edge list instead of the full
    # [P] table / dense [C, N] slots — ~4x fewer scatter rows, ~16x
    # smaller Schur scatter targets (the round-1 274 ms/KF hotspot) ----
    N = m.kf_pt_idx.shape[1]
    C = kf_idx.shape[0]
    Pw = min(cfg.capacity.max_local_ba_points, m.max_pt)
    E = min(cfg.capacity.max_local_ba_obs, C * N)
    sel = m.pt_valid & local_pts                              # [P]
    widx = jnp.argsort(~sel, stable=True)[:Pw]                # [Pw]
    wvalid = sel[widx]
    lut = jnp.full((m.max_pt,), -1, jnp.int32).at[
        jnp.where(wvalid, widx, m.max_pt)].set(
        jnp.arange(Pw, dtype=jnp.int32), mode="drop")

    obs_pt_dense = m.kf_pt_idx[kf_idx]                        # [C, N]
    pid_w = lut[jnp.clip(obs_pt_dense, 0, None)]
    obs_ok = (m.kf_kp_valid[kf_idx] & (obs_pt_dense >= 0) & (pid_w >= 0)
              & (sel_valid & m.kf_valid[kf_idx])[:, None])
    flat_ok = obs_ok.reshape(-1)
    eidx = jnp.argsort(~flat_ok, stable=True)[:E]             # [E]
    e_ok = flat_ok[eidx]
    e_cam = (eidx // N).astype(jnp.int32)
    e_slot = (eidx % N).astype(jnp.int32)
    lvl = m.kf_kp_level[kf_idx].reshape(-1)[eidx].astype(jnp.float32)
    # freeze under-constrained window cameras (SolverConfig.min_cam_obs):
    # a pose held by 2-3 reprojections slides freely while lowering chi2
    n_obs_cam = jnp.sum(obs_ok, axis=1)
    starved = n_obs_cam < cfg.solver.min_cam_obs
    prob = ba.BACooProblem(
        cam_pose=m.kf_pose[kf_idx],
        cam_valid=sel_valid & m.kf_valid[kf_idx],
        cam_fixed=fixed | starved,
        pt_xyz=m.pt_xyz[widx],
        pt_valid=wvalid,
        obs_cam=e_cam,
        obs_pt=jnp.where(e_ok, pid_w.reshape(-1)[eidx], -1),
        obs_uv=m.kf_kp_uv[kf_idx].reshape(-1, 2)[eidx],
        obs_ur=m.kf_kp_uright[kf_idx].reshape(-1)[eidx],
        obs_inv_sigma2=cfg.orb.scale_factor ** (-2.0 * lvl),
        obs_valid=e_ok,
    )
    plane_block = None
    if cfg.use_planes:
        # plane factors in local BA (the reference's #ifdef USE_LOCAL_PLANE
        # block, `src/Optimizer.cc:709-1129`, here actually enabled)
        pl_idx = m.kf_pl_idx[kf_idx]
        pl_ok = (pl_idx >= 0) & m.pl_valid[jnp.clip(pl_idx, 0, None)] \
            & sel_valid[:, None]
        plane_block = (m.pl_coeff[jnp.clip(pl_idx, 0, None)],
                       m.kf_pl_coeff[kf_idx], pl_ok)
    res = ba.bundle_adjust_coo(prob, plane_block, cam=cam5, cfg=cfg.solver,
                               n_iters1=cfg.solver.local_ba_iters_first,
                               n_iters2=cfg.solver.local_ba_iters_second,
                               ftol=cfg.solver.local_ba_ftol)

    # scatter optimized poses back (only updated, valid, non-fixed slots)
    upd = sel_valid & (~fixed)
    tgt = jnp.where(upd, kf_idx, m.max_kf)
    pt_tgt = jnp.where(wvalid, widx, m.max_pt)
    m = m._replace(
        kf_pose=m.kf_pose.at[tgt].set(res.cam_pose, mode="drop"),
        pt_xyz=m.pt_xyz.at[pt_tgt].set(res.pt_xyz, mode="drop"))

    # remove outlier observations from the window keyframes
    clear = e_ok & (~res.obs_inlier)
    tgt_r = jnp.where(clear, kf_idx[e_cam], m.max_kf)
    m = m._replace(kf_pt_idx=m.kf_pt_idx.at[tgt_r, e_slot].set(
        -1, mode="drop"))

    from eao_fusion_tpu.mapping.map_state import refresh_obs_rows
    m = refresh_obs_rows(m, kf_idx)   # outlier removal edited window rows
    m = cull_keyframes(m, kf_slot)
    m = update_point_stats(m)         # MXU form — cheap every keyframe
    # the full-table descriptor majority vote is a [K*N, 256] scatter-add —
    # amortize it (every 4th keyframe); the votes drift slowly
    m = jax.lax.cond(kf_slot % 4 == 0, refresh_point_descriptors,
                     lambda mm: mm, m)
    return m


def refresh_point_descriptors(m: MapState) -> MapState:
    """Hamming-space centroid: per-bit majority vote over all keyframe
    observations of each point (replaces medoid selection,
    `src/MapPoint.cc:217-297`)."""
    K, N = m.kf_pt_idx.shape
    pt = m.kf_pt_idx.reshape(-1)
    ok = (pt >= 0) & m.kf_valid.repeat(N)
    tgt = jnp.where(ok, pt, m.max_pt)
    votes = jnp.zeros((m.max_pt + 1, 256), jnp.float32).at[tgt].add(
        m.kf_desc_pm1.reshape(-1, 256).astype(jnp.float32)
        * ok[:, None].astype(jnp.float32))[:m.max_pt]
    have = jnp.any(votes != 0.0, axis=-1)
    desc = jnp.where(votes > 0, jnp.int8(1), jnp.int8(-1))
    # zero-vote bits tie-break toward the existing descriptor
    desc = jnp.where(votes == 0, m.pt_desc_pm1, desc)
    return m._replace(pt_desc_pm1=jnp.where(
        (m.pt_valid & have)[:, None], desc, m.pt_desc_pm1))
