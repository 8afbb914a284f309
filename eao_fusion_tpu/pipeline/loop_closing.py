"""Loop closing: BoW detection with covisibility-consistency, Sim3
computation, loop correction (pose propagation + point fusion), essential-
graph optimization, and global BA.

Re-design of `src/LoopClosing.cc` + `src/KeyFrameDatabase.cc` (SURVEY.md
§3.4): the inverted-index retrieval becomes dense L1 scoring of the query
bow vector against the keyframe bow matrix (one [K, W] pass on the VPU);
the covisibility-consistency bookkeeping (3 consecutive detections) stays
on host (a few scalars per keyframe); Sim3 RANSAC is batched (ops/ransac);
the corrections are batched pytree updates.

Deliberate improvement over the reference: after loop correction, OBJECT
landmark centroids follow automatically because object members reference
map-point ids (the reference never corrects objects on loop closure —
SURVEY.md §3.4 notes this gap)."""

from __future__ import annotations

import functools
from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.frontend import matcher
from eao_fusion_tpu.mapping import covisibility, vocabulary
from eao_fusion_tpu.mapping.map_state import MapState
from eao_fusion_tpu.ops import lie, ransac
from eao_fusion_tpu.solvers import ba, pose_graph


class LoopCloser:
    """Host orchestrator; owns the bow matrix and consistency state."""

    def __init__(self, cfg: SystemConfig, vocab: vocabulary.Vocabulary):
        self.cfg = cfg
        self.vocab = vocab
        K = cfg.capacity.max_keyframes
        self.bow = jnp.zeros((K, vocab.n_words), jnp.float32)
        # consistency groups: list of (set_of_kf_slots, count)
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -10 ** 9
        # loop edges of accepted closures, kept for later essential graphs
        # (`KeyFrame::GetLoopEdges`, `src/Optimizer.cc:1287-1311`)
        self.loop_edges: List[Tuple[int, int]] = []
        self._detect_jit = None
        self._onkf_jit = None
        self._onkf_batch_jit = {}   # n_slots -> jitted batch detect
        self._sim3_jit = None
        self.stats: dict = {}   # cumulative per-phase wall time / counts
        # asynchronous GBA state (see the "async GBA" section below)
        self._gba_thread = None
        self._gba_abort = None
        self._gba_out = None
        self._gba_snap = None
        self._gba_pt_map = None

    # ------------------------------------------------------------ remap
    def apply_kf_remap(self, remap: np.ndarray) -> None:
        """Keyframe-slot compaction support (map_state.compact_keyframes):
        move bow rows to their new slots and remap/drop slot references in
        the consistency state. remap[k] = new slot of old slot k, -1 if the
        keyframe was culled/evicted."""
        K = self.bow.shape[0]
        tgt = jnp.asarray(np.where(remap >= 0, remap, K))
        self.bow = jnp.zeros_like(self.bow).at[tgt].set(
            self.bow, mode="drop")
        self.loop_edges = [(int(remap[a]), int(remap[b]))
                           for a, b in self.loop_edges
                           if remap[a] >= 0 and remap[b] >= 0]
        new_groups = []
        for grp, cnt in self.consistent_groups:
            g2 = {int(remap[x]) for x in grp if remap[x] >= 0}
            if g2:
                new_groups.append((g2, cnt))
        self.consistent_groups = new_groups
        if self.last_loop_kf >= 0:
            r = int(remap[self.last_loop_kf])
            if r < 0:
                # nearest earlier surviving keyframe keeps the "no loops
                # right after a loop" gate approximately in force
                earlier = remap[:self.last_loop_kf + 1]
                r = int(earlier.max()) if (earlier >= 0).any() else -10**9
            self.last_loop_kf = r

    # ---------------------------------------------------------------- bow
    def add_keyframe_bow(self, m: MapState, slot: int) -> None:
        v = vocabulary.bow_vector(self.vocab,
                                  m.kf_desc_pm1[slot], m.kf_kp_valid[slot])
        self.bow = self.bow.at[slot].set(v)

    # ------------------------------------------------------------- detect
    def detect(self, m: MapState, slot: int, debug: bool = False) -> int:
        """Returns a loop-candidate keyframe slot or -1. Implements
        `KeyFrameDatabase::DetectLoopCandidates` gating + LoopClosing's
        3-consecutive-group consistency (`src/LoopClosing.cc:103-229`).
        Device math (covisibility product + BoW scores) runs as one
        dispatch in `_detect_device`; this method is the host-side gating
        on the pulled statistics."""
        scores_d, covis_d = self._detect_device(m, jnp.int32(slot),
                                                self.bow)
        scores, covis, kf_valid = jax.device_get(
            (scores_d, covis_d, m.kf_valid))
        return self._detect_from_stats(slot, scores, covis, kf_valid,
                                       debug=debug)

    def _detect_device(self, m: MapState, slot, bow):
        if self._detect_jit is None:
            def _dev(m, slot, bow):
                Z = covisibility.observation_indicator(m)
                covis = covisibility.covisibility_counts(Z)
                scores = vocabulary.l1_scores(bow[slot], bow, m.kf_valid)
                return scores, covis
            self._detect_jit = jax.jit(_dev)
        return self._detect_jit(m, slot, bow)

    def _detect_from_stats(self, slot: int, scores: np.ndarray,
                           covis: np.ndarray, kf_valid: np.ndarray,
                           debug: bool = False) -> int:
        cfg = self.cfg.loop
        if slot < 10 or slot - self.last_loop_kf < 10:
            return -1
        covis_row = covis[slot]
        connected = covis_row >= 15
        connected[slot] = True

        # minScore over connected neighbors (`src/LoopClosing.cc:124-138`)
        neigh = connected.copy()
        neigh[slot] = False
        if not neigh.any():
            return -1
        min_score = float(scores[neigh & kf_valid].min()) \
            if (neigh & kf_valid).any() else 0.0

        cand_mask = kf_valid & (~connected) & (scores >= max(min_score, 1e-6))
        cand_mask[max(0, slot - 10):] = False   # skip very recent keyframes
        cand = np.where(cand_mask)[0]
        if debug:
            old = kf_valid.copy()
            old[max(0, slot - 10):] = False
            old &= ~connected
            top = scores[old].max() if old.any() else 0.0
            print(f"[loop] kf{slot}: n_conn={int(connected.sum())} "
                  f"min_score={min_score:.4f} best_old={top:.4f} "
                  f"n_cand={len(cand)} groups={[(g[1] if isinstance(g, tuple) else 0) for g in self.consistent_groups][:6]}",
                  flush=True)
        if len(cand) == 0:
            self.consistent_groups = []
            return -1

        # accumulate scores over covisibility groups; retain >= 0.75 best
        covis_np = covis
        groups = []
        for c in cand:
            grp = set(np.where(covis_np[c] >= 15)[0].tolist()) | {int(c)}
            acc = scores[list(grp)].sum()
            groups.append((int(c), grp, float(acc)))
        best_acc = max(g[2] for g in groups)
        groups = [g for g in groups if g[2] >= cfg.acc_score_retain * best_acc]

        # consistency with previous keyframes' groups
        new_groups: List[Tuple[Set[int], int]] = []
        enough: List[int] = []
        for c, grp, _ in groups:
            count = 0
            for prev_grp, prev_cnt in self.consistent_groups:
                if grp & prev_grp:
                    count = max(count, prev_cnt + 1)
            new_groups.append((grp, count))
            if count >= cfg.covisibility_consistency_th:
                enough.append(c)
        self.consistent_groups = new_groups
        return int(enough[0]) if enough else -1

    # ------------------------------------------------------- compute sim3
    def compute_sim3(self, m: MapState, cur: int, cand: int, key,
                     debug: bool = False) -> Optional[jax.Array]:
        """Returns S (sim3 [8]) with pb(cur cam) ≈ S pa(cand cam), or None.
        (`LoopClosing::ComputeSim3`, `src/LoopClosing.cc:231-420`.)
        ONE fused device dispatch (mutual match + pair selection + RANSAC
        + Sim3 GN) and one small pull — the pair set is a fixed 512-slot
        masked table, so nothing retraces across candidates (a dynamic
        pair count recompiled ransac/refine per attempt, ~10 s each on a
        tunneled TPU, and the multi-dispatch structure cost ~300 ms per
        attempt; revisit laps attempt dozens of candidates per closure)."""
        cfg = self.cfg
        if self._sim3_jit is None:
            n_pair_pad = 512

            def _sim3(m, cur, cand, key):
                mm = matcher.mutual_match(
                    m.kf_desc_pm1[cand], m.kf_kp_valid[cand],
                    m.kf_kp_angle[cand],
                    m.kf_desc_pm1[cur], m.kf_kp_valid[cur],
                    m.kf_kp_angle[cur],
                    th=cfg.matcher.th_low, use_ratio=True,
                    check_rotation=True)
                tgt = mm.target_idx                       # [N]
                pt_a = m.kf_pt_idx[cand]
                pt_b = m.kf_pt_idx[cur][jnp.clip(tgt, 0, None)]
                ok = (tgt >= 0) & (pt_a >= 0) & (pt_b >= 0)
                # valid pairs first, BEST (lowest Hamming distance) matches
                # leading — so when >512 valid pairs exist, the truncated
                # window keeps the highest-quality correspondences rather
                # than an arbitrary keypoint-slot prefix (the reference
                # feeds ALL matched pairs to its Sim3 RANSAC,
                # `src/Sim3Solver.cc:39-80`)
                order = jnp.argsort(jnp.where(ok, mm.dist, jnp.inf))
                sel = order[:n_pair_pad]
                valid = ok[sel]
                ia = jnp.where(valid, pt_a[sel], 0)
                ib = jnp.where(valid, pt_b[sel], 0)
                pa_c = lie.se3_apply(m.kf_pose[cand], m.pt_xyz[ia])
                pb_c = lie.se3_apply(m.kf_pose[cur], m.pt_xyz[ib])
                res = ransac.ransac_align(
                    pa_c, pb_c, valid, key,
                    with_scale=not cfg.loop.fix_scale_rgbd, inlier_th=0.10)
                g = pose_graph.sim3_refine(
                    pa_c, pb_c, res.inliers.astype(jnp.float32),
                    res.transform, fix_scale=cfg.loop.fix_scale_rgbd)
                return g, res.n_inliers, jnp.sum(valid.astype(jnp.int32))
            self._sim3_jit = jax.jit(_sim3)
        g, n_inl, n_pairs = self._sim3_jit(m, jnp.int32(cur),
                                           jnp.int32(cand), key)
        n_inl, n_pairs = jax.device_get((n_inl, n_pairs))
        if debug:
            print(f"[loop]   sim3 {cand}->{cur}: n_pairs={int(n_pairs)} "
                  f"(need {cfg.loop.min_sim3_matches}), ransac inliers="
                  f"{int(n_inl)} (need {cfg.loop.sim3_min_inliers})",
                  flush=True)
        if int(n_pairs) < cfg.loop.min_sim3_matches:
            return None
        if int(n_inl) < cfg.loop.sim3_min_inliers:
            return None
        return g

    # ------------------------------------------------------- correct loop
    def correct(self, m: MapState, cur: int, cand: int, s_cur_cand: jax.Array
                ) -> MapState:
        """Propagate the corrected pose through the covisible window, fuse,
        run the essential graph, then global BA
        (`LoopClosing::CorrectLoop`, `src/LoopClosing.cc:422-660`)."""
        cfg = self.cfg
        K = m.max_kf

        # corrected current pose: Tcw_corr = S_cur_cand ∘ Tcw_cand
        t_cand = lie.sim3_from_se3(m.kf_pose[cand])
        scw_corr = lie.sim3_compose(s_cur_cand, t_cand)
        tcw_corr = lie.sim3_to_se3(scw_corr)

        # world-side correction for the current component:
        # p' = Tcw_corr⁻¹ ∘ Tcw_old (p);  T_iw' = T_iw ∘ C⁻¹
        C = lie.se3_compose(lie.se3_inverse(tcw_corr), m.kf_pose[cur])
        C_inv = lie.se3_inverse(C)

        Z = covisibility.observation_indicator(m)
        covis = covisibility.covisibility_counts(Z)
        window = covisibility.top_covisible(covis, cur, m.kf_valid, 30)
        window = window.at[cur].set(True)
        win_pts = covisibility.points_of_keyframes(Z, window) & m.pt_valid

        old_poses = m.kf_pose
        new_poses = jnp.where(window[:, None],
                              jax.vmap(lie.se3_compose)(
                                  m.kf_pose,
                                  jnp.broadcast_to(C_inv, (K, 7))),
                              m.kf_pose)
        new_pts = jnp.where(win_pts[:, None], lie.se3_apply(C, m.pt_xyz),
                            m.pt_xyz)
        m = m._replace(kf_pose=new_poses, pt_xyz=new_pts)

        # plane landmarks anchored in the corrected window move with it
        # (the reference leaves this to GBA's free plane vertices; moving
        # them here keeps plane factors consistent during the essential
        # graph too)
        if cfg.use_planes:
            from eao_fusion_tpu.mapping import plane_map
            win_pl = (m.pl_valid & window[jnp.clip(m.pl_ref_kf, 0, K - 1)]
                      & (m.pl_ref_kf >= 0))
            m = m._replace(
                pl_coeff=jnp.where(win_pl[:, None],
                                   plane_map.transform_planes(m.pl_coeff, C),
                                   m.pl_coeff),
                pl_boundary=jnp.where(win_pl[:, None, None],
                                      lie.se3_apply(C, m.pl_boundary),
                                      m.pl_boundary))

        # ---- fuse duplicated landmarks across the loop ------------------
        covis_before = np.asarray(covis)
        m = self._fuse_loop_points(m, cur, cand)
        if cfg.use_planes:
            m = self._fuse_loop_planes(m, cur, cand, window)

        # new connections created by the fusion: window KFs now strongly
        # covisible with out-of-window KFs (the reference's LoopConnections,
        # `src/LoopClosing.cc:540-560`) — these edges get corrected
        # measurements in the essential graph
        covis_after = np.asarray(covisibility.covisibility_counts(
            covisibility.observation_indicator(m)))
        win_np = np.asarray(window)
        new_strong = ((covis_after >= 100) & win_np[:, None]
                      & (~win_np)[None, :] & (covis_before < 15))
        loop_pairs = [(int(j), int(i))               # (older, newer)
                      for i, j in np.argwhere(new_strong) if j < i]

        # ---- essential graph -------------------------------------------
        m = self._essential_graph(m, cur, cand, old_poses, window,
                                  loop_pairs)

        # ---- global BA (`RunGlobalBundleAdjustment`) --------------------
        if self.cfg.loop.async_gba:
            # off the critical path: the frame stream continues on the
            # post-essential-graph map; poll_gba merges the result later
            self.launch_gba_async(m)
        else:
            m = self._global_ba(m)
        self.last_loop_kf = cur
        self.consistent_groups = []
        return m

    def _fuse_loop_points(self, m: MapState, cur: int, cand: int
                          ) -> MapState:
        """SearchAndFuse (`src/LoopClosing.cc:604-654`): project the loop
        side's map points into the corrected current keyframe; projections
        that land on keypoints already holding a map point merge the two
        ids (loop-side point wins; all references redirected)."""
        cfg = self.cfg
        cam = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
        W, H = cfg.camera.width, cfg.camera.height
        s = cfg.orb.scale_factor
        Z = covisibility.observation_indicator(m)
        covis = covisibility.covisibility_counts(Z)
        loop_kfs = covisibility.top_covisible(covis, cand, m.kf_valid, 20)
        loop_kfs = loop_kfs.at[cand].set(True)
        loop_pts = covisibility.points_of_keyframes(Z, loop_kfs) & m.pt_valid

        from eao_fusion_tpu.types import FrameFeatures
        cur_feats = FrameFeatures(
            uv=m.kf_kp_uv[cur], response=jnp.ones_like(m.kf_kp_angle[cur]),
            level=m.kf_kp_level[cur], angle=m.kf_kp_angle[cur],
            desc_packed=jnp.zeros((m.kf_kp_uv.shape[1], 8), jnp.uint32),
            desc_pm1=m.kf_desc_pm1[cur], valid=m.kf_kp_valid[cur],
            depth=m.kf_kp_depth[cur], uright=m.kf_kp_uright[cur])
        radius = jnp.full((m.max_pt,), 4.0 * s)
        lvl = jnp.zeros((m.max_pt,), jnp.int32)
        res = matcher.match_points_to_frame(
            m.pt_xyz, m.pt_desc_pm1, loop_pts, jnp.zeros((m.max_pt,)),
            lvl, radius, lvl, lvl + cfg.orb.n_levels,
            cur_feats, m.kf_pose[cur], cam=cam, width=W, height=H,
            th=cfg.matcher.th_low, check_rotation=False)
        cur_pt = m.kf_pt_idx[cur]
        loop_pt = res.target_idx
        both = ((loop_pt >= 0) & (cur_pt >= 0) & (loop_pt != cur_pt)
                & m.pt_valid[jnp.clip(cur_pt, 0, None)])
        remap = jnp.arange(m.max_pt + 1, dtype=jnp.int32)
        remap = remap.at[jnp.where(both, cur_pt, m.max_pt)].set(
            jnp.where(both, loop_pt, m.max_pt), mode="drop")[:m.max_pt]
        kf_pt = jnp.where(m.kf_pt_idx >= 0,
                          remap[jnp.clip(m.kf_pt_idx, 0, None)],
                          m.kf_pt_idx)
        pt_valid = m.pt_valid.at[jnp.where(both, cur_pt, m.max_pt)].set(
            False, mode="drop")
        m = m._replace(kf_pt_idx=kf_pt, pt_valid=pt_valid)
        from eao_fusion_tpu.mapping.map_state import refresh_obs_ind
        return refresh_obs_ind(m)

    def _fuse_loop_planes(self, m: MapState, cur: int, cand: int,
                          window: jax.Array) -> MapState:
        """Plane fusion across the loop (`Map::SearchMatchedPlanes` +
        `MapPlane::Replace`, `/root/reference/src/Map.cc:245-292`,
        `src/MapPlane.cc:161-192`, called from
        `LoopClosing::SearchAndFuse` :638-652): planes observed by the
        corrected window that now geometrically coincide with a loop-side
        plane are merged into the loop plane; keyframe plane references
        are redirected and the duplicate is invalidated."""
        cfg = self.cfg.planes
        L = m.pl_coeff.shape[0]
        Z = covisibility.observation_indicator(m)
        covis = covisibility.covisibility_counts(Z)
        loop_kfs = covisibility.top_covisible(covis, cand, m.kf_valid, 20)
        loop_kfs = loop_kfs.at[cand].set(True)

        def planes_of(kf_mask):
            tgt = jnp.where(kf_mask[:, None] & (m.kf_pl_idx >= 0),
                            m.kf_pl_idx, L)
            return jnp.zeros((L + 1,), bool).at[tgt.reshape(-1)].set(
                True, mode="drop")[:L] & m.pl_valid

        loop_pl = planes_of(loop_kfs)
        cur_pl = planes_of(window) & (~loop_pl)

        # gates as in AssociatePlanesByBoundary: |cos| > angle_th and min
        # distance of the loop plane's boundary to the current plane < dist
        dots = jnp.abs(m.pl_coeff[:, :3] @ m.pl_coeff[:, :3].T)   # [L, L]
        dist = jnp.abs(
            jnp.einsum("lbi,pi->plb", m.pl_boundary, m.pl_coeff[:, :3])
            + m.pl_coeff[:, None, None, 3])                       # [Lc,Ll,B]
        dist = jnp.where(m.pl_boundary_valid[None, :, :], dist, 1e9)
        min_dist = jnp.min(dist, axis=2)                          # [Lc, Ll]
        ok = ((dots > cfg.assoc_angle_cos) & (min_dist < cfg.assoc_dist)
              & cur_pl[:, None] & loop_pl[None, :])
        score = jnp.where(ok, min_dist, 1e9)
        best = jnp.argmin(score, axis=1).astype(jnp.int32)
        fuse = jnp.min(score, axis=1) < 1e8                       # [Lc]

        # redirect keyframe plane observations: cur plane -> loop plane
        remap = jnp.arange(L, dtype=jnp.int32)
        remap = jnp.where(fuse, best, remap)
        kf_pl = jnp.where(m.kf_pl_idx >= 0,
                          remap[jnp.clip(m.kf_pl_idx, 0, None)],
                          m.kf_pl_idx)
        pl_valid = m.pl_valid & (~fuse)
        # the surviving plane absorbs the duplicate's observation count
        absorbed = jnp.zeros((L,), jnp.int32).at[
            jnp.where(fuse, best, 0)].add(
            jnp.where(fuse, m.pl_obs_count, 0))
        return m._replace(kf_pl_idx=kf_pl, pl_valid=pl_valid,
                          pl_obs_count=m.pl_obs_count + absorbed)

    def _essential_graph(self, m: MapState, cur: int, cand: int,
                         old_poses: jax.Array, corrected: jax.Array,
                         loop_pairs=None) -> MapState:
        """Sim3 pose graph over the REAL essential-graph structure
        (`Optimizer::OptimizeEssentialGraph`, `src/Optimizer.cc:1141-1435`):
        spanning tree (parent = most covisible earlier keyframe) + strong
        covisibility edges (weight >= minFeat=100) + the new loop
        connections + loop edges of previous closures. Edge construction is
        vectorized (no O(K^2) host loop) and survives keyframe culling —
        parents are recomputed from the covisibility counts, not slot order.
        """
        cfg = self.cfg
        K = m.max_kf
        Z = covisibility.observation_indicator(m)
        covis = np.asarray(covisibility.covisibility_counts(Z))
        kf_valid = np.asarray(m.kf_valid)
        n_kf = int(np.asarray(m.next_kf))
        min_feat = 100

        # ---- spanning tree: parent(i) = most covisible valid j < i -------
        idx = np.arange(K)
        earlier = (idx[None, :] < idx[:, None]) & kf_valid[None, :] \
            & kf_valid[:, None]
        w_tree = np.where(earlier, covis, -1)
        parent = w_tree.argmax(axis=1)
        has_parent = (w_tree.max(axis=1) > 0) & kf_valid & (idx > 0)
        # keyframes orphaned by culling chain to the nearest earlier valid
        orphan = kf_valid & (idx > 0) & (~has_parent)
        if orphan.any():
            prev_valid = np.where(kf_valid, idx, -1)
            nearest = np.maximum.accumulate(
                np.concatenate([[-1], prev_valid[:-1]]))
            parent = np.where(orphan & (nearest >= 0), nearest, parent)
            has_parent = has_parent | (orphan & (nearest >= 0))
        tree_i = parent[has_parent]
        tree_j = idx[has_parent]

        # ---- strong covisibility edges (upper triangle, skip tree) -------
        strong = (covis >= min_feat) & kf_valid[:, None] & kf_valid[None, :]
        strong &= idx[None, :] > idx[:, None]          # i < j once
        strong[parent[has_parent], idx[has_parent]] = False
        strong[idx[has_parent], parent[has_parent]] = False
        cov_i, cov_j = np.nonzero(strong)

        # ---- loop connections (corrected measurements) --------------------
        # these take precedence: duplicate tree/covis edges are dropped so
        # the loop constraints always carry corrected measurements
        lp = [(int(cand), int(cur))]
        if loop_pairs is not None:
            lp += [(int(a), int(b)) for a, b in loop_pairs
                   if (int(a), int(b)) != (int(cand), int(cur))]
        lp_set = {(min(p), max(p)) for p in lp}

        def drop_dups(a, b):
            keep = np.array([(min(x, y), max(x, y)) not in lp_set
                             for x, y in zip(a.tolist(), b.tolist())], bool)
            return a[keep], b[keep]

        tree_i, tree_j = drop_dups(tree_i, tree_j)
        cov_i, cov_j = drop_dups(cov_i, cov_j)
        # previous closures' loop edges (non-corrected measurements)
        seen = set(map(tuple, zip(cov_i.tolist(), cov_j.tolist()))) | \
            set(map(tuple, zip(tree_i.tolist(), tree_j.tolist()))) | lp_set
        prev_lp = [(a, b) for a, b in self.loop_edges
                   if kf_valid[a] and kf_valid[b]
                   and (min(a, b), max(a, b)) not in seen]

        ei = np.concatenate([tree_i, cov_i,
                             np.array([p[0] for p in prev_lp + lp], np.int64)
                             ]).astype(np.int32)
        ej = np.concatenate([tree_j, cov_j,
                             np.array([p[1] for p in prev_lp + lp], np.int64)
                             ]).astype(np.int32)
        wgt = np.ones(len(ei), np.float32)
        wgt[-len(lp):] = 10.0   # new loop connections strongly weighted
        use_new = np.zeros(len(ei), bool)
        use_new[-len(lp):] = True

        # pad to a power-of-two bucket: optimize_pose_graph recompiles per
        # edge-count otherwise (weight 0 disables padded slots)
        E = max(8, 1 << (len(ei) - 1).bit_length())
        pad = E - len(ei)
        ei = np.pad(ei, (0, pad))
        ej = np.pad(ej, (0, pad))
        wgt = np.pad(wgt, (0, pad))
        use_new = np.pad(use_new, (0, pad))

        old_sim = lie.sim3_from_se3(old_poses)
        new_sim = lie.sim3_from_se3(m.kf_pose)
        ei_a = jnp.asarray(ei)
        ej_a = jnp.asarray(ej)
        # Measurements S_ji: pre-existing edges (tree/covisibility/old loop)
        # use the PRE-correction relative poses — the reference's
        # NonCorrectedSim3 (`src/Optimizer.cc:1250-1333`). Corrected poses
        # appear only as vertex initial estimates; this mismatch creates the
        # residuals that distribute the loop correction along the
        # trajectory. Only the new loop connections measure corrected
        # relative poses.
        un = jnp.asarray(use_new)[:, None]
        src = jnp.where(un, new_sim[ei_a], old_sim[ei_a])
        dst = jnp.where(un, new_sim[ej_a], old_sim[ej_a])
        meas = jax.vmap(lambda a, b: lie.sim3_compose(b, lie.sim3_inverse(a))
                        )(src, dst)

        fixed = jnp.zeros((K,), bool).at[cand].set(True).at[0].set(True)
        prob = pose_graph.PoseGraphProblem(
            poses=new_sim, pose_valid=m.kf_valid, fixed=fixed,
            edge_i=ei_a, edge_j=ej_a, edge_meas=meas,
            edge_weight=jnp.asarray(wgt))
        opt = pose_graph.optimize_pose_graph(
            prob, n_iters=cfg.loop.pose_graph_iters,
            fix_scale=cfg.loop.fix_scale_rgbd)
        # remember the new loop edges for later closures
        self.loop_edges.extend(lp)

        # correct map points through their reference keyframe:
        # p' = T_ref_new⁻¹ ∘ T_ref_old (p)   (`src/Optimizer.cc:1380-1410`)
        new_se3 = lie.sim3_to_se3(opt)
        ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
        t_old = m.kf_pose[ref]
        t_new = new_se3[ref]
        moved = lie.se3_apply(jax.vmap(lie.se3_compose)(
            jax.vmap(lie.se3_inverse)(t_new), t_old), m.pt_xyz)
        pts = jnp.where(m.pt_valid[:, None], moved, m.pt_xyz)
        poses = jnp.where(m.kf_valid[:, None], new_se3, m.kf_pose)
        enter_poses = m.kf_pose   # poses as they entered the pose graph
        m = m._replace(kf_pose=poses, pt_xyz=pts)

        # planes follow their reference keyframe too (same map as points:
        # from the pose entering the graph to the optimized pose)
        if self.cfg.use_planes:
            from eao_fusion_tpu.mapping import plane_map
            pref = jnp.clip(m.pl_ref_kf, 0, K - 1)
            T_pl = jax.vmap(lie.se3_compose)(
                jax.vmap(lie.se3_inverse)(new_se3[pref]), enter_poses[pref])
            pl_ok = m.pl_valid & (m.pl_ref_kf >= 0)
            new_coeff = jax.vmap(plane_map.transform_planes)(m.pl_coeff, T_pl)
            new_bnd = jax.vmap(lie.se3_apply)(T_pl, m.pl_boundary)
            m = m._replace(
                pl_coeff=jnp.where(pl_ok[:, None], new_coeff, m.pl_coeff),
                pl_boundary=jnp.where(pl_ok[:, None, None], new_bnd,
                                      m.pl_boundary))
        return m

    # ------------------------------------------------------- global BA
    def _build_gba_problem(self, m: MapState):
        """Problem construction shared by the synchronous and asynchronous
        GBA paths. Returns (prob, plane_free)."""
        cfg = self.cfg
        obs_pt = m.kf_pt_idx
        pt_ok = m.pt_valid[jnp.clip(obs_pt, 0, None)] & (obs_pt >= 0)
        obs_ok = m.kf_kp_valid & pt_ok
        # freeze under-constrained cameras (see SolverConfig.min_cam_obs):
        # their pose stays where the essential graph put it
        starved = jnp.sum(obs_ok, axis=1) < cfg.solver.min_cam_obs
        prob = ba.BAProblem(
            cam_pose=m.kf_pose,
            cam_valid=m.kf_valid,
            cam_fixed=starved.at[0].set(True),
            pt_xyz=m.pt_xyz,
            pt_valid=m.pt_valid,
            obs_pt=obs_pt,
            obs_uv=m.kf_kp_uv,
            obs_ur=m.kf_kp_uright,
            obs_inv_sigma2=cfg.orb.scale_factor ** (
                -2.0 * m.kf_kp_level.astype(jnp.float32)),
            obs_valid=obs_ok)
        plane_free = None
        if cfg.use_planes:
            # GBA plane edges with FREE plane vertices
            # (`src/Optimizer.cc:210-250`: VertexPlane not fixed in GBA)
            pl_idx = m.kf_pl_idx
            pl_ok = (pl_idx >= 0) & m.pl_valid[jnp.clip(pl_idx, 0, None)] \
                & m.kf_valid[:, None]
            plane_free = ba.PlaneFreeBlock(
                pl_coeff=m.pl_coeff, pl_free=m.pl_valid,
                obs_pl=jnp.where(pl_ok, pl_idx, -1),
                obs_meas=m.kf_pl_coeff, obs_valid=pl_ok)
        return prob, plane_free

    def _gba_stage(self, prob, plane_free, n1: int, n2: int):
        """One GBA dispatch of (n1 phase-1 + n2 phase-2) LM iterations —
        routed to the observation-sharded distributed solver when a mesh
        is configured, the single-device Schur solver otherwise."""
        cfg = self.cfg
        cam5 = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
                cfg.camera.bf)
        n_dist = cfg.gba_mesh_devices
        if (n_dist > 1 and len(jax.devices()) >= n_dist
                and prob.pt_xyz.shape[0] % n_dist == 0):
            # observation-sharded distributed GBA over the ``lm`` mesh:
            # per-device compute ~1/n, camera system psum-reduced
            from eao_fusion_tpu.parallel import dist_ba, mesh as mesh_util
            lm_mesh = mesh_util.make_mesh(n_landmark=n_dist)
            return dist_ba.distributed_bundle_adjust(
                prob, lm_mesh, plane_free=plane_free,
                cam=cam5, cfg=cfg.solver, n_iters1=n1, n_iters=n2)
        return ba.bundle_adjust(prob, plane_free=plane_free,
                                cam=cam5, cfg=cfg.solver,
                                n_iters1=n1, n_iters2=n2, pt_chunk=2048)

    def _run_gba_stages(self, prob, plane_free, abort=None):
        """Run the production (phase1, outlier gate, phase2) GBA schedule
        as a sequence of short device programs of `gba_stage_iters` LM
        iterations each. Between stages the host yields, so concurrently
        dispatched frame steps interleave on the device and an abort
        (the reference's mbStopGBA interlock) takes effect at the next
        stage boundary. Returns the last stage's BAResult (None if
        aborted before the first stage completed)."""
        scfg = self.cfg.solver
        total = scfg.global_ba_iters
        n1_total = total // 2
        stage = max(1, self.cfg.loop.gba_stage_iters)
        res = None
        done1 = done2 = 0
        while done1 < n1_total or done2 < total - n1_total:
            if abort is not None and abort.is_set():
                break
            if done1 < n1_total:
                n1 = min(stage, n1_total - done1)
                n2 = 0
                done1 += n1
            else:
                n1 = 0
                n2 = min(stage, total - n1_total - done2)
                done2 += n2
            res = self._gba_stage(prob, plane_free, n1, n2)
            jax.block_until_ready(res.cam_pose)
            prob = prob._replace(cam_pose=res.cam_pose, pt_xyz=res.pt_xyz)
            if plane_free is not None:
                plane_free = plane_free._replace(pl_coeff=res.pl_coeff)
        return res

    def _global_ba(self, m: MapState) -> MapState:
        """Synchronous GBA (`RunGlobalBundleAdjustment` inline): build,
        solve, apply. The async path (launch_gba_async/poll_gba) uses the
        same builder and stage runner on a snapshot instead."""
        prob, plane_free = self._build_gba_problem(m)
        res = self._run_gba_stages(prob, plane_free)
        return self._apply_gba(m, res, plane_free is not None)

    def _apply_gba(self, m: MapState, res, with_planes: bool) -> MapState:
        poses = jnp.where(m.kf_valid[:, None], res.cam_pose, m.kf_pose)
        pts = jnp.where(m.pt_valid[:, None], res.pt_xyz, m.pt_xyz)
        m = m._replace(kf_pose=poses, pt_xyz=pts)
        if with_planes:
            new_coeff = jnp.where(m.pl_valid[:, None], res.pl_coeff,
                                  m.pl_coeff)
            # keep boundary clouds ON their optimized planes (the
            # reference's `MapPlane::UpdateBoundary`,
            # `/root/reference/src/MapPlane.cc:150`, keeps boundaries
            # current as coefficients move): project each boundary point
            # onto the new plane — GBA's coefficient moves are small, so
            # the orthogonal projection is the consistent minimal update.
            # Both frame association and loop-time plane fusion measure
            # boundary-to-plane distances; without this the clouds drift
            # off their planes across repeated closures.
            nrm = new_coeff[:, :3]                        # unit (retract)
            off = (jnp.einsum("lbi,li->lb", m.pl_boundary, nrm)
                   + new_coeff[:, 3][:, None])            # [L, B]
            bnd = m.pl_boundary - off[..., None] * nrm[:, None, :]
            keep = m.pl_valid[:, None, None] \
                & m.pl_boundary_valid[..., None]
            m = m._replace(pl_coeff=new_coeff,
                           pl_boundary=jnp.where(keep, bnd, m.pl_boundary))
        return m

    # ------------------------------------------------------ async GBA
    # The reference runs GBA in a transient thread with an abort interlock
    # and merges its output into a map that kept growing meanwhile
    # (`src/LoopClosing.cc:594, 686-796`, mbStopGBA / mTcwGBA / mPosGBA).
    # Here: GBA runs on a map SNAPSHOT (device arrays are immutable, so the
    # snapshot is free) in a host thread that dispatches short stage
    # programs; tracking keeps dispatching frame steps between them.
    # Keyframes are matched across the flight window by kf_frame_id (one
    # keyframe per frame id ⇒ a unique, compaction-proof key); point-slot
    # compactions during flight are composed into _gba_pt_map via
    # note_pt_remap.

    def gba_inflight(self) -> bool:
        return self._gba_thread is not None and self._gba_thread.is_alive()

    def abort_gba(self) -> None:
        """Discard any in-flight GBA (the mbStopGBA path: a newer loop
        closure supersedes it)."""
        t = self._gba_thread
        if t is not None:
            self._gba_abort.set()
            t.join()
            self.stats["n_gba_aborts"] = \
                self.stats.get("n_gba_aborts", 0) + 1
        self._gba_thread = None
        self._gba_out = None
        self._gba_snap = None
        self._gba_pt_map = None

    def note_pt_remap(self, remap: np.ndarray) -> None:
        """Point-slot compaction happened while GBA is in flight: compose
        it into the snapshot->current point index map."""
        if self._gba_pt_map is not None:
            pm = self._gba_pt_map
            r = np.asarray(remap)
            self._gba_pt_map = np.where(pm >= 0,
                                        r[np.clip(pm, 0, None)], -1)

    def launch_gba_async(self, m: MapState) -> None:
        import threading
        self.abort_gba()
        prob, plane_free = self._build_gba_problem(m)
        self._gba_snap = {
            "kf_frame_id": np.asarray(m.kf_frame_id).copy(),
            "kf_valid": np.asarray(m.kf_valid).copy(),
            "pt_valid": np.asarray(m.pt_valid).copy(),
            "pl_valid": np.asarray(m.pl_valid).copy(),
        }
        self._gba_pt_map = np.arange(m.max_pt, dtype=np.int64)
        self._gba_out = None
        self._gba_abort = threading.Event()

        def work():
            try:
                res = self._run_gba_stages(prob, plane_free,
                                           self._gba_abort)
                if res is not None and not self._gba_abort.is_set():
                    self._gba_out = res
            except Exception:   # surface solver failures, don't hang
                import traceback
                traceback.print_exc()

        self._gba_thread = threading.Thread(target=work, daemon=True,
                                            name="eao-gba")
        self._gba_thread.start()

    def poll_gba(self, m: MapState, blocking: bool = False
                 ) -> Tuple[MapState, bool]:
        """If an async GBA finished, merge its result into the LIVE map
        and return (merged_map, True); otherwise (m, False). With
        blocking=True waits for completion first (used before trajectory /
        checkpoint reads)."""
        t = self._gba_thread
        if t is None:
            return m, False
        if blocking:
            t.join()
        if t.is_alive():
            return m, False
        self._gba_thread = None
        res = self._gba_out
        snap = self._gba_snap
        pt_map = self._gba_pt_map
        self._gba_out = self._gba_snap = self._gba_pt_map = None
        if res is None:
            return m, False
        return self._merge_gba(m, res, snap, pt_map), True

    def _merge_gba(self, m: MapState, res, snap, pt_map) -> MapState:
        """Post-hoc merge (`LoopClosing::RunGlobalBundleAdjustment`
        post-GBA section, `src/LoopClosing.cc:686-796`): keyframes present
        at the snapshot take their GBA poses (mTcwGBA); keyframes created
        while GBA was in flight are corrected through the spanning tree
        (Tchild' = Tchild ∘ Tparent⁻¹ ∘ Tparent'); points present at the
        snapshot take GBA positions (mPosGBA); newer points and planes
        move through their reference keyframe's correction."""
        K = m.max_kf
        kf_valid = np.asarray(m.kf_valid)
        cur_fid = np.asarray(m.kf_frame_id)
        pose_before = np.asarray(m.kf_pose)
        gba_pose = np.asarray(res.cam_pose)
        snap_slot = {int(f): i
                     for i, f in enumerate(snap["kf_frame_id"])
                     if snap["kf_valid"][i]}
        new_pose = pose_before.copy()
        new_kfs = []
        for j in np.where(kf_valid)[0]:
            s = snap_slot.get(int(cur_fid[j]), -1)
            if s >= 0:
                new_pose[j] = gba_pose[s]
            else:
                new_kfs.append(int(j))
        if new_kfs:
            Z = np.asarray(covisibility.observation_indicator(m))
            covis = Z @ Z.T
            for j in new_kfs:       # ascending slot order: parents (which
                cand = covis[j, :j].copy()   # are earlier slots) already
                cand[~kf_valid[:j]] = -1.0   # carry corrected poses
                parent = int(np.argmax(cand)) if cand.size else -1
                if parent < 0 or cand[parent] <= 0:
                    earlier = np.where(kf_valid[:j])[0]
                    if len(earlier) == 0:
                        continue
                    parent = int(earlier[-1])
                new_pose[j] = np.asarray(lie.se3_compose(
                    jnp.asarray(pose_before[j]),
                    lie.se3_compose(
                        lie.se3_inverse(jnp.asarray(pose_before[parent])),
                        jnp.asarray(new_pose[parent]))))

        # ---- points ------------------------------------------------
        P = m.max_pt
        pt_valid = np.asarray(m.pt_valid)
        X = np.asarray(m.pt_xyz).copy()
        cur_of_snap = pt_map                         # [P] snap -> current
        sel = (cur_of_snap >= 0) & snap["pt_valid"]
        sel &= pt_valid[np.clip(cur_of_snap, 0, None)]
        X[cur_of_snap[sel]] = np.asarray(res.pt_xyz)[sel]
        from_snap = np.zeros(P, bool)
        from_snap[cur_of_snap[sel]] = True
        new_pts = pt_valid & (~from_snap)
        if new_pts.any():
            ref = np.clip(np.asarray(m.pt_ref_kf), 0, K - 1)
            T_move = jax.vmap(lie.se3_compose)(
                jax.vmap(lie.se3_inverse)(jnp.asarray(new_pose)[ref]),
                jnp.asarray(pose_before)[ref])
            moved = np.asarray(lie.se3_apply(T_move, jnp.asarray(X)))
            ok = new_pts & (np.asarray(m.pt_ref_kf) >= 0)
            X[ok] = moved[ok]

        out = m._replace(kf_pose=jnp.asarray(new_pose),
                         pt_xyz=jnp.asarray(X))

        # ---- planes (ids are stable: no plane compaction) ------------
        if self.cfg.use_planes and res.pl_coeff is not None:
            from eao_fusion_tpu.mapping import plane_map
            pl_valid = np.asarray(m.pl_valid)
            both = pl_valid & snap["pl_valid"]
            coeff = np.asarray(m.pl_coeff).copy()
            coeff[both] = np.asarray(res.pl_coeff)[both]
            bnd = np.asarray(m.pl_boundary).copy()
            bv = np.asarray(m.pl_boundary_valid)
            # snapshot planes: project boundaries onto optimized planes
            off = np.einsum("lbi,li->lb", bnd, coeff[:, :3]) \
                + coeff[:, 3][:, None]
            proj = bnd - off[..., None] * coeff[:, None, :3]
            keep = both[:, None] & bv
            bnd[keep] = proj[keep]
            # planes created during flight: follow their reference KF
            new_pl = pl_valid & (~snap["pl_valid"]) \
                & (np.asarray(m.pl_ref_kf) >= 0)
            if new_pl.any():
                pref = np.clip(np.asarray(m.pl_ref_kf), 0, K - 1)
                T_pl = jax.vmap(lie.se3_compose)(
                    jax.vmap(lie.se3_inverse)(jnp.asarray(new_pose)[pref]),
                    jnp.asarray(pose_before)[pref])
                c_new = np.asarray(jax.vmap(plane_map.transform_planes)(
                    jnp.asarray(coeff), T_pl))
                b_new = np.asarray(jax.vmap(lie.se3_apply)(
                    T_pl, jnp.asarray(bnd)))
                coeff[new_pl] = c_new[new_pl]
                bnd[new_pl[:, None] & bv] = b_new[new_pl[:, None] & bv]
            out = out._replace(pl_coeff=jnp.asarray(coeff),
                               pl_boundary=jnp.asarray(bnd))
        return out

    # ------------------------------------------------------------ driver
    def dispatch_detect(self, m: MapState, slots) -> Tuple[MapState, dict]:
        """ASYNC half of batched loop detection: ONE fused device
        dispatch (obs-indicator refresh + bow rows + covisibility product
        + L1 scores) for up to 64 keyframe slots, WITHOUT pulling the
        results — the returned pending handle holds device arrays, so
        the detection compute overlaps whatever the caller runs next
        (the next chunk, in the steady chunked mode — the TPU analogue
        of the reference's always-awake LoopClosing thread,
        `src/LoopClosing.cc:57-88`). Harvest with harvest_detect."""
        import time as _time
        slots = [int(s) for s in slots]
        assert 0 < len(slots) <= 64
        # pad the slot list to a fixed bucket so ONE program serves any
        # chunk (a compile per distinct keyframe count cost minutes each
        # over the remote-compile tunnel); padding repeats the first
        # slot, whose bow-row rewrite is idempotent, and the harvest
        # loop only visits the real slots
        n_real = len(slots)
        bucket = 8
        n = min(((n_real + bucket - 1) // bucket) * bucket, 64)
        slots_padded = (slots + [slots[0]] * n)[:n]
        if n not in self._onkf_batch_jit:
            def _batch(m, slots_a, bow):
                from eao_fusion_tpu.mapping.map_state import \
                    refresh_obs_ind
                m = refresh_obs_ind(m)
                vs = jax.vmap(
                    lambda s: vocabulary.bow_vector(
                        self.vocab, m.kf_desc_pm1[s], m.kf_kp_valid[s])
                )(slots_a)
                bow = bow.at[slots_a].set(vs)
                Z = covisibility.observation_indicator(m)
                covis = covisibility.covisibility_counts(Z)
                scores = jax.vmap(
                    lambda v: vocabulary.l1_scores(v, bow, m.kf_valid)
                )(vs)
                return m, bow, scores, covis
            self._onkf_batch_jit[n] = jax.jit(_batch)
        t0 = _time.time()
        m, self.bow, scores_d, covis_d = self._onkf_batch_jit[n](
            m, jnp.asarray(slots_padded, jnp.int32), self.bow)
        self.stats["t_detect"] = self.stats.get("t_detect", 0.0) \
            + _time.time() - t0
        self.stats["n_detect"] = self.stats.get("n_detect", 0) + n_real
        return m, {"slots": slots, "scores": scores_d, "covis": covis_d}

    def harvest_detect(self, m: MapState, pending: dict, key,
                       kf_valid=None) -> Tuple[MapState, int, int]:
        """Pull a pending detection's stats and run the host
        gating/consistency logic per slot in insertion order; on a
        candidate, Sim3 + correct() run synchronously against the
        CURRENT map. After any successful correct() the remaining slots
        are re-processed through on_keyframes, which recomputes their
        stats — later slots never gate on stale covisibility/scores.
        `kf_valid` lets a caller that already pulled the validity mask
        avoid a second round trip. Returns (map, n_closed, last_slot)."""
        import os
        import time as _time
        dbg = os.environ.get("EAO_LOOP_DEBUG")
        scores, covis = jax.device_get(
            (pending["scores"], pending["covis"]))
        if kf_valid is None:
            kf_valid = jax.device_get(m.kf_valid)
        kf_valid = np.asarray(kf_valid).astype(bool)
        slots = pending["slots"]
        for i, slot in enumerate(slots):
            cand = self._detect_from_stats(slot, scores[i], covis,
                                           kf_valid, debug=bool(dbg))
            if cand < 0:
                continue
            t0 = _time.time()
            key, k = jax.random.split(key)
            g = self.compute_sim3(m, slot, cand, k, debug=bool(dbg))
            self.stats["t_sim3"] = self.stats.get("t_sim3", 0.0) \
                + _time.time() - t0
            self.stats["n_sim3"] = self.stats.get("n_sim3", 0) + 1
            if g is None:
                continue
            t0 = _time.time()
            m = self.correct(m, slot, cand, g)
            self.stats["t_correct"] = self.stats.get("t_correct", 0.0) \
                + _time.time() - t0
            self.stats["n_correct"] = self.stats.get("n_correct", 0) + 1
            rest = slots[i + 1:]
            if rest:
                key, k = jax.random.split(key)
                m, nc2, ls2 = self.on_keyframes(m, rest, k)
                return m, 1 + nc2, (ls2 if ls2 >= 0 else slot)
            return m, 1, slot
        return m, 0, -1

    def on_keyframes(self, m: MapState, slots, key
                     ) -> Tuple[MapState, int, int]:
        """Synchronous batch form: dispatch + harvest per sub-batch of
        <=64 slots (semantics of serial on_keyframe calls; a mid-batch
        closure re-dispatches the remainder with fresh stats via the
        harvest_detect -> on_keyframes recursion). Returns
        (map, n_closed, last_closed_slot)."""
        slots = [int(s) for s in slots]
        if not slots:
            return m, 0, -1
        n_closed, last_slot = 0, -1
        idx = 0
        while idx < len(slots):
            sub = slots[idx:idx + 64]
            m, pending = self.dispatch_detect(m, sub)
            key, k = jax.random.split(key)
            m, nc, ls = self.harvest_detect(m, pending, k)
            n_closed += nc
            if ls >= 0:
                last_slot = ls
            idx += len(sub)
        return m, n_closed, last_slot

    def on_keyframe(self, m: MapState, slot: int, key) -> Tuple[MapState, bool]:
        import os
        dbg = os.environ.get("EAO_LOOP_DEBUG")
        # Loop decisions read the covisibility graph; recompute the
        # observation indicator exactly here rather than trusting the
        # keyframe-rate incremental cache (staleness in a single row warps
        # the consistency groups). ONE fused device dispatch (obs-indicator
        # refresh + bow row + covisibility product + L1 scores) and ONE
        # host pull (~264 kB) per keyframe: on a tunneled TPU the previous
        # 6-dispatch/5-pull structure cost hundreds of ms per keyframe —
        # it dominated the round-4 fr3-scale run.
        if self._onkf_jit is None:
            def _onkf(m, slot, bow):
                from eao_fusion_tpu.mapping.map_state import refresh_obs_ind
                m = refresh_obs_ind(m)
                v = vocabulary.bow_vector(self.vocab, m.kf_desc_pm1[slot],
                                          m.kf_kp_valid[slot])
                bow = bow.at[slot].set(v)
                Z = covisibility.observation_indicator(m)
                covis = covisibility.covisibility_counts(Z)
                scores = vocabulary.l1_scores(v, bow, m.kf_valid)
                return m, bow, scores, covis
            self._onkf_jit = jax.jit(_onkf)
        import time as _time
        t0 = _time.time()
        m, self.bow, scores_d, covis_d = self._onkf_jit(
            m, jnp.int32(slot), self.bow)
        scores, covis, kf_valid = jax.device_get(
            (scores_d, covis_d, m.kf_valid))
        cand = self._detect_from_stats(slot, scores, covis, kf_valid,
                                       debug=bool(dbg))
        self.stats["t_detect"] = self.stats.get("t_detect", 0.0) \
            + _time.time() - t0
        self.stats["n_detect"] = self.stats.get("n_detect", 0) + 1
        t0 = _time.time()
        if cand < 0:
            return m, False
        g = self.compute_sim3(m, slot, cand, key, debug=bool(dbg))
        self.stats["t_sim3"] = self.stats.get("t_sim3", 0.0) \
            + _time.time() - t0
        self.stats["n_sim3"] = self.stats.get("n_sim3", 0) + 1
        if dbg:
            print(f"[loop] kf{slot}: candidate {cand}, sim3 "
                  f"{'OK' if g is not None else 'REJECTED'}", flush=True)
        if g is None:
            return m, False
        t0 = _time.time()
        m = self.correct(m, slot, cand, g)
        self.stats["t_correct"] = self.stats.get("t_correct", 0.0) \
            + _time.time() - t0
        self.stats["n_correct"] = self.stats.get("n_correct", 0) + 1
        return m, True
