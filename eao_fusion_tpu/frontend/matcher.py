"""Descriptor matching as masked MXU matmuls.

Re-design of `src/ORBmatcher.cc`: every search variant (projection against
the last frame :1328, against the local map :45, BoW-bucketed frame↔KF :159,
mutual search for initialization/triangulation) becomes one dense Hamming
matrix (ops/hamming.py) with a boolean feasibility mask (projection window,
pyramid-level window, frustum, validity) and vectorized best/second-best
reduction + duplicate resolution + rotation-histogram filtering.

The numeric thresholds (TH_HIGH=100, TH_LOW=50, ratio 0.9, 30-bin rotation
histogram keeping the top 3 bins) follow the reference exactly since they
shape ATE (SURVEY.md §7.3 "matching parity").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import hamming, lie

INF = jnp.int32(10 ** 9)


class MatchResult(NamedTuple):
    """Per-query association: for each row of the source set, the matched
    index into the target keypoint set (-1 = none)."""
    target_idx: jax.Array   # [A] int32
    dist: jax.Array         # [A] int32 (valid where target_idx >= 0)


def project_points(tcw: jax.Array, pts_w: jax.Array, cam,
                   width: int, height: int, border: float = 0.0
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """World points -> (uv [P,2], z [P], in_image [P])."""
    xc = lie.se3_apply(tcw, pts_w)
    z = xc[:, 2]
    uv = lie.project(cam, xc)
    ok = ((z > 0.05) & (uv[:, 0] >= border) & (uv[:, 0] < width - border)
          & (uv[:, 1] >= border) & (uv[:, 1] < height - border))
    return uv, z, ok


def resolve_duplicates(best_kp: jax.Array, best_dist: jax.Array,
                       valid: jax.Array, n_kp: int) -> jax.Array:
    """Many source rows may claim the same keypoint; keep the lowest-distance
    claimant (ties -> lowest row index). Returns kp_to_src [n_kp] int32, -1
    where unclaimed."""
    a = best_kp.shape[0]
    # unique ordering key: distance major, row index minor
    key = jnp.where(valid, best_dist * a + jnp.arange(a, dtype=jnp.int32), INF)
    slot = jnp.where(valid, best_kp, 0)
    best_key = jnp.full((n_kp,), INF, jnp.int32).at[slot].min(
        jnp.where(valid, key, INF))
    winner = valid & (key == best_key[slot])
    kp_to_src = jnp.full((n_kp,), -1, jnp.int32).at[
        jnp.where(winner, best_kp, n_kp)].set(
            jnp.arange(a, dtype=jnp.int32), mode="drop")
    return kp_to_src


def rotation_consistency(angle_src: jax.Array, angle_kp: jax.Array,
                         kp_idx: jax.Array, valid: jax.Array,
                         histo_length: int = 30) -> jax.Array:
    """ORB-SLAM rotation-histogram check (`src/ORBmatcher.cc:1603`):
    histogram the per-match angle difference, keep only matches whose bin is
    among the 3 most populated. Returns filtered validity mask."""
    two_pi = 2.0 * jnp.pi
    a_kp = angle_kp[jnp.clip(kp_idx, 0, angle_kp.shape[0] - 1)]
    rot = jnp.mod(angle_src - a_kp, two_pi)
    bins = jnp.clip((rot / two_pi * histo_length).astype(jnp.int32),
                    0, histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[
        jnp.where(valid, bins, 0)].add(jnp.where(valid, 1, 0))
    top3 = jax.lax.top_k(counts, 3)[0]
    keep_bin = counts >= jnp.maximum(top3[2], 1)
    return valid & keep_bin[bins]


def masked_best2(dist: jax.Array, mask: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-wise best and second-best over a masked distance matrix.
    Returns (best_idx [A], best [A], second [A])."""
    d = jnp.where(mask, dist, INF)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INF)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


@functools.partial(jax.jit, static_argnames=(
    "cam", "width", "height", "th", "histo_length", "check_rotation",
    "use_ratio"))
def match_points_to_frame(
        pts_w: jax.Array,            # [P, 3] world points
        pt_desc_pm1: jax.Array,      # [P, 256] int8
        pt_valid: jax.Array,         # [P] bool
        pt_ref_angle: jax.Array,     # [P] angle of the source observation
        pt_level: jax.Array,         # [P] predicted/reference octave
        radius_px: jax.Array,        # [P] search radius at level-0 px
        level_lo: jax.Array,         # [P] min acceptable octave (inclusive)
        level_hi: jax.Array,         # [P] max acceptable octave (inclusive)
        feats,                       # FrameFeatures of the current frame
        tcw: jax.Array,              # [7] current pose guess
        *, cam: Tuple[float, float, float, float], width: int, height: int,
        th: int = 100, nn_ratio: float = 1.0, use_ratio: bool = False,
        histo_length: int = 30, check_rotation: bool = True) -> MatchResult:
    """Generic projection search: project P landmark points into the frame,
    match each to the best current keypoint inside its window. Covers both
    SearchByProjection(last frame) and SearchByProjection(local map).

    Returns kp-centric association: MatchResult over the frame's keypoint
    slots, where target_idx[k] = index into the P source rows (-1 if none).
    """
    uv_p, z_p, in_img = project_points(tcw, pts_w, cam, width, height)
    dist = hamming.hamming_matrix(pt_desc_pm1, feats.desc_pm1)   # [P, N]

    du = uv_p[:, 0:1] - feats.uv[None, :, 0]
    dv = uv_p[:, 1:2] - feats.uv[None, :, 1]
    within = (jnp.abs(du) <= radius_px[:, None]) & (jnp.abs(dv) <= radius_px[:, None])
    lvl_ok = ((feats.level[None, :] >= level_lo[:, None]) &
              (feats.level[None, :] <= level_hi[:, None]))
    mask = (within & lvl_ok & in_img[:, None] & pt_valid[:, None]
            & feats.valid[None, :])

    best_kp, best, second = masked_best2(dist, mask)
    ok = (best <= th) & (best < INF)
    if use_ratio:
        # apply the nn ratio only when best & second lie on the same octave
        # (reference `src/ORBmatcher.cc:112-121` semantics, approximated
        # across the window)
        ok = ok & (best.astype(jnp.float32)
                   <= nn_ratio * jnp.minimum(second, th + 1).astype(jnp.float32))

    kp_to_src = resolve_duplicates(best_kp, best, ok, feats.uv.shape[0])
    matched = kp_to_src >= 0
    if check_rotation:
        src_angle = pt_ref_angle[jnp.clip(kp_to_src, 0, pts_w.shape[0] - 1)]
        matched = rotation_consistency(src_angle, feats.angle,
                                       jnp.arange(feats.uv.shape[0]),
                                       matched, histo_length)
    kp_to_src = jnp.where(matched, kp_to_src, -1)
    d_out = jnp.where(matched, best[jnp.clip(kp_to_src, 0, None)], INF)
    return MatchResult(target_idx=kp_to_src, dist=d_out)


@functools.partial(jax.jit, static_argnames=("th", "use_ratio", "check_rotation"))
def mutual_match(desc_a: jax.Array, valid_a: jax.Array, angle_a: jax.Array,
                 desc_b: jax.Array, valid_b: jax.Array, angle_b: jax.Array,
                 *, th: int = 50, nn_ratio: float = 0.9,
                 use_ratio: bool = True, check_rotation: bool = True
                 ) -> MatchResult:
    """Unconstrained mutual-best descriptor matching (TPU stand-in for the
    reference's BoW-bucketed SearchByBoW — brute force over the MXU is both
    faster and strictly higher recall than the DBoW2 node-bucket pruning).
    Returns per-A matched B index."""
    dist = hamming.hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    best_b, best, second = masked_best2(dist, mask)
    ok = best <= th
    if use_ratio:
        ok = ok & (best.astype(jnp.float32)
                   <= nn_ratio * jnp.minimum(second, th + 1).astype(jnp.float32))
    # mutual check: A must also be B's best
    best_a_for_b = jnp.argmin(jnp.where(mask, dist, INF), axis=0).astype(jnp.int32)
    mutual = best_a_for_b[jnp.clip(best_b, 0, None)] == jnp.arange(
        desc_a.shape[0], dtype=jnp.int32)
    ok = ok & mutual
    if check_rotation:
        ok = rotation_consistency(angle_a, angle_b, best_b, ok)
    return MatchResult(target_idx=jnp.where(ok, best_b, -1),
                       dist=jnp.where(ok, best, INF))


def predict_scale_level(dist_w: jax.Array, max_dist: jax.Array,
                        scale_factor: float, n_levels: int) -> jax.Array:
    """MapPoint::PredictScale (`src/MapPoint.cc:372-395`)."""
    ratio = jnp.maximum(max_dist, 1e-6) / jnp.maximum(dist_w, 1e-6)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor))
    return jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
