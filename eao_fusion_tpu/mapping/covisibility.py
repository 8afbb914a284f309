"""Covisibility as indicator-matrix matmuls on the MXU.

The reference maintains the covisibility graph incrementally under locks
(`KeyFrame::UpdateConnections`, `src/KeyFrame.cc:325`; spanning tree at
:417). Here the graph is *derived state*: an observation indicator
Z ∈ {0,1}^[K, P] scattered from `kf_pt_idx`, with

    covis = Z Zᵀ          (shared-point counts between keyframes)
    votes = Z s           (keyframe relevance for a query point set s)
    local = Zᵀ 1_{kfs}    (points seen by a keyframe subset)

each a single matmul/matvec — recomputed in microseconds at keyframe rate,
which removes the reference's incremental-update races entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eao_fusion_tpu.mapping.map_state import MapState


def observation_indicator(m: MapState) -> jax.Array:
    """Z [K, P] float32: 1 where keyframe k observes point p. Reads the
    cached indicator (map_state.refresh_obs_ind maintains it at keyframe
    rate); kf_valid is re-applied so culled keyframes drop out even if the
    cache is one refresh behind."""
    return (m.obs_ind & m.kf_valid[:, None]).astype(jnp.float32)


def covisibility_counts(Z: jax.Array) -> jax.Array:
    """[K, K] shared-observation counts; diagonal = per-KF point count."""
    return jnp.dot(Z, Z.T, preferred_element_type=jnp.float32)


def local_keyframes(Z: jax.Array, seen_pts: jax.Array, kf_valid: jax.Array,
                    k_top: int) -> jax.Array:
    """Rank keyframes by how many of `seen_pts` (bool [P]) they observe;
    return bool [K] mask of the top `k_top` (vote > 0). Replaces
    `Tracking::UpdateLocalKeyFrames` (`src/Tracking.cc:2697-2784`)."""
    votes = Z @ seen_pts.astype(jnp.float32)
    votes = jnp.where(kf_valid, votes, -1.0)
    k_top = min(k_top, votes.shape[0])
    thresh = jax.lax.top_k(votes, k_top)[0][-1]
    return (votes >= jnp.maximum(thresh, 1.0)) & kf_valid


def points_of_keyframes(Z: jax.Array, kf_mask: jax.Array) -> jax.Array:
    """bool [P]: points observed by any keyframe in kf_mask. Replaces
    `Tracking::UpdateLocalPoints` (`src/Tracking.cc:2643-2695`)."""
    return (Z.T @ kf_mask.astype(jnp.float32)) > 0.5


def top_covisible(covis: jax.Array, kf_slot, kf_valid: jax.Array,
                  k_top: int, min_shared: int = 15) -> jax.Array:
    """bool [K] mask of the best-connected keyframes of `kf_slot`
    (`KeyFrame::GetBestCovisibilityKeyFrames`, `src/KeyFrame.cc:210`)."""
    row = covis[kf_slot]
    row = row.at[kf_slot].set(0.0)
    row = jnp.where(kf_valid, row, 0.0)
    k_top = min(k_top, row.shape[0])
    thresh = jax.lax.top_k(row, k_top)[0][-1]
    return (row >= jnp.maximum(thresh, float(min_shared))) & kf_valid
