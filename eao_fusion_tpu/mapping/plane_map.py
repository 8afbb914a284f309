"""Plane landmarks: frame-to-map association, map updates, pose factors.

Re-design of `MapPlane` + `Map::AssociatePlanesByBoundary`
(`src/MapPlane.cc`, `src/Map.cc:155-215`): map planes are rows of the
MapState plane table (world Hessian coeffs + boundary point blocks).
Association is batched over (frame planes x map planes): normal agreement
(cos > 0.8) and boundary-point-to-plane distance (< 0.2 m), thresholds from
`src/Map.cc:22-23`. Matched planes feed PlaneObs factors into pose
optimization (solvers/pose_opt.py) with the reference's information weights.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.mapping.map_state import MapState
from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.solvers.pose_opt import PlaneObs
from eao_fusion_tpu.types import FramePlanes


def planes_to_world(coeffs_c: jax.Array, tcw: jax.Array) -> jax.Array:
    """Camera-frame plane [n_c, d_c] -> world [n_w, d_w] under x_c = R x_w + t:
    n_w = Rᵀ n_c, d_w = d_c + n_c·t."""
    R = lie.quat_to_rotmat(tcw[:4])
    n_c = coeffs_c[:, :3]
    n_w = n_c @ R
    d_w = coeffs_c[:, 3] + n_c @ tcw[4:7]
    return jnp.concatenate([n_w, d_w[:, None]], axis=-1)


def boundary_to_world(boundary_c: jax.Array, tcw: jax.Array) -> jax.Array:
    twc = lie.se3_inverse(tcw)
    return lie.se3_apply(twc, boundary_c)


def transform_planes(coeff: jax.Array, T: jax.Array) -> jax.Array:
    """Move world planes [.., 4] by the world-to-world SE3 map x' = T(x):
    n' = R n, d' = d − n'·t (from n·x + d = 0 with x = Rᵀ(x'−t)). The
    loop-correction counterpart of moving map points by T (the reference
    achieves the same through free plane vertices in GBA,
    `src/Optimizer.cc:210-250`)."""
    R = lie.quat_to_rotmat(T[:4])
    n = coeff[..., :3] @ R.T
    d = coeff[..., 3] - n @ T[4:7]
    return jnp.concatenate([n, d[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def associate_planes(m: MapState, fp: FramePlanes, tcw: jax.Array,
                     *, cfg: SystemConfig) -> jax.Array:
    """Returns [Pf] int32: matched map-plane index per frame plane, -1 none."""
    pc = cfg.planes
    coeff_w = planes_to_world(fp.coeffs, tcw)                  # [Pf, 4]
    bw = boundary_to_world(fp.boundary, tcw)                   # [Pf, B, 3]

    # angle gate with sign alignment
    dots = coeff_w[:, :3] @ m.pl_coeff[:, :3].T                # [Pf, L]
    ang_ok = jnp.abs(dots) > pc.assoc_angle_cos

    # reference direction (`Map::PointDistanceFromPlane`): min distance of
    # the MAP plane's boundary points to the FRAME plane's world coeffs
    dist = jnp.abs(jnp.einsum("lbi,pi->plb", m.pl_boundary, coeff_w[:, :3])
                   + coeff_w[:, None, None, 3])                # [Pf, L, B]
    dist = jnp.where(m.pl_boundary_valid[None, :, :], dist, 1e9)
    min_dist = jnp.min(dist, axis=2)                           # [Pf, L]

    ok = (ang_ok & (min_dist < pc.assoc_dist)
          & fp.valid[:, None] & m.pl_valid[None, :])
    score = jnp.where(ok, min_dist, 1e9)
    best = jnp.argmin(score, axis=1).astype(jnp.int32)
    return jnp.where(jnp.min(score, axis=1) < 1e8, best, -1)


def build_plane_obs(m: MapState, fp: FramePlanes, assoc: jax.Array
                    ) -> PlaneObs:
    """PlaneObs for pose optimization from the associated subset. The
    measured camera plane's sign is aligned to the world landmark so the
    cross/distance residuals are consistent."""
    idx = jnp.clip(assoc, 0, m.pl_coeff.shape[0] - 1)
    plane_w = m.pl_coeff[idx]
    valid = (assoc >= 0) & fp.valid
    return PlaneObs(plane_w=plane_w, meas_c=fp.coeffs, valid=valid)


def _align_sign(meas_c: jax.Array, plane_w: jax.Array, tcw: jax.Array
                ) -> jax.Array:
    """Flip measured camera planes whose normal disagrees with the landmark
    transformed into the camera."""
    R = lie.quat_to_rotmat(tcw[:4])
    n_c_pred = plane_w[:, :3] @ R.T
    flip = jnp.sum(n_c_pred * meas_c[:, :3], axis=-1) < 0
    return jnp.where(flip[:, None], -meas_c, meas_c)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_plane_map(m: MapState, fp: FramePlanes, assoc: jax.Array,
                     tcw: jax.Array, ref_kf=None, *,
                     cfg: SystemConfig) -> MapState:
    """Keyframe-rate plane map update: merge boundaries of matched planes
    (ring-buffer overwrite), insert unmatched planes as new landmarks
    (semantics of `src/Tracking.cc:2489-2518` + `MapPlane::UpdateBoundary`)."""
    L = m.pl_coeff.shape[0]
    B = m.pl_boundary.shape[1]
    Pf, Bf, _ = fp.boundary.shape
    coeff_w = planes_to_world(fp.coeffs, tcw)
    bw = boundary_to_world(fp.boundary, tcw)

    # --- merge matched: append a subsample of new boundary points ---------
    # ring position from obs count: overwrite oldest block of size Bf_take
    take = min(B // 4, Bf)
    matched = (assoc >= 0) & fp.valid
    tgt_pl = jnp.where(matched, assoc, L)
    start = (m.pl_obs_count[jnp.clip(assoc, 0, L - 1)] * take) % jnp.maximum(B - take, 1)
    offs = jnp.arange(take)
    rows = (start[:, None] + offs[None, :])                    # [Pf, take]
    sel = jnp.linspace(0, Bf - 1, take).astype(jnp.int32)
    new_pts = bw[:, sel]                                       # [Pf, take, 3]
    new_ok = fp.boundary_valid[:, sel] & matched[:, None]
    flat_pl = jnp.repeat(tgt_pl, take)
    flat_row = rows.reshape(-1)
    m = m._replace(
        pl_boundary=m.pl_boundary.at[flat_pl, flat_row].set(
            new_pts.reshape(-1, 3), mode="drop"),
        pl_boundary_valid=m.pl_boundary_valid.at[flat_pl, flat_row].max(
            new_ok.reshape(-1), mode="drop"),
        pl_obs_count=m.pl_obs_count.at[jnp.where(matched, assoc, L)].add(
            1, mode="drop"))

    # --- insert unmatched as new planes ----------------------------------
    new = fp.valid & (assoc < 0)
    order = jnp.cumsum(new.astype(jnp.int32)) - 1
    slot = jnp.where(new, m.next_pl + order, L)
    slot = jnp.where(slot >= L, L, slot)
    pad_b = jnp.zeros((Pf, B, 3), jnp.float32)
    pad_b = pad_b.at[:, :Bf].set(bw)
    pad_v = jnp.zeros((Pf, B), bool).at[:, :Bf].set(
        fp.boundary_valid & new[:, None])
    m = m._replace(
        pl_coeff=m.pl_coeff.at[slot].set(coeff_w, mode="drop"),
        pl_valid=m.pl_valid.at[slot].set(True, mode="drop"),
        pl_boundary=m.pl_boundary.at[slot].set(pad_b, mode="drop"),
        pl_boundary_valid=m.pl_boundary_valid.at[slot].set(pad_v, mode="drop"),
        pl_obs_count=m.pl_obs_count.at[slot].set(1, mode="drop"),
        pl_ref_kf=m.pl_ref_kf.at[slot].set(
            jnp.int32(-1 if ref_kf is None else ref_kf), mode="drop"),
        next_pl=jnp.minimum(m.next_pl + jnp.sum(new.astype(jnp.int32)),
                            L))
    # effective landmark id of every frame plane (matched or newly created)
    plane_ids = jnp.where(matched, assoc,
                          jnp.where(new & (slot < L), slot, -1))
    return m, plane_ids


def record_kf_plane_obs(m: MapState, kf_slot, fp: FramePlanes,
                        plane_ids: jax.Array) -> MapState:
    """Store the keyframe's camera-frame plane measurements + landmark ids
    (consumed by the BA plane factors)."""
    return m._replace(
        kf_pl_coeff=m.kf_pl_coeff.at[kf_slot].set(fp.coeffs),
        kf_pl_idx=m.kf_pl_idx.at[kf_slot].set(
            jnp.where(fp.valid, plane_ids, -1)))
