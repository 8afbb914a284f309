"""Core pytree types shared across the engine.

Everything is a NamedTuple of fixed-shape arrays (registered as a JAX pytree
automatically), with validity masks instead of dynamic sizes — the functional
replacement for the reference's pointer-linked Frame/KeyFrame/MapPoint object
graph (`include/Frame.h`, `include/MapPoint.h`)."""

from __future__ import annotations

from typing import NamedTuple

import jax


class FrameFeatures(NamedTuple):
    """Per-frame ORB features, fixed capacity N = ORBConfig.max_keypoints.

    Mirrors the per-frame data of `src/Frame.cc` (keypoints, descriptors,
    stereo depth channel) in SoA form."""

    uv: jax.Array          # [N, 2] float32, level-0 pixel coords (x, y)
    response: jax.Array    # [N] float32 FAST score (0 for empty slots)
    level: jax.Array       # [N] int32 pyramid octave
    angle: jax.Array       # [N] float32 radians
    desc_packed: jax.Array  # [N, 8] uint32 — 256-bit BRIEF, packed
    desc_pm1: jax.Array    # [N, 256] int8 — same bits as ±1 (MXU scoring form)
    valid: jax.Array       # [N] bool
    depth: jax.Array       # [N] float32 meters; 0 = no depth
    uright: jax.Array      # [N] float32 virtual right u (u - bf/z); -1 = mono

    @property
    def n_slots(self) -> int:
        return self.uv.shape[0]


class FramePlanes(NamedTuple):
    """Per-frame plane observations (fixed capacity P = max_planes_per_frame).
    Planes are Hessian-normal 4-vectors [n, d] in the CAMERA frame with
    n·x + d = 0, n unit, d >= 0 — matching `include/MapPlane.h` coeffs."""

    coeffs: jax.Array        # [P, 4] float32 camera-frame plane
    n_inliers: jax.Array     # [P] int32 supporting pixel count
    valid: jax.Array         # [P] bool
    boundary: jax.Array      # [P, B, 3] float32 camera-frame sample points
    boundary_valid: jax.Array  # [P, B] bool


class FrameObjects(NamedTuple):
    """Per-frame 2D object detections after filtering (fixed capacity O).
    Mirrors Object_2D (`include/Object.h:87-140`)."""

    box: jax.Array           # [O, 4] float32 (x0, y0, x1, y1)
    class_id: jax.Array      # [O] int32
    score: jax.Array         # [O] float32
    valid: jax.Array         # [O] bool
