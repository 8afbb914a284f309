"""SO(3) / SE(3) / Sim(3) operations on batched arrays.

Conventions
-----------
* Quaternions are ``[w, x, y, z]``, unit norm.
* An SE(3) pose is a length-7 vector ``[qw qx qy qz tx ty tz]`` acting as
  ``x' = R x + t``. SLAM poses are Tcw (world -> camera), matching the
  reference's `cv::Mat mTcw` convention (`src/Frame.cc`, `src/KeyFrame.cc`).
* A Sim(3) is a length-8 vector ``[qw qx qy qz tx ty tz s]`` acting as
  ``x' = s R x + t`` (the g2o::Sim3 convention used by `src/Sim3Solver.cc`).
* Tangents: so3 = omega[3]; se3 = [omega(3), v(3)] with the full exponential
  ``R = exp(omega^), t = Jl(omega) v``; sim3 adds a log-scale coordinate.
* All functions broadcast over leading axes (vmap-free batching).

Everything is pure jnp (f32) and differentiable; GN solvers use a left
retraction ``retract(T, d) = exp(d) * T`` so Jacobians are evaluated at
``d = 0`` by autodiff or the closed forms in the solver modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------- quaternions

def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v[..., 3] by quaternions q[..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Shepperd's method, branch-free via a 4-way select (stable for all R)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions, each safe in a different region.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)      # [..., 4(case), 4]
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)  # pick the largest diagonal
    case = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ----------------------------------------------------------------------- so3

def so3_hat(w: jax.Array) -> jax.Array:
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp_quat(w: jax.Array) -> jax.Array:
    """exp: so3 tangent -> unit quaternion (numerically stable near 0)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    sinc = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, sinc * w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """log: unit quaternion -> so3 tangent."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # take the short path
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-7, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vn, _EPS))
    return scale * v


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian Jl(w) of SO(3): integrates translation in se3 exp."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = so3_hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    return I + a * W + b * W2


# ----------------------------------------------------------------------- se3

def se3_identity(shape=()) -> jax.Array:
    p = jnp.zeros(shape + (7,), dtype=jnp.float32)
    return p.at[..., 0].set(1.0)


def se3_from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([rotmat_to_quat(R), t], axis=-1)


def se3_rotation(p: jax.Array) -> jax.Array:
    return p[..., :4]


def se3_translation(p: jax.Array) -> jax.Array:
    return p[..., 4:7]


def se3_matrix(p: jax.Array) -> jax.Array:
    """[..., 4, 4] homogeneous matrix."""
    R = quat_to_rotmat(p[..., :4])
    t = p[..., 4:7]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(p: jax.Array, x: jax.Array) -> jax.Array:
    """Apply pose to points x[..., 3]."""
    return quat_rotate(p[..., :4], x) + p[..., 4:7]


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a*b)(x) = a(b(x))."""
    q = quat_mul(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3_inverse(p: jax.Array) -> jax.Array:
    qi = quat_conj(p[..., :4])
    ti = -quat_rotate(qi, p[..., 4:7])
    return jnp.concatenate([qi, ti], axis=-1)


def se3_exp(tau: jax.Array) -> jax.Array:
    """exp: se3 tangent [omega(3), v(3)] -> pose (full exponential)."""
    w, v = tau[..., :3], tau[..., 3:6]
    q = so3_exp_quat(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return jnp.concatenate([q, t], axis=-1)


def se3_log(p: jax.Array) -> jax.Array:
    w = so3_log(p[..., :4])
    Jl = so3_left_jacobian(w)
    v = jnp.linalg.solve(Jl, p[..., 4:7][..., :, None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_retract(p: jax.Array, tau: jax.Array) -> jax.Array:
    """Left-multiplicative retraction used by all GN solvers: exp(tau) * p."""
    return se3_compose(se3_exp(tau), p)


# ---------------------------------------------------------------------- sim3

def sim3_identity(shape=()) -> jax.Array:
    p = jnp.zeros(shape + (8,), dtype=jnp.float32)
    return p.at[..., 0].set(1.0).at[..., 7].set(1.0)


def sim3_from_se3(p: jax.Array, s=None) -> jax.Array:
    if s is None:
        s = jnp.ones(p.shape[:-1] + (1,), dtype=p.dtype)
    else:
        s = jnp.broadcast_to(jnp.asarray(s, p.dtype), p.shape[:-1] + (1,))
    return jnp.concatenate([p, s], axis=-1)


def sim3_to_se3(g: jax.Array) -> jax.Array:
    """Drop scale (t unchanged) — used when mapping corrected Sim3 back to SE3
    with translation rescale t/s as in `src/LoopClosing.cc:510-515`."""
    t = g[..., 4:7] / g[..., 7:8]
    return jnp.concatenate([g[..., :4], t], axis=-1)


def sim3_apply(g: jax.Array, x: jax.Array) -> jax.Array:
    return g[..., 7:8] * quat_rotate(g[..., :4], x) + g[..., 4:7]


def sim3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    q = quat_normalize(quat_mul(a[..., :4], b[..., :4]))
    t = a[..., 7:8] * quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    s = a[..., 7:8] * b[..., 7:8]
    return jnp.concatenate([q, t, s], axis=-1)


def sim3_inverse(g: jax.Array) -> jax.Array:
    qi = quat_conj(g[..., :4])
    si = 1.0 / jnp.maximum(g[..., 7:8], _EPS)
    ti = -si * quat_rotate(qi, g[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


def sim3_exp(tau: jax.Array) -> jax.Array:
    """exp for sim3 tangent [omega(3), v(3), sigma(1)].

    Uses the simplified retraction R=exp(w), s=exp(sigma), t=W(w,sigma) v with
    W approximated by Jl(w) (exact at sigma=0) — adequate as a GN retraction
    since solvers only evaluate Jacobians at tau=0."""
    w, v, sig = tau[..., :3], tau[..., 3:6], tau[..., 6:7]
    q = so3_exp_quat(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return jnp.concatenate([q, t, jnp.exp(sig)], axis=-1)


def sim3_log(g: jax.Array) -> jax.Array:
    w = so3_log(g[..., :4])
    Jl = so3_left_jacobian(w)
    v = jnp.linalg.solve(Jl, g[..., 4:7][..., :, None])[..., 0]
    sig = jnp.log(jnp.maximum(g[..., 7:8], _EPS))
    return jnp.concatenate([w, v, sig], axis=-1)


def sim3_retract(g: jax.Array, tau: jax.Array) -> jax.Array:
    return sim3_compose(sim3_exp(tau), g)


# ------------------------------------------------------------------- cameras

def project(cam_fx_fy_cx_cy: tuple, xc: jax.Array) -> jax.Array:
    """Pinhole projection of camera-frame points xc[..., 3] -> pixels [..., 2]."""
    fx, fy, cx, cy = cam_fx_fy_cx_cy
    z = jnp.maximum(xc[..., 2:3], _EPS)
    return jnp.concatenate([
        fx * xc[..., 0:1] / z + cx,
        fy * xc[..., 1:2] / z + cy,
    ], axis=-1)


def backproject(cam_fx_fy_cx_cy: tuple, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels + depth -> camera-frame 3D points."""
    fx, fy, cx, cy = cam_fx_fy_cx_cy
    d = depth[..., None] if depth.ndim == uv.ndim - 1 else depth
    x = (uv[..., 0:1] - cx) / fx * d
    y = (uv[..., 1:2] - cy) / fy * d
    return jnp.concatenate([x, y, d], axis=-1)
