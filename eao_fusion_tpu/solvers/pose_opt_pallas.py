"""Per-frame pose optimization as ONE Pallas TPU kernel.

The XLA version (solvers/pose_opt.py) is a `lax.scan` of 4 rounds of up to
10 Gauss-Newton iterations; every iteration is a chain of tiny ops over
[1024] observations plus a 6x6 solve — each op costs more in fixed per-op
overhead than in math, and the serial loop cannot hide it (measured
~1.1 ms/call on a v5e; two calls per tracked frame). This kernel runs the
ENTIRE schedule — Huber IRLS, plane factors, chi2 reclassification between
rounds, convergence early-exit — in one `pallas_call`: the observation set
(1024 points x a few channels = ~40 KB) lives in VMEM for all ~40
iterations, the 6x6 Cholesky solve and the SE(3) retraction run as scalar
arithmetic between vector passes, and nothing round-trips to HBM.

Semantics are bit-compatible with `pose_opt.optimize_pose`
(`Optimizer::PoseOptimization`, /root/reference/src/Optimizer.cc:325-673):
same residuals/Jacobians, same 4x10 schedule with chi2 gates 5.991/7.815,
same plane edge weights (angleInfo 3282.8 / disInfo 1e4 / chi2 300,
/root/reference/src/Optimizer.cc:456-535). A parity test drives both paths
on random problems (tests/test_pose_opt.py) through the Pallas interpreter.

Layout: observations are channel-planar [R, 128] tiles (R = M // 128) so
every elementwise pass is a full-width VPU op; the pose itself is carried
as 7 scalars through the loop registers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


# --------------------------------------------------------------- scalar lie

def _quat_rotate_s(q, v):
    """Rotate scalar-channel vector v (3-tuple) by quaternion q (4-tuple)."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = _cross_s(u, v)
    uuv = _cross_s(u, uv)
    return tuple(v[i] + 2.0 * (w * uv[i] + uuv[i]) for i in range(3))


def _cross_s(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _quat_mul_s(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _rotmat_s(q):
    """Quaternion (qw,qx,qy,qz) -> 9 rotation-matrix scalars (row major)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def _se3_retract_s(pose, delta):
    """Scalar mirror of lie.se3_retract (exp([w, v]) * pose). `pose` is a
    7-tuple (qw qx qy qz tx ty tz); `delta` a 6-tuple."""
    w = (delta[0], delta[1], delta[2])
    v = (delta[3], delta[4], delta[5])
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    sinc = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    dq = (cw, sinc * w[0], sinc * w[1], sinc * w[2])
    # t = Jl(w) v = v + a (w x v) + b (w x (w x v))   (lie.so3_left_jacobian)
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta))
                  / jnp.maximum(theta2 * theta, _EPS))
    wxv = _cross_s(w, v)
    wwxv = _cross_s(w, wxv)
    dt = tuple(v[i] + a * wxv[i] + b * wwxv[i] for i in range(3))

    q0 = (pose[0], pose[1], pose[2], pose[3])
    t0 = (pose[4], pose[5], pose[6])
    q = _quat_mul_s(dq, q0)
    qn = jnp.sqrt(jnp.maximum(
        q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3], _EPS))
    q = tuple(c / qn for c in q)
    rt = _quat_rotate_s(dq, t0)
    t = tuple(rt[i] + dt[i] for i in range(3))
    return q + t


def _cholesky6_solve(H, b):
    """Solve (H) x = b for a symmetric 6x6 given as H[i][j] scalars (i<=j
    filled), b[6] scalars. Unrolled Cholesky; mirrors jnp.linalg.solve on
    the damped GN system (H is PD after the +1e-6 I damping)."""
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        d = H[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-20))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            s = H[j][i] if j <= i else H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back: L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


# ------------------------------------------------------------------- kernel

def _make_kernel(cam: Tuple[float, float, float, float, float],
                 rounds: int, iters: int, chi2_mono: float,
                 chi2_stereo: float, with_planes: bool,
                 plane_angle_info: float, plane_dist_info: float,
                 plane_chi2: float):
    fx, fy, cx, cy, bf = (float(c) for c in cam)

    def point_pass(pose, pts, ou, ov, our, stereo):
        """Camera-frame projection + residual/Jacobian channel planes."""
        r = _rotmat_s((pose[0], pose[1], pose[2], pose[3]))
        px, py, pz = pts
        xcx = r[0] * px + r[1] * py + r[2] * pz + pose[4]
        xcy = r[3] * px + r[4] * py + r[5] * pz + pose[5]
        xcz = r[6] * px + r[7] * py + r[8] * pz + pose[6]
        z = jnp.maximum(xcz, 1e-6)
        iz = 1.0 / z
        iz2 = iz * iz
        u = fx * xcx * iz + cx
        v = fy * xcy * iz + cy
        ur = u - bf * iz
        ru = ou - u
        rv = ov - v
        rur = (our - ur) * stereo
        behind = (xcz < 1e-3).astype(jnp.float32)
        zero = jnp.zeros_like(px)
        du = (fx * iz, zero, -fx * xcx * iz2)
        dv = (zero, fy * iz, -fy * xcy * iz2)
        dur = (du[0], du[1], du[2] + bf * iz2)
        # d xc / d delta columns (left retraction): [-hat(xc) | I]
        dxc = ((zero, -xcz, xcy), (xcz, zero, -xcx), (-xcy, xcx, zero),
               (None, None, None), (None, None, None), (None, None, None))

        def jrow(dp, k):
            if k < 3:
                c = dxc[k]
                return -(dp[0] * c[0] + dp[1] * c[1] + dp[2] * c[2])
            return -dp[k - 3]

        Ju = [jrow(du, k) for k in range(6)]
        Jv = [jrow(dv, k) for k in range(6)]
        Jur = [jrow(dur, k) * stereo for k in range(6)]
        return ru, rv, rur, Ju, Jv, Jur, behind

    def plane_pass(pose, pl):
        """Plane residual/Jacobian channel planes ((1,128) each)."""
        nw0, nw1, nw2, dw, nm0, nm1, nm2, dm, pval = pl
        r = _rotmat_s((pose[0], pose[1], pose[2], pose[3]))
        nc0 = r[0] * nw0 + r[1] * nw1 + r[2] * nw2
        nc1 = r[3] * nw0 + r[4] * nw1 + r[5] * nw2
        nc2 = r[6] * nw0 + r[7] * nw1 + r[8] * nw2
        dc = dw - (nc0 * pose[4] + nc1 * pose[5] + nc2 * pose[6])
        # r_ang = n_c x n_m ; r_dst = d_c - d_m
        ra = (nc1 * nm2 - nc2 * nm1,
              nc2 * nm0 - nc0 * nm2,
              nc0 * nm1 - nc1 * nm0)
        rd = dc - dm
        # J_ang (w block) = hat(n_m) hat(n_c) = n_c n_m^T - (n_m . n_c) I
        nc = (nc0, nc1, nc2)
        nm = (nm0, nm1, nm2)
        dot = nc0 * nm0 + nc1 * nm1 + nc2 * nm2
        Ja = [[nc[rr] * nm[kk] - (dot if rr == kk else 0.0)
               for kk in range(3)] for rr in range(3)]
        c2 = (plane_angle_info * (ra[0] * ra[0] + ra[1] * ra[1]
                                  + ra[2] * ra[2])
              + plane_dist_info * rd * rd)
        return nc, ra, rd, Ja, c2, pval

    def kernel(pose_ref, pts_ref, obs_ref, valid_ref, pl_ref,
               pose_out_ref, inl_out_ref, stats_out_ref):
        px = pts_ref[0]
        py = pts_ref[1]
        pz = pts_ref[2]
        pts = (px, py, pz)
        ou = obs_ref[0]
        ov = obs_ref[1]
        our = obs_ref[2]
        w_info = obs_ref[3]
        valid = valid_ref[:]
        stereo = (our >= 0.0).astype(jnp.float32)
        pose0 = tuple(pose_ref[i] for i in range(7))
        if with_planes:
            pl = tuple(pl_ref[i] for i in range(9))
            pl_inl0 = pl[8]
        else:
            pl = None
            pl_inl0 = jnp.zeros((1, 128), jnp.float32)

        def gn_iter(pose, inl, pl_inl):
            ru, rv, rur, Ju, Jv, Jur, behind = point_pass(
                pose, pts, ou, ov, our, stereo)
            chi2 = (ru * ru + rv * rv + rur * rur) * w_info
            delta2 = stereo * chi2_stereo + (1.0 - stereo) * chi2_mono
            hub = jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
            w_rob = jnp.minimum(1.0, hub)
            w = w_info * w_rob * inl * valid * (1.0 - behind)

            H = [[None] * 6 for _ in range(6)]
            b = [None] * 6
            for i in range(6):
                for j in range(i, 6):
                    H[i][j] = jnp.sum(
                        w * (Ju[i] * Ju[j] + Jv[i] * Jv[j]
                             + Jur[i] * Jur[j]))
                b[i] = -jnp.sum(w * (Ju[i] * ru + Jv[i] * rv
                                     + Jur[i] * rur))

            if with_planes:
                nc, ra, rd, Ja, c2, pval = plane_pass(pose, pl)
                hub_p = jnp.minimum(1.0, jnp.sqrt(
                    plane_chi2 / jnp.maximum(c2, 1e-12)))
                pw = pval * hub_p * pl_inl
                for i in range(3):
                    for j in range(i, 3):
                        H[i][j] = H[i][j] + plane_angle_info * jnp.sum(
                            pw * (Ja[0][i] * Ja[0][j] + Ja[1][i] * Ja[1][j]
                                  + Ja[2][i] * Ja[2][j]))
                        H[3 + i][3 + j] = (H[3 + i][3 + j]
                                           + plane_dist_info
                                           * jnp.sum(pw * nc[i] * nc[j]))
                    b[i] = b[i] - plane_angle_info * jnp.sum(
                        pw * (Ja[0][i] * ra[0] + Ja[1][i] * ra[1]
                              + Ja[2][i] * ra[2]))
                    # J_dst v-block = -n_c  ->  b -= disInfo * (-n_c) r_dst
                    b[3 + i] = b[3 + i] + plane_dist_info * jnp.sum(
                        pw * nc[i] * rd)

            for i in range(6):
                H[i][i] = H[i][i] + 1e-6
            delta = _cholesky6_solve(H, b)
            s = delta[0]
            for k in range(1, 6):
                s = s + delta[k]
            good = jnp.isfinite(s)
            delta = [jnp.where(good, d, 0.0) for d in delta]
            dn = jnp.sqrt(delta[0] * delta[0] + delta[1] * delta[1]
                          + delta[2] * delta[2] + delta[3] * delta[3]
                          + delta[4] * delta[4] + delta[5] * delta[5])
            return _se3_retract_s(pose, delta), dn

        def chi2_masks(pose, inl):
            ru, rv, rur, _, _, _, behind = point_pass(
                pose, pts, ou, ov, our, stereo)
            chi2 = (ru * ru + rv * rv + rur * rur) * w_info
            thresh = stereo * chi2_stereo + (1.0 - stereo) * chi2_mono
            new_inl = ((chi2 <= thresh).astype(jnp.float32) * valid
                       * (1.0 - behind))
            return chi2, new_inl

        def round_body(r, carry):
            pose = carry[:7]
            inl, pl_inl = carry[7], carry[8]

            def cond(st):
                return (st[0] < iters) & (st[8] > 1e-6)

            def body(st):
                i = st[0]
                pose_i = st[1:8]
                pose_n, dn = gn_iter(pose_i, inl, pl_inl)
                return (i + 1,) + pose_n + (dn,)

            st = jax.lax.while_loop(
                cond, body, (jnp.int32(0),) + pose + (jnp.float32(jnp.inf),))
            pose = st[1:8]
            _, inl = chi2_masks(pose, inl)
            if with_planes:
                _, _, _, _, c2, pval = plane_pass(pose, pl)
                pl_inl = (c2 <= plane_chi2).astype(jnp.float32) * pval
            return pose + (inl, pl_inl)

        carry = pose0 + (valid, pl_inl0)
        carry = jax.lax.fori_loop(0, rounds, round_body, carry)
        pose = carry[:7]
        inl = carry[7]

        chi2, _ = chi2_masks(pose, inl)
        for i in range(7):
            pose_out_ref[i] = pose[i]
        pose_out_ref[7] = 0.0
        inl_out_ref[:] = inl
        stats_out_ref[0] = jnp.sum(inl)
        stats_out_ref[1] = jnp.sum(chi2 * inl)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cam", "cfg", "interpret"))
def optimize_pose_pallas(pose0: jax.Array, obs, plane_obs=None, *,
                         cam: Tuple[float, float, float, float, float],
                         cfg, interpret: bool = False):
    """Drop-in Pallas replacement for `pose_opt.optimize_pose`. Requires
    the observation count M to be a multiple of 128 (config default 1024).
    `interpret=True` runs the kernel in the Pallas interpreter (used by the
    CPU parity test)."""
    from eao_fusion_tpu.solvers.pose_opt import PoseOptResult

    M = obs.valid.shape[0]
    assert M % 128 == 0, M
    R = M // 128

    pts = obs.pts_w.T.reshape(3, R, 128)
    obs4 = jnp.stack([obs.uv[:, 0], obs.uv[:, 1], obs.uright,
                      obs.inv_sigma2]).reshape(4, R, 128)
    valid = obs.valid.astype(jnp.float32).reshape(R, 128)
    pose_in = jnp.concatenate([pose0, jnp.zeros((1,), pose0.dtype)])

    with_planes = plane_obs is not None
    if with_planes:
        Q = plane_obs.valid.shape[0]
        assert Q <= 128, Q

        def pad(x):
            return jnp.zeros((128,), jnp.float32).at[:Q].set(x)

        plb = jnp.stack([pad(plane_obs.plane_w[:, 0]),
                        pad(plane_obs.plane_w[:, 1]),
                        pad(plane_obs.plane_w[:, 2]),
                        pad(plane_obs.plane_w[:, 3]),
                        pad(plane_obs.meas_c[:, 0]),
                        pad(plane_obs.meas_c[:, 1]),
                        pad(plane_obs.meas_c[:, 2]),
                        pad(plane_obs.meas_c[:, 3]),
                        pad(plane_obs.valid.astype(jnp.float32))]
                        )[:, None, :]                      # [9, 1, 128]
    else:
        plb = jnp.zeros((9, 1, 128), jnp.float32)

    kernel = _make_kernel(cam, cfg.pose_rounds, cfg.pose_iters_per_round,
                          cfg.chi2_mono, cfg.chi2_stereo, with_planes,
                          cfg.plane_angle_info, cfg.plane_dist_info,
                          cfg.plane_chi2)
    pose_out, inl, stats = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((8,), jnp.float32),
                   jax.ShapeDtypeStruct((R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(pose_in, pts, obs4, valid, plb)

    inliers = inl.reshape(M) > 0.5
    return PoseOptResult(pose=pose_out[:7], inliers=inliers,
                         n_inliers=stats[0].astype(jnp.int32),
                         chi2=stats[1])
