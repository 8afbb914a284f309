"""Fused per-edge pass of the local-BA LM iteration as ONE Pallas kernel.

The COO Gauss-Newton iteration (`solvers/ba.py:bundle_adjust_coo`) spends
its time not in FLOPs but in per-kernel issue latency: the per-edge
residual/Jacobian/Gram chain is ~20 small XLA kernels over [E]-shaped
operands, ~80 us each on a v5e (dev/bench_ba_parts.py: residuals+J alone
1.6 ms at E=8192 — the same dispatch wall as the per-frame pose optimizer,
which is why solvers/pose_opt_pallas.py exists). This kernel computes, in
one dispatch, for every edge:

  residual r [3], robust Huber weight w, camera Jacobian J_c [3,6]
  (pre-masked by the fixed-camera gate), point Jacobian J_p [3,3], and
  the packed Gram payloads the Schur assembly matmuls consume:
    pay_c [42] = (J_c' w J_c).flatten(36) ++ (J_c' w r)(6)
    pay_p [12] = (J_p' w J_p).flatten(9)  ++ (J_p' w r)(3)
    Y     [18] = (J_c' w J_p).flatten()               (the Hcp block)

plus a chi2-only variant for the LM accept test (`robust_chi2`). The
camera/point lookups stay OUTSIDE as one-hot MXU matmuls producing the
channel-planar [ch, E] input block; the downstream [C,E]/[Pw,E] one-hot
reductions stay outside as MXU matmuls. Math is bit-identical in
structure to `ba._residuals_coo` + the packed Gram block in
`ba.bundle_adjust_coo` (reference semantics:
`Optimizer::LocalBundleAdjustment`, /root/reference/src/Optimizer.cc:
675-1139); parity is asserted in tests/test_ba.py via the interpreter.

Layout: E edges as [R, 128] tiles (R = E // 128), channel-planar stacked
input ein [20, R, 128]:
  0-8   R_e row-major      9-11  t_e          12-14 pw
  15    uv0   16 uv1       17    ur           18    inv_sigma2
  19    fm (free-camera 0/1)
`active` [R, 128] is passed separately (it changes between LM phases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IN = 20


def _edge_math(ein_ref, act_ref, cam, chi2_mono, chi2_stereo):
    """Shared per-edge math on [R, 128] channel planes. Returns
    (r3, Jall rows, w, c2, delta2, mask, behind) where Jall is a 3x9
    list grid."""
    fx, fy, cx, cy, bf = cam
    c = [ein_ref[k] for k in range(N_IN)]
    R00, R01, R02, R10, R11, R12, R20, R21, R22 = c[0:9]
    t0, t1, t2 = c[9:12]
    p0, p1, p2 = c[12:15]
    uv0, uv1, ur, is2, fm = c[15:20]
    act = act_ref[:, :]

    x = R00 * p0 + R01 * p1 + R02 * p2 + t0
    y = R10 * p0 + R11 * p1 + R12 * p2 + t1
    zr = R20 * p0 + R21 * p1 + R22 * p2 + t2
    z = jnp.maximum(zr, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    urr = u - bf * iz
    s = (ur >= 0.0).astype(jnp.float32)
    r0 = uv0 - u
    r1 = uv1 - v
    r2 = s * (ur - urr)
    c2 = (r0 * r0 + r1 * r1 + r2 * r2) * is2
    delta2 = s * chi2_stereo + (1.0 - s) * chi2_mono
    w_rob = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
    behind = (zr < 1e-3).astype(jnp.float32)
    mask = act * (1.0 - behind)
    w = is2 * w_rob * mask

    # dproj rows (du, dv, s*dur)
    zero = jnp.zeros_like(x)
    du = (fx * iz, zero, -fx * x * iz2)
    dv = (zero, fy * iz, -fy * y * iz2)
    dur = (s * du[0], zero, s * (du[2] + bf * iz2))
    dproj = (du, dv, dur)
    # -hat(xc) (camera rotational part of d xc / d delta); xc unclamped,
    # matching ba._residuals_coo (so3_hat acts on xc, the clamp only
    # guards the projection divide)
    nh = ((zero, zr, -y), (-zr, zero, x), (y, -x, zero))
    R3 = ((R00, R01, R02), (R10, R11, R12), (R20, R21, R22))

    Jall = [[None] * 9 for _ in range(3)]
    for rr in range(3):
        d = dproj[rr]
        for i in range(3):
            # J_c rotational: -(dproj @ -hat(xc)), masked by fm
            Jall[rr][i] = -(d[0] * nh[0][i] + d[1] * nh[1][i]
                            + d[2] * nh[2][i]) * fm
            # J_c translational: -(dproj @ I)
            Jall[rr][3 + i] = -d[i] * fm
            # J_p: -(dproj @ R)
            Jall[rr][6 + i] = -(d[0] * R3[0][i] + d[1] * R3[1][i]
                                + d[2] * R3[2][i])
    return (r0, r1, r2), Jall, w, c2, delta2, mask, behind


def _full_kernel(cam, chi2_mono, chi2_stereo):
    def kernel(ein_ref, act_ref, payc_ref, payp_ref, y_ref):
        r3, J, w, _, _, _, _ = _edge_math(ein_ref, act_ref, cam,
                                       chi2_mono, chi2_stereo)

        sym = {}

        def gram(i, j):
            key = (min(i, j), max(i, j))
            if key not in sym:
                a, b = key
                sym[key] = w * (J[0][a] * J[0][b] + J[1][a] * J[1][b]
                                + J[2][a] * J[2][b])
            return sym[key]

        def grhs(i):
            return w * (J[0][i] * r3[0] + J[1][i] * r3[1] + J[2][i] * r3[2])

        # pay_c: G[:6,:6] row-major (36) ++ g[:6]
        for i in range(6):
            for j in range(6):
                payc_ref[i * 6 + j] = gram(i, j)
        for i in range(6):
            payc_ref[36 + i] = grhs(i)
        # pay_p: G[6:,6:] row-major (9) ++ g[6:]
        for i in range(3):
            for j in range(3):
                payp_ref[i * 3 + j] = gram(6 + i, 6 + j)
        for i in range(3):
            payp_ref[9 + i] = grhs(6 + i)
        # Y = G[:6, 6:] row-major (18)
        for i in range(6):
            for j in range(3):
                y_ref[i * 3 + j] = gram(i, 6 + j)

    return kernel


def _chi2_kernel(cam, chi2_mono, chi2_stereo):
    def kernel(ein_ref, act_ref, out_ref):
        (_, _, _, c2, delta2, mask,
         behind) = _edge_math(ein_ref, act_ref, cam, chi2_mono,
                              chi2_stereo)
        c2r = jnp.where(c2 <= delta2, c2,
                        2.0 * jnp.sqrt(delta2 * c2) - delta2)
        out_ref[0] = c2r * mask          # robust, masked (LM accept test)
        out_ref[1] = c2                  # raw chi2 (inlier classification)
        out_ref[2] = behind

    return kernel


def _planar(x, E):
    return x.reshape(-1, E // 128, 128)


@functools.partial(jax.jit, static_argnames=("cam", "chi2_mono",
                                             "chi2_stereo", "interpret"))
def edge_pass_full(ein: jax.Array, active: jax.Array, *,
                   cam, chi2_mono: float, chi2_stereo: float,
                   interpret: bool = False):
    """ein [20, E] channel-planar input, active [E] f32. Returns
    (pay_c [E,42], pay_p [E,12], Y [E,6,3])."""
    _, E = ein.shape
    R = E // 128
    payc, payp, y = pl.pallas_call(
        _full_kernel(cam, float(chi2_mono), float(chi2_stereo)),
        out_shape=(jax.ShapeDtypeStruct((42, R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((12, R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((18, R, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(_planar(ein, E), _planar(active, E)[0])
    return (payc.reshape(42, E), payp.reshape(12, E), y.reshape(18, E))


@functools.partial(jax.jit, static_argnames=("cam", "chi2_mono",
                                             "chi2_stereo", "interpret"))
def edge_pass_chi2(ein: jax.Array, active: jax.Array, *,
                   cam, chi2_mono: float, chi2_stereo: float,
                   interpret: bool = False):
    """Per-edge chi2 channels: (robust-masked c2r [E], raw c2 [E],
    behind flag [E] f32)."""
    _, E = ein.shape
    R = E // 128
    out = pl.pallas_call(
        _chi2_kernel(cam, float(chi2_mono), float(chi2_stereo)),
        out_shape=jax.ShapeDtypeStruct((3, R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(_planar(ein, E), _planar(active, E)[0])
    out = out.reshape(3, E)
    return out[0], out[1], out[2]
