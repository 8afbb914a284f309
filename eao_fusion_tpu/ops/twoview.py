"""Monocular two-view initialization: parallel H/F RANSAC, model selection,
motion recovery, initial triangulation.

Re-design of `src/Initializer.cc` (parallel homography/fundamental RANSAC
threads, RH score selection at :120, `ReconstructF`/`ReconstructH`):
hypotheses are batched with vmap (8-point F, 4-point H, normalized DLT),
scored with the reference's symmetric-transfer truncated scores, the model
chosen by RH = SH/(SH+SF) > 0.40, then motion is recovered — F via the
essential-matrix SVD (4 candidates), H via the Faugeras decomposition (8
candidates) — and the candidate with most valid triangulations wins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eao_fusion_tpu.ops import lie
from eao_fusion_tpu.ops.precision import f32_matmuls
from eao_fusion_tpu.solvers.triangulation import triangulate_dlt


def _normalize(pts: jax.Array, valid: jax.Array):
    w = valid.astype(jnp.float32)[:, None]
    mean = jnp.sum(pts * w, 0) / jnp.maximum(w.sum(), 1.0)
    d = jnp.sum(jnp.abs(pts - mean) * w, 0) / jnp.maximum(w.sum(), 1.0)
    s = 1.0 / jnp.maximum(d, 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1]) \
         .at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return (pts - mean) * s, T


def _dlt_f(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """8-point fundamental from [8, 2] pairs (already normalized)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1)
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, D, Vt2 = jnp.linalg.svd(F)
    D = D.at[2].set(0.0)
    return U @ jnp.diag(D) @ Vt2


def _dlt_h(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """4-point homography from [4, 2] pairs."""
    def rows(a, b):
        x, y = a
        u, v = b
        return jnp.array([
            [0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v],
            [x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y, -u]])
    A = jnp.concatenate([rows(p1[i], p2[i]) for i in range(4)])
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _score_f(F, p1, p2, valid, sigma2: float = 1.0, th: float = 3.841,
             th_score: float = 5.991):
    """Symmetric epipolar-distance score (`Initializer::CheckFundamental`)."""
    ones = jnp.ones((p1.shape[0], 1))
    h1 = jnp.concatenate([p1, ones], -1)
    h2 = jnp.concatenate([p2, ones], -1)
    l2 = h1 @ F.T                           # epipolar line in img2
    l1 = h2 @ F                             # epipolar line in img1
    d2 = jnp.sum(h2 * l2, -1) ** 2 / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12) / sigma2
    d1 = jnp.sum(h1 * l1, -1) ** 2 / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12) / sigma2
    inl = (d1 < th) & (d2 < th) & valid
    score = jnp.sum(jnp.where(valid & (d1 < th), th_score - d1, 0.0)
                    + jnp.where(valid & (d2 < th), th_score - d2, 0.0))
    return score, inl


def _score_h(H, p1, p2, valid, sigma2: float = 1.0, th: float = 5.991):
    """Symmetric transfer error score (`Initializer::CheckHomography`)."""
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones((p1.shape[0], 1))
    h1 = jnp.concatenate([p1, ones], -1)
    h2 = jnp.concatenate([p2, ones], -1)
    p12 = h1 @ H.T
    p12 = p12[:, :2] / jnp.where(jnp.abs(p12[:, 2:]) < 1e-12, 1e-12,
                                 p12[:, 2:])
    p21 = h2 @ Hinv.T
    p21 = p21[:, :2] / jnp.where(jnp.abs(p21[:, 2:]) < 1e-12, 1e-12,
                                 p21[:, 2:])
    d2 = jnp.sum((p2 - p12) ** 2, -1) / sigma2
    d1 = jnp.sum((p1 - p21) ** 2, -1) / sigma2
    inl = (d1 < th) & (d2 < th) & valid
    score = jnp.sum(jnp.where(valid & (d1 < th), th - d1, 0.0)
                    + jnp.where(valid & (d2 < th), th - d2, 0.0))
    return score, inl


def _decompose_e(E):
    """4 (R, t) candidates from an essential matrix."""
    U, _, Vt = jnp.linalg.svd(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    Wm = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ Wm @ Vt
    R2 = U @ Wm.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _decompose_h(H):
    """8 (R, t, n) candidates (Faugeras SVD method,
    `Initializer::ReconstructH` `src/Initializer.cc:580-770`)."""
    U, D, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]
    # x1/x3 magnitudes
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3)
                                / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # d' = d2 (positive) case
    st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                              * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-20)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(ct).at[2, 2].set(ct) \
               .at[0, 2].set(-eps * st).at[2, 0].set(eps * st)
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # d' = -d2 case
    sphi = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-20)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cphi).at[2, 2].set(cphi) \
               .at[0, 2].set(eps * sphi).at[2, 0].set(eps * sphi)
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    ts = [t / jnp.maximum(jnp.linalg.norm(t), 1e-12) for t in ts]
    return jnp.stack(Rs), jnp.stack(ts)


class TwoViewResult(NamedTuple):
    success: jax.Array     # [] bool
    tcw2: jax.Array        # [7] pose of frame 2 (frame 1 = identity)
    xyz: jax.Array         # [N, 3] triangulated points
    ok: jax.Array          # [N] triangulation validity
    used_h: jax.Array      # [] bool (model selection diagnostic)


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses"))
@f32_matmuls
def initialize_two_view(uv1: jax.Array, uv2: jax.Array, valid: jax.Array,
                        key: jax.Array,
                        *, cam: Tuple[float, float, float, float],
                        n_hypotheses: int = 200) -> TwoViewResult:
    """uv1, uv2: [N, 2] matched pixels. Frame-1 camera is the identity."""
    fx, fy, cx, cy = cam
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    n = uv1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    kf, kh = jax.random.split(key)
    idx_f = jax.random.choice(kf, n, shape=(n_hypotheses, 8), p=p)
    idx_h = jax.random.choice(kh, n, shape=(n_hypotheses, 4), p=p)

    n1, T1 = _normalize(uv1, valid)
    n2, T2 = _normalize(uv2, valid)

    def hyp_f(ix):
        Fn = _dlt_f(n1[ix], n2[ix])
        F = T2.T @ Fn @ T1
        s, _ = _score_f(F, uv1, uv2, valid)
        return F, s

    def hyp_h(ix):
        Hn = _dlt_h(n1[ix], n2[ix])
        H = jnp.linalg.inv(T2) @ Hn @ T1
        s, _ = _score_h(H, uv1, uv2, valid)
        return H, s

    Fs, sf = jax.vmap(hyp_f)(idx_f)
    Hs, sh = jax.vmap(hyp_h)(idx_h)
    bf = jnp.argmax(sf)
    bh = jnp.argmax(sh)
    F = Fs[bf]
    H = Hs[bh]
    SF = sf[bf]
    SH = sh[bh]
    _, inl_f = _score_f(F, uv1, uv2, valid)
    _, inl_h = _score_h(H, uv1, uv2, valid)
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40

    # candidate motions from both decompositions; evaluate all 12
    E = K.T @ F @ K
    Rf, tf = _decompose_e(E)
    Rh, th = _decompose_h(jnp.linalg.inv(K) @ H @ K)
    Rall = jnp.concatenate([Rf, Rh])
    tall = jnp.concatenate([tf, th])
    from_h = jnp.concatenate([jnp.zeros(4, bool), jnp.ones(8, bool)])
    inl = jnp.where(use_h, inl_h, inl_f)

    cam_t = cam

    def eval_rt(R, t):
        tcw2 = lie.se3_from_Rt(R, t)
        xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], -1)
        xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], -1)
        xw = triangulate_dlt(lie.se3_identity(), tcw2, xn1, xn2)
        z1 = xw[:, 2]
        xc2 = lie.se3_apply(tcw2, xw)
        e1 = lie.project(cam_t, xw) - uv1
        e2 = lie.project(cam_t, xc2) - uv2
        good = (inl & (z1 > 0.0) & (xc2[:, 2] > 0.0)
                & (jnp.sum(e1 * e1, -1) < 16.0)
                & (jnp.sum(e2 * e2, -1) < 16.0)
                & jnp.all(jnp.isfinite(xw), -1))
        return jnp.sum(good.astype(jnp.int32)), tcw2, xw, good

    counts, tcw2s, xws, goods = jax.vmap(eval_rt)(Rall, tall)
    counts = jnp.where(from_h == use_h, counts, -1)
    best = jnp.argmax(counts)
    n_good = counts[best]
    n_inl = jnp.sum(inl.astype(jnp.int32))
    # acceptance: enough triangulations and a clear winner (reference
    # requires nGood > 0.9 * inliers and minimum 50)
    second = jnp.max(jnp.where(jnp.arange(12) == best, -1, counts))
    success = (n_good >= 50) & \
        (n_good.astype(jnp.float32) > 0.75 * n_inl.astype(jnp.float32)) & \
        (second.astype(jnp.float32) < 0.9 * n_good.astype(jnp.float32))
    return TwoViewResult(success=success, tcw2=tcw2s[best], xyz=xws[best],
                         ok=goods[best], used_h=use_h)
