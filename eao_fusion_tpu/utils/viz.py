"""Offline visualization: matplotlib artifact dumps.

Replaces the reference's Pangolin/HighGUI viewer thread (`src/Viewer.cc`,
`src/MapDrawer.cc`, `src/FrameDrawer.cc` — SURVEY.md §7.4): instead of a GL
window, the same content is written as image files — map top view with
keyframe trajectory / points / plane boundaries / object cuboids, and
per-frame overlays with keypoints and detector boxes (the reference's
`mQuadricImage` role)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def draw_frame_overlay(path: str, gray: np.ndarray, feats=None,
                       kp_pt=None, boxes: Optional[np.ndarray] = None,
                       title: str = "") -> None:
    """Keypoint + detection overlay (FrameDrawer::DrawFrame role)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 6), dpi=90)
    ax.imshow(gray, cmap="gray", vmin=0, vmax=1)
    if feats is not None:
        uv = np.asarray(feats.uv)
        valid = np.asarray(feats.valid)
        tracked = (np.asarray(kp_pt) >= 0) if kp_pt is not None else \
            np.zeros(len(uv), bool)
        ax.scatter(uv[valid & ~tracked, 0], uv[valid & ~tracked, 1],
                   s=4, c="tab:blue", alpha=0.6, label="keypoints")
        ax.scatter(uv[valid & tracked, 0], uv[valid & tracked, 1],
                   s=6, c="tab:green", label="tracked")
    if boxes is not None and len(boxes):
        for b in boxes:
            cls, x, y, w, h = b[0], b[1], b[2], b[3], b[4]
            ax.add_patch(plt.Rectangle((x, y), w, h, fill=False,
                                       ec="tab:red", lw=1.5))
            ax.text(x, y - 3, f"{int(cls)}", color="tab:red", fontsize=8)
    ax.set_title(title)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def draw_map_topview(path: str, system, gt_tcw: Optional[np.ndarray] = None
                     ) -> None:
    """x/z top view: trajectory, map points, plane boundaries, object
    cuboids (MapDrawer::DrawObject / DrawMapPlanes roles)."""
    from eao_fusion_tpu.ops import lie
    plt = _mpl()
    m = system.map
    fig, ax = plt.subplots(figsize=(8, 8), dpi=100)

    pts = np.asarray(m.pt_xyz)
    ok = np.asarray(m.pt_valid)
    ax.scatter(pts[ok, 0], pts[ok, 2], s=1, c="0.6", label="map points")

    est = system.trajectory_tcw()
    if len(est):
        twc = np.asarray(lie.se3_inverse(est))
        ax.plot(twc[:, 4], twc[:, 6], "-", c="tab:green", lw=1.5,
                label="estimate")
    if gt_tcw is not None and len(gt_tcw):
        twc = np.asarray(lie.se3_inverse(np.asarray(gt_tcw, np.float32)))
        ax.plot(twc[:, 4], twc[:, 6], "--", c="tab:orange", lw=1.0,
                label="ground truth")

    bd = np.asarray(m.pl_boundary)
    bok = np.asarray(m.pl_boundary_valid)
    pvalid = np.asarray(m.pl_valid)
    for li in range(bd.shape[0]):
        if pvalid[li] and bok[li].any():
            b = bd[li][bok[li]]
            ax.scatter(b[:, 0], b[:, 2], s=3, alpha=0.5,
                       label="plane" if li == 0 else None)

    ot = getattr(system, "objects", None)
    if ot is not None:
        ov = np.asarray(ot.valid)
        cmin = np.asarray(ot.cub_min)
        cmax = np.asarray(ot.cub_max)
        for o in range(len(ov)):
            if not ov[o]:
                continue
            x0, z0 = cmin[o, 0], cmin[o, 2]
            x1, z1 = cmax[o, 0], cmax[o, 2]
            ax.add_patch(plt.Rectangle((x0, z0), x1 - x0, z1 - z0,
                                       fill=False, ec="tab:red", lw=1.5))
            ax.text(x0, z0, f"obj{o}", color="tab:red", fontsize=8)

    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(f"map: {int(np.asarray(m.kf_valid).sum())} KFs, "
                 f"{int(ok.sum())} points")
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def draw_quadric_overlay(path: str, gray: np.ndarray, system,
                         pose: Optional[np.ndarray] = None,
                         title: str = "") -> None:
    """Project map-object ellipsoids into the frame as conics — the role
    of `Tracking::DrawQuadricProject` (`src/Tracking.cc:3164`) and
    `MapDrawer::DrawObject`'s gluSphere quadric scaled by the cuboid
    half-axes: dual quadric Q* = T diag(1,1,1,-1) Tᵀ with T = [diag(s) c],
    image conic C* = P Q* Pᵀ, drawn as the zero level set of x ᵀ C x."""
    plt = _mpl()
    cfg = system.cfg
    m_pose = np.asarray(pose if pose is not None else system.track.pose)
    from eao_fusion_tpu.ops import lie
    import jax.numpy as jnp
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(m_pose[:4])))
    t = m_pose[4:7]
    K = np.array([[cfg.camera.fx, 0, cfg.camera.cx],
                  [0, cfg.camera.fy, cfg.camera.cy],
                  [0, 0, 1.0]])
    P = K @ np.concatenate([R, t[:, None]], axis=1)        # [3, 4]

    fig, ax = plt.subplots(figsize=(8, 6), dpi=90)
    ax.imshow(gray, cmap="gray", vmin=0, vmax=1)
    H, W = gray.shape
    xs, ys = np.meshgrid(np.linspace(0, W - 1, 240),
                         np.linspace(0, H - 1, 180))

    ot = getattr(system, "objects", None)
    if ot is not None:
        ov = np.asarray(ot.valid)
        cmin = np.asarray(ot.cub_min)
        cmax = np.asarray(ot.cub_max)
        cen = np.asarray(ot.center)
        for o in np.where(ov)[0]:
            s = np.maximum((cmax[o] - cmin[o]) / 2.0, 1e-3)
            Tq = np.eye(4)
            Tq[:3, :3] = np.diag(s)
            Tq[:3, 3] = cen[o]
            Qs = Tq @ np.diag([1.0, 1.0, 1.0, -1.0]) @ Tq.T
            Cs = P @ Qs @ P.T                              # dual conic [3,3]
            # behind-camera / degenerate guard
            xc = R @ cen[o] + t
            if xc[2] < 0.3 or abs(np.linalg.det(Cs)) < 1e-12:
                continue
            Cc = np.linalg.inv(Cs)
            Cc = Cc / np.linalg.norm(Cc)
            val = (Cc[0, 0] * xs ** 2 + Cc[1, 1] * ys ** 2 + Cc[2, 2]
                   + 2 * Cc[0, 1] * xs * ys + 2 * Cc[0, 2] * xs
                   + 2 * Cc[1, 2] * ys)
            ax.contour(xs, ys, val, levels=[0.0], colors="tab:red",
                       linewidths=1.5)
            u = P @ np.r_[cen[o], 1.0]
            if u[2] > 0:
                ax.text(u[0] / u[2], u[1] / u[2], f"obj{o}",
                        color="tab:red", fontsize=8)
    ax.set_title(title or "quadric projection")
    ax.set_axis_off()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
