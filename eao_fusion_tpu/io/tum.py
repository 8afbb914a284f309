"""TUM RGBD dataset IO: image lists, ground truth, trajectory writing, ATE/RPE.

Format parity with the reference:
  * image lists `data/rgb_full_demo.txt` — `timestamp path` lines with `#`
    comments (read by the reference's ROS-free offline path).
  * ground truth `data/groundtruth.txt` — `timestamp tx ty tz qx qy qz qw`
    (loaded at `src/Tracking.cc:187-232`).
  * trajectory output matches `System::SaveTrajectoryTUM`
    (`src/System.cc:274-327`): `time tx ty tz qx qy qz qw`, camera-to-world.
  * KITTI output matches `System::SaveTrajectoryKITTI` (`src/System.cc:367-414`).
  * offline YOLO boxes `data/yolo_txts/<timestamp>.txt` — `class x y w h score`
    rows (read at `src/Tracking.cc:476-524`).

Evaluation: absolute trajectory error after Horn/Umeyama alignment and
relative pose error, the metrics the reference delegates to evo/TUM scripts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from eao_fusion_tpu.ops import lie


# ------------------------------------------------------------------- parsing

def read_image_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def read_groundtruth(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps [N], twc poses [N,7] as [qw qx qy qz tx ty tz]).

    File rows are `t tx ty tz qx qy qz qw` (camera-to-world)."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            if len(v) < 8:
                continue
            ts.append(v[0])
            tx, ty, tz, qx, qy, qz, qw = v[1:8]
            poses.append([qw, qx, qy, qz, tx, ty, tz])
    return np.array(ts), np.array(poses, np.float32)


def read_accelerometer(path: str) -> List:
    """TUM `accelerometer.txt` (`t ax ay az`) -> ImuSample list (gyro
    zeroed; the reference only consumes accel for the gravity alignment,
    `ros_test/src/message_flow.cc:270-308`)."""
    from eao_fusion_tpu.io.imu import ImuSample
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            if len(v) < 4:
                continue
            out.append(ImuSample(v[0], np.array(v[1:4], np.float32),
                                 np.zeros(3, np.float32)))
    return out


def read_yolo_boxes(path: str) -> np.ndarray:
    """Offline detection file -> [B, 6] rows (class, x, y, w, h, score)."""
    if not os.path.exists(path):
        return np.zeros((0, 6), np.float32)
    rows = []
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) >= 6:
                rows.append([float(x) for x in v[:6]])
    return np.array(rows, np.float32).reshape(-1, 6)


def associate_timestamps(ts_a: np.ndarray, ts_b: np.ndarray,
                         max_dt: float = 0.02) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp association (TUM associate.py semantics)."""
    pairs = []
    j = 0
    used = set()
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, t))
        best, best_dt = -1, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(ts_b) and k not in used:
                dt = abs(ts_b[k] - t)
                if dt <= best_dt:
                    best, best_dt = k, dt
        if best >= 0:
            pairs.append((i, best))
            used.add(best)
    return pairs


# ------------------------------------------------------------------- writing

def write_trajectory_tum(path: str, timestamps: Sequence[float],
                         tcw: np.ndarray) -> None:
    """Write camera trajectory in TUM format (converts Tcw -> Twc), matching
    `System::SaveTrajectoryTUM` output ordering `t tx ty tz qx qy qz qw`."""
    twc = np.asarray(lie.se3_inverse(np.asarray(tcw, np.float32)))
    with open(path, "w") as f:
        for t, p in zip(timestamps, twc):
            qw, qx, qy, qz, tx, ty, tz = p
            f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                    f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def write_trajectory_kitti(path: str, tcw: np.ndarray) -> None:
    """KITTI format: 12 numbers per row, row-major 3x4 of Twc."""
    twc = np.asarray(lie.se3_inverse(np.asarray(tcw, np.float32)))
    M = np.asarray(lie.se3_matrix(twc))[:, :3, :]
    with open(path, "w") as f:
        for m in M:
            f.write(" ".join(f"{x:.9e}" for x in m.reshape(-1)) + "\n")


# ---------------------------------------------------------------- evaluation

@dataclass
class TrajectoryError:
    ate_rmse: float
    ate_mean: float
    ate_median: float
    ate_max: float
    rpe_trans_rmse: float
    rpe_rot_rmse: float  # radians per step
    n_poses: int


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares rigid (or similarity) alignment dst ≈ s R src + t.
    Horn/Umeyama closed form; returns (R, t, s)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def evaluate_ate_rpe(est_tcw: np.ndarray, gt_tcw: np.ndarray,
                     align: bool = True, with_scale: bool = False,
                     rpe_delta: int = 1) -> TrajectoryError:
    """ATE on aligned camera centers + RPE over `rpe_delta`-step increments."""
    est_twc = np.asarray(lie.se3_inverse(np.asarray(est_tcw, np.float32)))
    gt_twc = np.asarray(lie.se3_inverse(np.asarray(gt_tcw, np.float32)))
    pe = est_twc[:, 4:7]
    pg = gt_twc[:, 4:7]
    if align and len(pe) >= 3:
        R, t, s = umeyama_alignment(pe, pg, with_scale)
        pe = (s * (R @ pe.T)).T + t
    err = np.linalg.norm(pe - pg, axis=1)

    # RPE over relative motions (alignment-invariant)
    d = rpe_delta
    if len(est_twc) > d:
        rel_e = np.asarray(lie.se3_compose(
            lie.se3_inverse(est_twc[:-d]), est_twc[d:]))
        rel_g = np.asarray(lie.se3_compose(
            lie.se3_inverse(gt_twc[:-d]), gt_twc[d:]))
        dtrans = np.linalg.norm(rel_e[:, 4:7] - rel_g[:, 4:7], axis=1)
        drel = np.asarray(lie.quat_mul(lie.quat_conj(rel_g[:, :4]), rel_e[:, :4]))
        drot = np.linalg.norm(np.asarray(lie.so3_log(drel)), axis=1)
        rpe_t = float(np.sqrt(np.mean(dtrans ** 2)))
        rpe_r = float(np.sqrt(np.mean(drot ** 2)))
    else:
        rpe_t = rpe_r = float("nan")

    return TrajectoryError(
        ate_rmse=float(np.sqrt(np.mean(err ** 2))),
        ate_mean=float(np.mean(err)),
        ate_median=float(np.median(err)),
        ate_max=float(np.max(err)),
        rpe_trans_rmse=rpe_t,
        rpe_rot_rmse=rpe_r,
        n_poses=len(err),
    )
