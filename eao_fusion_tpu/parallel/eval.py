"""Data-parallel sequence evaluation (SURVEY.md §2.4 "data-parallel
evaluation").

The reference evaluates one dataset per process run (`ros_test/*.cc`
mains) and parallelism means launching several. Here the unit of data
parallelism is a *sequence*: each sequence's SLAM run is independent, so
N sequences are evaluated concurrently by pinning each run's device
arrays to a distinct device of the mesh (``jax.default_device``) and
driving every run from its own host thread. Device work overlaps across
chips (the per-thread GIL is released inside blocking device waits);
host-side orchestration stays Python-cheap because the per-frame path is
a handful of jitted calls.

On a single chip this degrades gracefully to time-slicing; on a CPU test
mesh (``--xla_force_host_platform_device_count``) runs land on distinct
virtual devices and the results are bit-identical to serial evaluation
(asserted in tests/test_parallel_eval.py).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.io import tum


@dataclass
class SequenceResult:
    name: str
    n_frames: int
    n_keyframes: int
    n_loops: int
    ate_rmse: float
    rpe_rmse: float
    device: str


def _run_one(make_seq: Callable, name: str, cfg: SystemConfig,
             device) -> SequenceResult:
    # import inside the worker: System pulls in the whole pipeline
    from eao_fusion_tpu.pipeline.system import System

    with jax.default_device(device):
        seq = make_seq()
        s = System(cfg)
        for f in seq.frames:
            boxes = getattr(f, "boxes", None) if cfg.use_objects else None
            s.process_frame(f.gray, f.depth, f.timestamp, boxes=boxes)
        est = s.trajectory_tcw(corrected=True)
        gt = np.stack([f.tcw for f in seq.frames])
        n = min(len(est), len(gt))
        err = tum.evaluate_ate_rpe(est[:n], gt[:n],
                                   with_scale=cfg.sensor == "mono")
    return SequenceResult(
        name=name, n_frames=n, n_keyframes=s.n_keyframes,
        n_loops=s.n_loops_closed, ate_rmse=float(err.ate_rmse),
        rpe_rmse=float(err.rpe_trans_rmse), device=str(device))


def evaluate_sequences(
        sequences: Sequence,   # (name, make_seq) pairs; make_seq() -> seq
        cfg: Optional[SystemConfig] = None,
        devices: Optional[Sequence] = None,
        max_workers: Optional[int] = None) -> List[SequenceResult]:
    """Evaluate every sequence, one SLAM run per device, concurrently.

    ``sequences`` holds ``(name, make_seq)`` pairs where ``make_seq`` is a
    zero-arg loader (loading inside the worker keeps frame arrays on the
    worker's device and overlaps IO with other runs' compute).
    """
    cfg = cfg or SystemConfig()
    devices = list(devices if devices is not None else jax.devices())
    max_workers = max_workers or len(devices)

    results: List[Optional[SequenceResult]] = [None] * len(sequences)
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = []
        for i, (name, make_seq) in enumerate(sequences):
            dev = devices[i % len(devices)]
            futs.append((i, pool.submit(_run_one, make_seq, name, cfg, dev)))
        for i, fut in futs:
            results[i] = fut.result()
    return results  # type: ignore[return-value]


def summarize(results: Sequence[SequenceResult]) -> str:
    lines = [f"{'sequence':24s} {'frames':>6s} {'KFs':>4s} {'loops':>5s} "
             f"{'ATE rmse':>9s} {'RPE rmse':>9s}  device"]
    for r in results:
        lines.append(f"{r.name:24s} {r.n_frames:6d} {r.n_keyframes:4d} "
                     f"{r.n_loops:5d} {r.ate_rmse * 100:8.2f}cm "
                     f"{r.rpe_rmse * 100:8.2f}cm  {r.device}")
    ates = np.array([r.ate_rmse for r in results])
    lines.append(f"{'mean':24s} {'':6s} {'':4s} {'':5s} "
                 f"{float(ates.mean()) * 100:8.2f}cm")
    return "\n".join(lines)
