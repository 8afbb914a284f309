"""2-process jax.distributed exercise of multihost.ensure_initialized +
the observation-sharded distributed GBA (round-3 verdict item 4c: the
multi-process path had only been tested as a single-process no-op).

Spawns two REAL processes (2 virtual CPU devices each -> a 4-device global
mesh, gloo collectives) running tests/multihost_worker.py, then compares
rank 0's camera solution against the single-device solver in THIS process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_gba(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU tunnel in the workers
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
         str(rank), str(tmp_path), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for rank in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    z = np.load(tmp_path / "mh_result.npz")
    mh_pose = z["cam_pose"]

    # single-process reference on the same problem
    from eao_fusion_tpu.solvers import ba
    from tests.test_ba import CAM, CFG, cam_rmse, make_ba_problem
    r = np.random.default_rng(3)
    prob, cams_gt, _ = make_ba_problem(r, n_pts=256, noise_px=0.2)
    res_s = ba.bundle_adjust(prob, cam=CAM, cfg=CFG, pt_chunk=64,
                             n_iters1=6, n_iters2=6)
    assert cam_rmse(mh_pose, cams_gt) < 2e-3
    assert cam_rmse(mh_pose, res_s.cam_pose) < 2e-3
