"""Worker for the 2-process jax.distributed test (spawned by
tests/test_multihost.py, one process per rank). Runs the observation-
sharded distributed GBA over the GLOBAL 4-device mesh (2 processes x 2
virtual CPU devices) with gloo collectives and writes rank 0's solution
for the parent test to compare against the single-process solver.

Usage: python tests/multihost_worker.py RANK OUT_DIR COORD_PORT
"""

import os
import sys

rank = int(sys.argv[1])
out_dir = sys.argv[2]
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["EAO_COORDINATOR"] = f"localhost:{port}"
os.environ["EAO_NUM_PROCESSES"] = "2"
os.environ["EAO_PROCESS_ID"] = str(rank)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eao_fusion_tpu.parallel import multihost  # noqa: E402


def main():
    spec = multihost.MultihostSpec.from_env()
    assert multihost.ensure_initialized(spec), "process group did not form"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()
    assert multihost.is_primary() == (rank == 0)

    from jax.sharding import Mesh
    from eao_fusion_tpu.parallel import dist_ba
    from tests.test_ba import CAM, CFG, make_ba_problem

    # identical problem on every process (same seed) — each process can
    # therefore serve any shard of the global arrays
    r = np.random.default_rng(3)
    prob, cams_gt, pts_gt = make_ba_problem(r, n_pts=256, noise_px=0.2)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("lm",))
    res = dist_ba.distributed_bundle_adjust(prob, mesh, cam=CAM, cfg=CFG,
                                            n_iters=12)
    # cam_pose is replicated (shard_map out_specs P()): every process's
    # first addressable shard carries the full value
    cam_pose = np.asarray(res.cam_pose.addressable_shards[0].data)
    chi2 = float(np.asarray(res.chi2.addressable_shards[0].data))
    if rank == 0:
        np.savez(os.path.join(out_dir, "mh_result.npz"),
                 cam_pose=cam_pose, chi2=chi2)
    print(f"rank {rank}: done chi2={chi2:.3f}", flush=True)


if __name__ == "__main__":
    main()
