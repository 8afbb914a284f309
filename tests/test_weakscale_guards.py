"""Guards for the 2-host weak-scaling efficiency model (round-4 verdict
weak #5 / item 8).

NOTES_R4's 0.89 two-host efficiency is a MODEL anchored on measured
inputs: (a) per-iteration communication = one [C,6,C,6] f32 psum of the
reduced camera system S (9.44 MB at C=256) + the [C,6] rhs + chi2
scalars, and (b) per-device local work that halves with the device count
(obs partition balance <= 1.01). These tests pin both inputs so the
model cannot silently drift: the psum payload is read from the LOWERED
program itself (stablehlo all_reduce shapes), and the per-device
local-work ratio n=1 vs n=8 comes from XLA's compiled cost analysis
(deterministic FLOPs, immune to shared-core wall-clock noise on the
virtual CPU mesh)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eao_fusion_tpu.parallel import dist_ba
from tests.test_ba import CAM, CFG, make_ba_problem

C, P_PTS, N = 256, 16384, 1024


def _production_problem():
    r = np.random.default_rng(0)
    prob, _, _ = make_ba_problem(r, n_cams=C, n_pts=P_PTS, n_slots=N,
                                 noise_px=0.3, sample_obs=True)
    return prob


def _mesh(n_dev):
    return Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev), ("lm",))


@pytest.mark.slow
def test_psum_payload_matches_model():
    """The model's DCN term assumes 9.44 MB of S per LM iteration. Read
    the actual all_reduce operand shapes out of the lowered sharded
    program: the largest must be exactly [C,6,C,6] f32 = 9.44 MB, and no
    other all_reduce may move more than the [C,6] rhs + scalars."""
    prob = _production_problem()
    mesh = _mesh(8)

    traced = []   # capture the jitted shard program by lowering manually

    # distributed_bundle_adjust builds + runs; lower the same computation
    # by calling it through jax.jit(...).lower via a thin wrapper
    import eao_fusion_tpu.parallel.dist_ba as mod
    obs = mod.partition_observations(prob, 8)

    # the observation partition is host-side numpy, so the problem's
    # structural fields must stay CONCRETE under tracing: only the pose
    # input is traced
    def run(eps):
        p = prob._replace(cam_pose=prob.cam_pose + eps)
        return mod.distributed_bundle_adjust(p, mesh, cam=CAM, cfg=CFG,
                                             n_iters=2, obs=obs).chi2

    txt = jax.jit(run).lower(jnp.float32(0.0)).as_text()
    # stablehlo.all_reduce carries a reduction REGION; its result type
    # appears lines later as `}) : (tensor<...>) -> tensor<...>` — scan
    # forward from each all_reduce to its closing type annotation
    sizes = []
    lines = txt.splitlines()
    for i, line in enumerate(lines):
        if "stablehlo.all_reduce" not in line:
            continue
        for j in range(i, min(i + 40, len(lines))):
            m = re.search(r"->\s*tensor<(?:([0-9x]+)x)?(f32|i32)>",
                          lines[j])
            if m:
                dims = ([int(d) for d in m.group(1).split("x")]
                        if m.group(1) else [])
                sizes.append(int(np.prod(dims)) * 4 if dims else 4)
                break
    assert sizes, "no all_reduce found in the lowered program"
    s_bytes = C * 6 * C * 6 * 4            # 9.44 MB
    assert max(sizes) == s_bytes, (max(sizes), s_bytes)
    # everything else is rhs [C,6] or scalar-sized
    others = [s for s in sizes if s != s_bytes]
    assert all(s <= C * 6 * 4 for s in others), sorted(others)[-3:]


@pytest.mark.slow
def test_per_device_work_scales():
    """Per-device local work must drop ~n-fold from n=1 to n=8 (the model
    sets efficiency = t1 / (n * (t1/n + solve + comm))). Guarded two
    ways, both deterministic: (a) the observation partition balance at
    n=8 (max/mean <= 1.02), (b) XLA's compiled per-program FLOP count,
    ratio n=1 : n=8 >= 6 (it is < 8 because the dense 6C-dim solve and
    the plane/LM bookkeeping are replicated — exactly the Amdahl terms
    the model charges)."""
    prob = _production_problem()

    obs8 = dist_ba.partition_observations(prob, 8)
    per_dev = np.asarray(obs8.valid).sum(axis=1)
    assert per_dev.max() / per_dev.mean() <= 1.02

    flops = {}
    for n_dev in (1, 8):
        mesh = _mesh(n_dev)

        obs_n = dist_ba.partition_observations(prob, n_dev)

        def run(eps):
            p = prob._replace(cam_pose=prob.cam_pose + eps)
            return dist_ba.distributed_bundle_adjust(
                p, mesh, cam=CAM, cfg=CFG, n_iters=2, obs=obs_n).chi2

        compiled = jax.jit(run).lower(jnp.float32(0.0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        assert ca and "flops" in ca, ca
        flops[n_dev] = float(ca["flops"])
    ratio = flops[1] / flops[8]
    assert ratio >= 6.0, (flops, ratio)
