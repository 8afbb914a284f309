"""Data-parallel evaluation (SURVEY.md §2.4) and multi-host init gating."""

import numpy as np
import pytest

from eao_fusion_tpu.config import MapCapacity, ORBConfig, SystemConfig
from eao_fusion_tpu.io import synthetic
from eao_fusion_tpu.parallel import eval as peval
from eao_fusion_tpu.parallel import multihost


def _cfg():
    return SystemConfig(
        orb=ORBConfig(n_features=400, max_keypoints=512),
        capacity=MapCapacity(max_keyframes=32, max_points=4096),
        use_planes=False, use_objects=False)


def _loader(n, seed, style, dn=0.0):
    def make():
        return synthetic.generate_sequence(
            n_frames=n, seed=seed, style=style, depth_noise=dn,
            cache_dir=synthetic.DEFAULT_CACHE)
    return make


@pytest.mark.slow
def test_parallel_matches_serial():
    """Concurrent per-device runs produce the same trajectories/errors as
    one-at-a-time evaluation (determinism across devices + threads)."""
    seqs = [("arc12", _loader(12, 0, "arc")),
            ("arc12n", _loader(12, 5, "arc", dn=0.01)),
            ("fwd15", _loader(15, 3, "forward"))]
    cfg = _cfg()
    par = peval.evaluate_sequences(seqs, cfg)
    ser = [peval._run_one(mk, name, cfg, peval.jax.devices()[0])
           for name, mk in seqs]
    assert len(par) == 3
    devs = {r.device for r in par}
    assert len(devs) == 3, f"expected 3 distinct devices, got {devs}"
    for rp, rs in zip(par, ser):
        assert rp.name == rs.name and rp.n_frames == rs.n_frames
        assert rp.n_keyframes == rs.n_keyframes
        np.testing.assert_allclose(rp.ate_rmse, rs.ate_rmse, atol=1e-6)
        assert rp.ate_rmse < 0.02, (rp.name, rp.ate_rmse)
    print(peval.summarize(par))


def test_multihost_noop_without_env(monkeypatch):
    monkeypatch.delenv("EAO_MULTIHOST", raising=False)
    monkeypatch.delenv("EAO_COORDINATOR", raising=False)
    assert multihost.ensure_initialized() is False
    assert multihost.is_primary()
    assert multihost.global_device_count() >= 1


def test_multihost_spec_from_env(monkeypatch):
    monkeypatch.setenv("EAO_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("EAO_NUM_PROCESSES", "4")
    monkeypatch.setenv("EAO_PROCESS_ID", "2")
    spec = multihost.MultihostSpec.from_env()
    assert spec.coordinator_address == "10.0.0.1:1234"
    assert spec.num_processes == 4 and spec.process_id == 2
