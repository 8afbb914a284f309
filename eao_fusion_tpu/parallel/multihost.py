"""Multi-host initialization for distributed global BA (SURVEY.md §2.4,
§5 "distributed comm backend").

The reference is single-process (std::thread concurrency only); this
framework targets TPU pods, where scaling past one host means
``jax.distributed`` process groups: every host runs the same program,
``jax.devices()`` becomes the global device list, and the ``lm``-sharded
collectives in :mod:`eao_fusion_tpu.parallel.dist_ba` ride ICI within a
slice and DCN across slices — XLA picks the transport from the mesh
layout, so the solver code is identical single-host and multi-host.

Design notes (how the mesh should be laid out across hosts):
  * The ``lm`` (landmark) axis carries the observation shards and the
    one psum of the reduced camera system per LM iteration. Keep it
    *innermost* (fastest-varying over devices) so the psum segments ride
    ICI within each host's slice and only the final combine crosses DCN.
  * The ``kf`` axis is reserved for keyframe-block sharding of very
    large pose graphs; if used, place it across hosts (outermost) — the
    pose-graph structure is block-sparse and exchanges far less data.

On TPU pods the coordinator/process topology is published via the
standard cluster env (``jax.distributed.initialize()`` auto-detects);
on CPU/GPU clusters the caller passes coordinator address + process
count explicitly. Single-process runs are a no-op, so every entry point
can call :func:`ensure_initialized` unconditionally.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax

_initialized = False


@dataclass(frozen=True)
class MultihostSpec:
    """Explicit process-group description (auto-detected on TPU pods)."""
    coordinator_address: Optional[str] = None   # "host:port"
    num_processes: Optional[int] = None
    process_id: Optional[int] = None

    @staticmethod
    def from_env() -> "MultihostSpec":
        """Read the conventional EAO_* overrides (useful on CPU/GPU
        clusters where JAX cannot auto-detect the topology)."""
        return MultihostSpec(
            coordinator_address=os.environ.get("EAO_COORDINATOR"),
            num_processes=_int_env("EAO_NUM_PROCESSES"),
            process_id=_int_env("EAO_PROCESS_ID"),
        )


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def ensure_initialized(spec: Optional[MultihostSpec] = None) -> bool:
    """Idempotently bring up the jax.distributed process group.

    Returns True when a multi-process group is active after the call,
    False for plain single-process runs (the common case — this is a
    no-op then, safe to call from any entry point).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    spec = spec if spec is not None else MultihostSpec.from_env()
    explicit = spec.coordinator_address is not None
    auto = os.environ.get("EAO_MULTIHOST", "0") == "1"
    if not (explicit or auto):
        return False
    jax.distributed.initialize(
        coordinator_address=spec.coordinator_address,
        num_processes=spec.num_processes,
        process_id=spec.process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own host-side orchestration
    (dataset IO, keyframe decisions, logging). Mirrors the reference's
    single main thread: tracking stays on one host; only the bulk
    solver fan-out is multi-host."""
    return jax.process_index() == 0


def global_device_count() -> int:
    return len(jax.devices())
