"""Map-sharded full-pipeline step: the LIVE map pytree partitioned over the
device mesh.

This makes the map-sharding layer (SURVEY.md §2.4a) real for the running
pipeline, not just the BA solver: every point-table array is placed on the
``lm`` mesh axis and every keyframe-table array on the ``kf`` axis via
`NamedSharding`, and the full steady-state SLAM step (`pipeline/steady.py`:
ORB extraction, plane segmentation, tracking's two masked-MXU matching
matmuls + pose GN, the EAO object lane, and the keyframe branch with local
BA under `lax.cond`) is jitted with those shardings. XLA GSPMD partitions
the compute — the [F, P] Hamming score matmul, the [K, P] observation-
indicator products, the Schur assembly — and inserts the ICI collectives
(the scaling-book recipe: pick a mesh, annotate, let XLA place collectives).

The reference has no counterpart (single process, mutex-shared map); the
semantics being sharded are its `Map` accessors (`src/Map.cc:54-101`).

Used by `__graft_entry__.dryrun_multichip` (full-step multi-chip dryrun)
and `tests/test_sharded_step.py` (agreement vs the unsharded step on the
8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eao_fusion_tpu.config import SystemConfig
from eao_fusion_tpu.mapping import map_state as ms
from eao_fusion_tpu.pipeline import steady


def map_shardings(mesh: Mesh) -> ms.MapState:
    """Per-field NamedSharding for MapState: point tables over ``lm``,
    keyframe tables over ``kf``, the [K, P] observation indicator over
    both, small plane tables and counters replicated."""
    lm = NamedSharding(mesh, P("lm"))
    kf = NamedSharding(mesh, P("kf"))
    both = NamedSharding(mesh, P("kf", "lm"))
    repl = NamedSharding(mesh, P())
    fields = {}
    for f in ms.MapState._fields:
        if f == "obs_ind":
            fields[f] = both
        elif f.startswith("pt_"):
            fields[f] = lm
        elif f.startswith("kf_"):
            fields[f] = kf
        else:                       # pl_* plane tables, next_* counters
            fields[f] = repl
    return ms.MapState(**fields)


def steady_shardings(mesh: Mesh) -> steady.SteadyState:
    """Prefix-pytree of shardings for the SteadyState carry: the map is
    sharded per map_shardings; track state, object table (small), last
    frame objects, and counters are replicated."""
    repl = NamedSharding(mesh, P())
    return steady.SteadyState(m=map_shardings(mesh), ts=repl, objs=repl,
                              last_fo=repl, frame_id=repl, key=repl)


def shard_state(st: steady.SteadyState, mesh: Mesh) -> steady.SteadyState:
    """Place an existing (host/single-device) SteadyState onto the mesh."""
    sh = steady_shardings(mesh)
    m = ms.MapState(*(jax.device_put(x, s)
                      for x, s in zip(st.m, map_shardings(mesh))))
    put = functools.partial(jax.device_put, device=sh.ts)
    return steady.SteadyState(m=m, ts=jax.tree.map(put, st.ts),
                              objs=jax.tree.map(put, st.objs),
                              last_fo=jax.tree.map(put, st.last_fo),
                              frame_id=jax.device_put(st.frame_id, sh.ts),
                              key=jax.device_put(st.key, sh.ts))


def make_sharded_slam_step(mesh: Mesh, cfg: SystemConfig,
                           kf_every: int = 0):
    """jit of the FULL slam_step with the map pytree sharded over the mesh.
    Returns fn(st, gray, depth, boxes, timestamp) -> (st, diag); frame
    inputs are replicated (every device sees the frame; the landmark-axis
    work shards)."""
    repl = NamedSharding(mesh, P())
    fn = functools.partial(steady.slam_step.__wrapped__, cfg=cfg,
                           kf_every=kf_every)
    return jax.jit(fn,
                   in_shardings=(steady_shardings(mesh), repl, repl, repl,
                                 repl),
                   out_shardings=(steady_shardings(mesh), None))


def make_sharded_slam_chunk(mesh: Mesh, cfg: SystemConfig,
                            kf_every: int = 0):
    """Sharded variant of steady.slam_chunk (lax.scan over a frame chunk):
    one dispatch per chunk with the map resident sharded across the mesh."""
    repl = NamedSharding(mesh, P())
    fn = functools.partial(steady.slam_chunk.__wrapped__, cfg=cfg,
                           kf_every=kf_every)
    return jax.jit(fn,
                   in_shardings=(steady_shardings(mesh), repl, repl, repl,
                                 repl),
                   out_shardings=(steady_shardings(mesh), None))
