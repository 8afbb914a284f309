"""Map checkpoint / resume.

The reference's `SaveMap/LoadMap` is an unimplemented TODO
(`include/System.h:115-117`, SURVEY.md §5.4). Here the whole SLAM state is
three pytrees of arrays (MapState, TrackState, ObjectTable), so
checkpointing is a flat npz dump and resume is exact — this also powers
multi-host re-sharding (load then reshard with jax.device_put)."""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    for name, value in tree._asdict().items():
        out[f"{prefix}.{name}"] = np.asarray(value)
    return out


def save_state(path: str, system) -> None:
    """Serialize a pipeline.system.System's device state."""
    if hasattr(system, "_poll_gba"):
        system._poll_gba(blocking=True)   # fold in any in-flight GBA
    payload: Dict[str, Any] = {}
    payload.update(_flatten("map", system.map))
    payload.update(_flatten("objects", system.objects))
    ts = system.track._asdict()
    feats = ts.pop("last_feats")
    for k, v in ts.items():
        payload[f"track.{k}"] = np.asarray(v)
    payload.update(_flatten("track.last_feats", feats))
    payload["meta"] = np.frombuffer(json.dumps({
        "frame_id": system.frame_id,
        "n_keyframes": system.n_keyframes,
        "timestamps": system.timestamps,
        "trajectory": [p.tolist() for p in system.trajectory],
    }).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_state(path: str, system) -> None:
    """Restore into an existing System built with the same config."""
    import jax.numpy as jnp

    from eao_fusion_tpu.types import FrameFeatures

    z = np.load(path)

    def unflatten(prefix, template):
        vals = {}
        for name in template._fields:
            key = f"{prefix}.{name}"
            if key in z:
                vals[name] = jnp.asarray(z[key])
            else:
                # field added after the checkpoint was written: keep the
                # freshly initialized value (forward-compatible resume)
                vals[name] = getattr(template, name)
        return type(template)(**vals)

    system.map = unflatten("map", system.map)
    system.objects = unflatten("objects", system.objects)
    feats = unflatten("track.last_feats", system.track.last_feats)
    tvals = {}
    for name in system.track._fields:
        if name == "last_feats":
            tvals[name] = feats
        else:
            tvals[name] = jnp.asarray(z[f"track.{name}"])
    system.track = type(system.track)(**tvals)

    meta = json.loads(bytes(z["meta"]).decode())
    system.frame_id = meta["frame_id"]
    system.n_keyframes = meta["n_keyframes"]
    system.timestamps = meta["timestamps"]
    system.trajectory = [np.array(p, np.float32) for p in meta["trajectory"]]
    if system.loop_closer is not None:
        # rebuild bow vectors of stored keyframes
        for k in range(int(system.map.next_kf)):
            if bool(system.map.kf_valid[k]):
                system.loop_closer.add_keyframe_bow(system.map, k)
