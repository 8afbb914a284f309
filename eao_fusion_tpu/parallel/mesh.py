"""Device mesh construction for the map-sharding layer (SURVEY.md §2.4).

Axes:
  * ``lm``  (landmark): map points / plane / object landmarks are sharded
    here; the Schur-complement reduction psums over it.
  * ``kf``  (keyframe): reserved for keyframe-block sharding of very large
    pose graphs (global BA on multi-host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_landmark: Optional[int] = None, n_kf: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_landmark is None:
        n_landmark = len(devices) // n_kf
    devs = np.array(devices[: n_landmark * n_kf]).reshape(n_landmark, n_kf)
    return Mesh(devs, axis_names=("lm", "kf"))


def landmark_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("lm"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
