"""Device mesh construction.

TPU-native replacement for the reference's only parallelism — a 6-thread host
pool consuming mutex-guarded 4-crop chunks (tuatara.cpp:450-475, SURVEY.md
§5.8). Here the parallel axes are a `jax.sharding.Mesh` over TPU chips:

* 'dp' — data parallel: page batch (detection) and crop batch (recognition)
  shard across chips; XLA all-gathers results over ICI.
* 'tp' — tensor parallel: transformer weight shards (training / large-model
  serving layouts; see train/trainer.py).

On the v5e-4 inference target the mesh is 1-D ('dp', 4) and "chunks of 4
crops across 6 threads" becomes "one padded crop slab sharded across 4
chips".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("dp",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices devices.

    With multiple axes and no explicit shape, 'dp' takes all devices not
    consumed by the trailing axes (which default to 1).
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.array(devs).reshape(shape), axes)
