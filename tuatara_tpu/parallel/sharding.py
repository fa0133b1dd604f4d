"""Sharded inference programs (SPMD over the device mesh).

Both OCR stages are embarrassingly parallel over their batch dimension; the
shardings below make XLA partition them across chips with all communication
(result all-gather) riding ICI:

* detection: page batch sharded over 'dp', CRAFT weights replicated;
* recognition: crop slab sharded over 'dp', PARSEQ weights replicated.

This is the whole distributed-communication story for inference — no
NCCL/MPI analog exists or is needed (SURVEY.md §5.8): the shardings are
declarative and the XLA partitioner emits the collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_pages(mesh: Mesh, pages):
    """Commit a page batch to the mesh, sharded over 'dp'."""
    return jax.device_put(pages, NamedSharding(mesh, P("dp")))


def sharded_ocr_programs(
    engine, mesh: Mesh, batch: int, h: int, w: int
) -> Tuple[Callable, Callable]:
    """Build (detect, recognize) programs sharded over `mesh`'s 'dp' axis.

    `batch` and every recognition bucket must be divisible by the dp size
    (the engine's run_pages pads to guarantee this when a mesh is attached).
    """
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    base_detect = engine._detect_fn(batch, h, w)
    detect = jax.jit(base_detect, in_shardings=(rep, dp))

    def recognize_for(n: int):
        base = engine._recognize_fn(n)
        return jax.jit(base, in_shardings=(rep, dp))

    return detect, recognize_for
