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
    engine, mesh: Mesh, batch: int, h: int, w: int, channels: int = 3
) -> Tuple[Callable, Callable]:
    """Build (detect, recognize_for) programs sharded over `mesh`'s 'dp' axis.

    detect(craft_params, images[B,H,W,C]) -> {"bbox","valid","rects","count"}
    recognize_for(bucket)(parseq_params, images, det["rects"], det["valid"])
        -> (ids, conf) — the fused lazy-crop + PARSEQ program over the live
    bucket (detection emits crop rects, not crops; see api._crop_recognize_fn).

    `batch` and every recognition bucket must be divisible by the dp size
    (the engine's run_pages pads to guarantee this when a mesh is attached).
    Prefer `OcrEngine(..., mesh=mesh)`, which applies these shardings on the
    hot path itself; this helper exposes the same programs for direct use.
    """
    if engine.mesh is not mesh:
        raise ValueError(
            "construct the engine with mesh=mesh — the engine's stage "
            "programs carry their dp shardings themselves"
        )
    detect = engine._detect_fn(batch, h, w, channels)

    def recognize_for(bucket: int):
        return engine._crop_recognize_fn(
            batch, engine.config.max_boxes, bucket, h, w, channels)

    return detect, recognize_for
