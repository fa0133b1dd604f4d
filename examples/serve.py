"""Serving-loop example: sustained OCR over a stream of page batches.

Demonstrates the production knobs the single-shot examples don't touch:
the persistent engine, warmup (compile before traffic), the pipelined
`run_stream` (H2D prefetch + speculative recognition + depth-2 in-flight
batches), mixed-size batching, line grouping, the cumulative serving
counters, and the opt-in int8 trunk.

Usage:
    python examples/serve.py page1.png page2.png ... [--weights DIR]
        [--batch 16] [--quantized] [--lines]

With one image given, it is replicated into a synthetic stream so the
pipeline still demonstrates sustained throughput.
"""

import argparse
import dataclasses
import time

import numpy as np

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import DEFAULT_CONFIG
from tuatara_tpu.utils.image import load_image


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=8,
                    help="stream length when replicating a single image")
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--calibrate", action="store_true",
                    help="with --quantized: freeze static int8 activation "
                         "scales from the first batch before the timed "
                         "stream (docs/PERFORMANCE.md §6)")
    ap.add_argument("--lines", action="store_true")
    args = ap.parse_args()

    cfg = DEFAULT_CONFIG
    if args.quantized:
        cfg = dataclasses.replace(cfg, quantized_serving=True)
    engine = OcrEngine(cfg, weights_dir=args.weights)

    if args.batch < 1 or args.batches < 1:
        ap.error("--batch and --batches must be >= 1")

    pages = [load_image(p, keep_gray=True) for p in args.images]
    shapes = {p.shape for p in pages}

    if args.calibrate:
        if not args.quantized:
            ap.error("--calibrate requires --quantized")
        # Static scales from real traffic: removes dynamic quantization's
        # per-forward abs-max reduces (~+20% quantized compute, measured).
        n = engine.calibrate([p[None] for p in pages])
        print(f"calibrated {n} layers from {len(pages)} page(s)")

    if len(shapes) > 1:
        # Mixed sizes: group-by-shape batching, original order preserved.
        engine.run_mixed(pages, max_batch=args.batch)  # untimed compile pass
        t0 = time.perf_counter()
        results = engine.run_mixed(pages, max_batch=args.batch)
        dt = time.perf_counter() - t0
        print(f"run_mixed: {len(pages)} pages, {len(shapes)} shapes, "
              f"{len(pages)/dt:.1f} pages/sec")
    else:
        # Same-shape stream: pipelined serving loop over ALL given pages
        # (padded by replication to fill the last batch).
        if len(pages) == 1:
            batches = [np.broadcast_to(
                pages[0], (args.batch,) + pages[0].shape).copy()] * args.batches
        else:
            batches = []
            for i in range(0, len(pages), args.batch):
                chunk = pages[i:i + args.batch]
                while len(chunk) < args.batch:
                    chunk.append(chunk[-1])
                batches.append(np.stack(chunk))
        # Warm up with a REAL batch (same rank/shape as the stream) so
        # compiles happen before the timed region.
        engine.run_pages(batches[0])
        t0 = time.perf_counter()
        stream = engine.run_stream(batches, prefetch=4, depth=2)
        dt = time.perf_counter() - t0
        results = stream[-1]
        n = sum(b.shape[0] for b in batches)
        print(f"run_stream: {n} pages in {dt:.2f}s = {n/dt:.1f} pages/sec")

    sample = results[0] if results and isinstance(results[0], list) else results
    if args.lines:
        from tuatara_tpu.ops.grouping import group_lines

        sample = group_lines(sample)
    for item in sample[:5]:
        print(item)
    print("engine.stats:", {k: round(v, 3) if isinstance(v, float) else v
                            for k, v in engine.stats.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
