"""Command-line interface.

Equivalent of the reference's example binaries (examples/resume.cpp:7-12,
examples/table.cpp:7-11): positional `image [weights_dir] [outputs_dir]`
in the same argv order, plus flags the reference hardcodes. Prints one JSON
object per detected word; optionally writes the annotated render the demo
script produced (bindings/run_ocr.py:95-98).

    tuatara-ocr image.png ./weights ./outputs --annotate out.png
    python -m tuatara_tpu image.png
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tuatara-ocr",
        description="TPU-native two-stage OCR (CRAFT detect + PARSEQ recognize)",
    )
    p.add_argument("image", help="input image path")
    p.add_argument("weights_dir", nargs="?", default=None,
                   help="directory with craft.npz/parseq.npz (omit: random weights)")
    p.add_argument("outputs_dir", nargs="?", default=None,
                   help="accepted for reference-CLI parity; unused")
    p.add_argument("--annotate", metavar="PNG",
                   help="write a 3-panel annotated render (boxes/text/reading order)")
    p.add_argument("--json-out", metavar="FILE", help="write results as a JSON file")
    p.add_argument("--canvas-size", type=int, default=None)
    p.add_argument("--text-threshold", type=float, default=None)
    p.add_argument("--link-threshold", type=float, default=None)
    p.add_argument("--low-text", type=float, default=None)
    p.add_argument("--box-mode", choices=["axis", "rotated"], default=None)
    p.add_argument("--decode-mode", choices=["greedy", "beam", "nar"],
                   default=None)
    p.add_argument("--beam-size", type=int, default=None)
    p.add_argument("--channel-mode", choices=["python", "cpp", "rgb"], default=None)
    p.add_argument("--encoder-impl", choices=["xla", "pallas"], default=None,
                   help="recognizer encoder lowering: pallas = fused "
                        "VMEM-resident ViT-block kernel (~2x on v5e, "
                        "bf16-class divergence, TPU-only); default xla")
    p.add_argument("--decode-impl", choices=["xla", "pallas"], default=None,
                   help="greedy AR decode lowering: pallas = fused "
                        "VMEM-resident decode kernel (memory K/V + cache "
                        "in VMEM across all steps; bf16-class divergence, "
                        "TPU-only); default xla")
    p.add_argument("--latency", action="store_true",
                   help="single-image latency preset (OcrConfig.latency): "
                        "exact-fit /32 detect canvas instead of the "
                        "256-bucket, finer recognition buckets, fused "
                        "Pallas recognizer kernels; explicit flags still "
                        "override. One compile per page geometry.")
    p.add_argument("--quantized", action="store_true",
                   help="int8 detector + recognizer encoder (~2x quantized-"
                        "layer MXU rate; not bit-parity with the bf16 path "
                        "— see config.py)")
    p.add_argument("--calibrate", action="store_true",
                   help="with --quantized and a weights_dir: freeze static "
                        "int8 activation scales from this image and save "
                        "them as calibration.npz next to the weights (later "
                        "runs auto-load them; docs/PERFORMANCE.md §6)")
    p.add_argument("--charset", choices=["standard", "extended", "reference"],
                   default=None,
                   help="recognizer decode table: standard 94-char PARSEQ, "
                        "extended (+space, for a space-aware retrain), or "
                        "the reference's bug-compatible 95-char table; "
                        "default = the charset stored next to the weights, "
                        "else standard")
    p.add_argument("--blocks", action="store_true",
                   help="group words into paragraph/block hierarchy "
                        "(lines joined by vertical adjacency + horizontal "
                        "overlap; implies line grouping)")
    p.add_argument("--lines", action="store_true",
                   help="group words into line-level hierarchy "
                        "(one JSON object per line, with member words)")
    p.add_argument("--eval", metavar="TRUTH_JSON",
                   help="score the word results against ground truth and "
                        "print {precision, recall, f1, cer, word_acc} to "
                        "stderr: a FUNSD annotation file (has a 'form' key) "
                        "or a plain [{text, bbox}] list (utils/metrics.py)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    # Flag-combination checks run BEFORE any engine work: construction
    # costs a weight load + jit warmup, and the error must come from the
    # parser instance that parsed the args.
    if args.calibrate and not (args.quantized and args.weights_dir):
        parser.error("--calibrate requires --quantized and a weights_dir")
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(name)s %(levelname)s %(message)s",
    )

    import dataclasses

    from tuatara_tpu.api import get_engine
    from tuatara_tpu.config import DEFAULT_CONFIG
    from tuatara_tpu.utils.image import annotate, load_image, save_image

    overrides = {
        k: v
        for k, v in {
            "canvas_size": args.canvas_size,
            "text_threshold": args.text_threshold,
            "link_threshold": args.link_threshold,
            "low_text": args.low_text,
            "box_mode": args.box_mode,
            "decode_mode": args.decode_mode,
            "beam_size": args.beam_size,
            "channel_mode": args.channel_mode,
            "encoder_impl": args.encoder_impl,
            "decode_impl": args.decode_impl,
            "quantized_serving": True if args.quantized else None,
        }.items()
        if v is not None
    }
    if args.charset:
        from tuatara_tpu.tokenizer import EXTENDED_CHARSET, STANDARD_CHARSET

        if args.charset == "extended":
            overrides["charset"] = EXTENDED_CHARSET
        elif args.charset == "standard":
            overrides["charset"] = STANDARD_CHARSET
        else:
            overrides["reference_charset"] = True
    if args.latency:
        from tuatara_tpu.config import OcrConfig

        config = OcrConfig.latency(**overrides)
    else:
        config = dataclasses.replace(DEFAULT_CONFIG, **overrides)

    image = load_image(args.image)
    engine = get_engine(config, args.weights_dir)
    if args.calibrate:
        engine.calibrate(image[None])
        print(f"calibration -> {engine.save_calibration()}", file=sys.stderr)
    t0 = time.perf_counter()
    results = engine.run(image, args.outputs_dir)
    if args.eval:
        # Score the WORD-level results (grouping below is display-only).
        from tuatara_tpu.utils.metrics import evaluate_page

        with open(args.eval) as f:
            truth = json.load(f)
        if isinstance(truth, dict) and "form" in truth:
            from tuatara_tpu.utils.data import load_funsd_annotations

            truth = load_funsd_annotations(args.eval)
        scores = evaluate_page(results, truth)
        print("eval: " + json.dumps(
            {k: round(v, 4) if isinstance(v, float) else v
             for k, v in scores.items()}), file=sys.stderr)
    if args.lines or args.blocks:
        from tuatara_tpu.ops.grouping import group_blocks, group_lines

        results = group_lines(results)
        if args.blocks:
            results = group_blocks(results)
    elapsed = time.perf_counter() - t0

    for r in results:
        print(json.dumps(r))
    print(f"Elapsed time: {elapsed:.3f} seconds ({len(results)} boxes)",
          file=sys.stderr)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    if args.annotate:
        save_image(args.annotate, annotate(image, results))
        print(f"annotated render -> {args.annotate}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
