"""Serving-config accuracy parity on TRAINED weights: XLA vs the Pallas
kernels, plus the documented-trade configs (int8 detector, NAR decode).

VERDICT r4 #3: the round-4 parity evidence rode a weak model (d128,
word_acc 0.39 — near-ties everywhere, so "accuracy-preserving" was thin).
This re-runs the measurement on the strong production weights: 16 held-out
TrueType synthetic pages, every engine scored against ground truth
(utils/metrics.evaluate_engine) AND against the XLA reference engine's
transcripts (exact agreement + diff list).

Usage:
  python scripts/eval_parity_configs.py [--weights evals/production_weights]
                                        [--out evals/parity_production.json]
Writes the JSON artifact; prints a summary.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def transcripts(engine, imgs):
    out = []
    for im in imgs:
        res = engine.run(im)
        out.append([(r["text"],
                     tuple(round(v, 1) for v in r["bbox"])) for r in res])
    return out


def agreement(ref, other):
    """Exact transcript agreement over bbox-matched results."""
    same = diff = 0
    diffs = []
    for rp, op in zip(ref, other):
        rmap = {b: t for t, b in rp}
        omap = {b: t for t, b in op}
        for b, t in rmap.items():
            if b in omap:
                if omap[b] == t:
                    same += 1
                else:
                    diff += 1
                    if len(diffs) < 20:
                        diffs.append({"xla": t, "other": omap[b]})
    total = same + diff
    return (same / total if total else 1.0), total, diffs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights",
                    default=os.path.join(REPO, "evals", "production_weights"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "evals",
                                         "parity_production.json"))
    ap.add_argument("--pages", type=int, default=16)
    args = ap.parse_args()

    import jax

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig
    from tuatara_tpu.utils.data import synthetic_text_pages
    from tuatara_tpu.utils.metrics import evaluate_engine

    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,))
    engines = {
        "xla": cfg,
        "pallas": dataclasses.replace(cfg, encoder_impl="pallas",
                                      decode_impl="pallas"),
        "int8_dynamic": dataclasses.replace(cfg, quantized_serving=True),
        "nar": dataclasses.replace(cfg, decode_mode="nar"),
        # The shipped fast preset (bench headline): calibrated-int8
        # detector + Pallas kernels + sorted slabs, at this eval's page
        # geometry. THIS row is the accuracy evidence config.production()
        # cites.
        "production": OcrConfig.production(
            canvas_size=256, max_boxes=32, rec_buckets=(32,)),
        # The round-5 bench headline: production() + rec_width=64 on the
        # width-64-finetuned weights (a DIFFERENT finetuned model, so
        # transcript agreement vs xla is informative, not a kernel-parity
        # bound — the ground-truth word_acc/f1 row is the accuracy
        # evidence; evals/production_w64_eval.json has the held-out
        # training eval).
        "production_w64": OcrConfig.production(
            rec_width=64, canvas_size=256, max_boxes=32, rec_buckets=(32,)),
    }
    w64_weights = os.path.join(REPO, "evals", "production_weights_w64")
    per_name_weights = {"production_w64": w64_weights}
    ref_eng = OcrEngine(engines["xla"], weights_dir=args.weights)
    held = synthetic_text_pages(args.pages, ref_eng.tokenizer,
                                np.random.default_rng(888), size=256,
                                words_per_page=8, max_len=8, style="font")
    imgs = [(p * 255).astype(np.uint8) for p in held["pages"]]

    artifact = {
        "what": ("serving-config accuracy parity on trained weights "
                 f"({os.path.relpath(args.weights, REPO)}), "
                 f"{args.pages} held-out TrueType synthetic pages"),
        "backend": str(jax.devices()[0]),
        "configs": {},
    }
    ref_tr = None
    for name, c in engines.items():
        try:
            eng = (ref_eng if name == "xla"
                   else OcrEngine(c, weights_dir=per_name_weights.get(
                       name, args.weights)))
            if name.startswith("production"):  # int8_dynamic stays dynamic
                eng.calibrate(np.stack(imgs))
            scores = evaluate_engine(eng, imgs, held["truths"],
                                     iou_threshold=0.5)
            tr = transcripts(eng, imgs)
            entry = {"word_acc": round(scores["word_acc"], 4),
                     "cer": round(scores["cer"], 4),
                     "f1": round(scores["f1"], 4),
                     "matched": scores["matched"]}
            if name == "xla":
                ref_tr = tr
            else:
                agree, total, diffs = agreement(ref_tr, tr)
                entry["transcript_agreement_vs_xla"] = round(agree, 4)
                entry["compared"] = total
                if diffs:
                    entry["diffs"] = diffs
            artifact["configs"][name] = entry
            print(name, json.dumps(entry), flush=True)
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            artifact["configs"][name] = {
                "error": f"{type(e).__name__}: {e}"[:200]}
            print(name, "ERROR", e, flush=True)

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
