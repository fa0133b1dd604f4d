"""Close the train->eval loop: train detector + recognizer from scratch on
synthetic rendered text, then score the COMPOSED engine on HELD-OUT pages.

This is the generalization proof the overfit training tests don't give
(tests/test_train_e2e.py, tests/test_charset_serving.py memorize one batch):
the recognizer trains on a pre-rendered pool and is scored on words it never
saw; the detector trains on rendered text pages and is scored on held-out
page layouts; evaluate_engine (utils/metrics) reports end-to-end detection
PRF + CER + word accuracy over IoU-matched pairs. Reference analog: the
retrain TODO at /root/reference/README.md:42 — the reference has no training
or evaluation at all.

Artifacts (committed):
  evals/synthetic_eval.json        metrics + configs + training curves
  evals/synthetic_weights/         the trained servable weights dir
  images/synthetic_annotated.png   3-panel annotated render of a held-out
                                   page with LEGIBLE transcripts

Usage: python scripts/train_eval_synthetic.py [--quick]
(--quick: tiny step counts, smoke only — the committed artifact came from a
full run; see the JSON's "args".)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smoke-scale run")
    ap.add_argument("--rec-steps", type=int, default=None)
    ap.add_argument("--det-steps", type=int, default=None)
    ap.add_argument("--pool", type=int, default=None, help="train pool size")
    ap.add_argument("--out", default=os.path.join(REPO, "evals"))
    ap.add_argument("--reuse-detector", action="store_true",
                    help="load detector weights from a previous run's "
                         "synthetic_weights instead of retraining")
    ap.add_argument("--embed", type=int, default=96,
                    help="recognizer embed_dim (128 = the Pallas kernels' "
                         "lane-aligned geometry; default 96 = the committed "
                         "artifact's)")
    ap.add_argument("--tag", default="",
                    help="suffix for output weight dir / eval json / render "
                         "(keeps the committed default-run artifacts "
                         "untouched)")
    args = ap.parse_args()
    rec_steps = args.rec_steps or (300 if args.quick else 16000)
    det_steps = args.det_steps or (100 if args.quick else 1500)
    pool_n = args.pool or (512 if args.quick else 16384)

    import jax

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
    from tuatara_tpu.tokenizer import Tokenizer
    from tuatara_tpu.train.run import (
        evaluate_recognizer, fit_detector, fit_recognizer,
    )
    from tuatara_tpu.utils.data import synthetic_text_pages, word_batch
    from tuatara_tpu.utils.image import annotate, save_image
    from tuatara_tpu.utils.metrics import char_error_rate, evaluate_engine
    from tuatara_tpu.utils.weights import save_weights_dir

    t_start = time.time()
    tok = Tokenizer()
    MAXLEN = 8
    # Small-but-real architectures: big enough to read, small enough that
    # the whole loop runs in minutes on one chip.
    craft_cfg = CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8),
    )
    parseq_cfg = ParseqConfig(embed_dim=args.embed, enc_depth=4, enc_heads=4,
                              dec_heads=4, max_label_length=MAXLEN)

    # ---- recognizer: pre-rendered pool -> minibatch steps ----------------
    print(f"rendering {pool_n}-word training pool...", flush=True)
    rng = np.random.default_rng(0)
    pool = word_batch(pool_n, tok, rng, max_length=MAXLEN, max_len=MAXLEN,
                      tight=True)
    print(f"training recognizer: {rec_steps} steps...", flush=True)
    import optax

    t0 = time.time()
    # k_perms=6 is the PARSEQ recipe and is LOAD-BEARING for serving: the
    # engine's cloze-refinement pass attends bidirectional context, and a
    # model trained l2r-only (k_perms=1) is WRECKED by it (measured:
    # held-out word_acc 0.68 -> 0.12 with refine on). Cosine decay for the
    # last-mile fit.
    rec_params, rec_losses = fit_recognizer(
        steps=rec_steps, batch_size=128,
        lr=optax.cosine_decay_schedule(1e-3, rec_steps, 1e-2),
        cfg=parseq_cfg, tokenizer=tok, data=pool, seed=1, k_perms=6)
    rec_train_s = time.time() - t0

    # Held-out words (fresh rng stream -> never-seen strings/renders).
    held = word_batch(512, tok, np.random.default_rng(777),
                      max_length=MAXLEN, max_len=MAXLEN, tight=True)
    acc, texts = evaluate_recognizer(rec_params, held, parseq_cfg, tok)
    rec_cer = char_error_rate(list(zip(texts, held["texts"])))
    # Also record the no-refinement greedy CER: the gap between the two is
    # the measured value of permutation training (an l2r-only model shows
    # refine-on >> refine-off CER; a k_perms=6 model shows refine helping).
    import dataclasses as _dc

    acc0, texts0 = evaluate_recognizer(
        rec_params, held, _dc.replace(parseq_cfg, refine_iters=0), tok)
    cer0 = char_error_rate(list(zip(texts0, held["texts"])))
    print(f"recognizer held-out: word_acc={acc:.3f} cer={rec_cer:.4f} "
          f"(no-refine: acc={acc0:.3f} cer={cer0:.4f}; "
          f"train {rec_train_s:.0f}s, final loss {rec_losses[-1]:.3f})",
          flush=True)

    # ---- detector: rendered text pages ----------------------------------
    PAGE = 256
    tag = f"_{args.tag}" if args.tag else ""
    weights_dir = os.path.join(args.out, "synthetic_weights" + tag)
    reuse_dir = os.path.join(args.out, "synthetic_weights")
    if args.reuse_detector and os.path.isdir(reuse_dir):
        from tuatara_tpu.utils.weights import load_weights_dir

        det_params, _ = load_weights_dir(reuse_dir)
        det_losses, det_train_s = [], 0.0
        print(f"reusing detector weights from {weights_dir}", flush=True)
    else:
        print(f"training detector: {det_steps} steps...", flush=True)
        drng = np.random.default_rng(2)
        page_pool = synthetic_text_pages(64, tok, drng, size=PAGE,
                                         words_per_page=8, max_len=MAXLEN)

        def det_data():
            idx = drng.integers(0, 64, 8)
            return {"pages": page_pool["pages"][idx],
                    "heat": page_pool["heat"][idx]}

        t0 = time.time()
        det_params, det_losses = fit_detector(
            steps=det_steps, cfg=craft_cfg, seed=2, data_fn=det_data,
            log_every=max(det_steps // 5, 1))
        det_train_s = time.time() - t0
        print(f"detector trained ({det_train_s:.0f}s, "
              f"final loss {det_losses[-1]:.4f})", flush=True)

    # ---- compose + save -------------------------------------------------
    os.makedirs(weights_dir, exist_ok=True)
    save_weights_dir(weights_dir, det_params, rec_params,
                     craft_config=craft_cfg, parseq_config=parseq_cfg,
                     charset=tok.charset)
    ocr_cfg = OcrConfig(canvas_size=PAGE, max_boxes=32, rec_buckets=(32,),
                        max_label_length=MAXLEN)
    engine = OcrEngine(ocr_cfg, weights_dir=weights_dir)

    # ---- end-to-end eval on HELD-OUT pages ------------------------------
    held_pages = synthetic_text_pages(16, tok, np.random.default_rng(888),
                                      size=PAGE, words_per_page=8,
                                      max_len=MAXLEN)
    imgs = [(p * 255).astype(np.uint8) for p in held_pages["pages"]]
    e2e = evaluate_engine(engine, imgs, held_pages["truths"],
                          iou_threshold=0.5)
    e2e_04 = evaluate_engine(engine, imgs, held_pages["truths"],
                             iou_threshold=0.4)
    print("end-to-end held-out:", json.dumps(e2e), flush=True)

    # ---- annotated render of one held-out page --------------------------
    res0 = engine.run(imgs[0])
    render = annotate(imgs[0], res0)
    render_path = os.path.join(REPO, "images",
                               f"synthetic_annotated{tag}.png")
    save_image(render_path, render)

    artifact = {
        "args": {"rec_steps": rec_steps, "det_steps": det_steps,
                 "pool": pool_n, "quick": bool(args.quick),
                 "embed": args.embed},
        "backend": str(jax.devices()[0]),
        "recognizer": {
            "config": {"embed_dim": parseq_cfg.embed_dim,
                       "enc_depth": parseq_cfg.enc_depth,
                       "max_label_length": MAXLEN},
            "heldout_words": len(texts),
            "word_acc": round(acc, 4),
            "cer": round(rec_cer, 4),
            "word_acc_no_refine": round(acc0, 4),
            "cer_no_refine": round(cer0, 4),
            "train_seconds": round(rec_train_s, 1),
            "loss_curve": [round(v, 4) for v in rec_losses],
        },
        "detector": {
            "train_seconds": round(det_train_s, 1),
            "loss_curve": [round(v, 4) for v in det_losses],
        },
        "end_to_end": {"heldout_pages": len(imgs),
                       "iou_0.5": e2e, "iou_0.4": e2e_04},
        "annotated_render": os.path.relpath(render_path, REPO),
        "wall_seconds": round(time.time() - t_start, 1),
    }
    os.makedirs(args.out, exist_ok=True)
    out_json = os.path.join(args.out, f"synthetic_eval{tag}.json")
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_json} and {render_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
