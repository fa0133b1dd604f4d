"""Train PRODUCTION-config CRAFT + PARSEQ to servable accuracy on
TrueType-rendered synthetic data, and commit the weights.

This is the round-5 "system, not just framework" run (VERDICT.md #2): the
prior committed weights are toy-scale (d96/d128, held-out e2e word-acc
70.6%/38.9%, evals/synthetic_eval*.json). Two things changed to make a
servable model reachable:

* **Data**: `style="font"` renders words with the installed DejaVu TrueType
  family at realistic sizes (utils/data.render_word) instead of PIL's ~7x11
  bitmap font, whose 'O'/'0', 'l'/'I'/'1' ambiguity floors accuracy.
* **Optimization**: warmup + cosine decay, global-norm clipping, adamw — the
  toy-run recipe (flat 1e-3 adam) trained d128 WORSE than d96
  (evals/synthetic_eval_d128.json); production width needs the standard
  ViT stability recipe.

Architectures are the FULL reference-parity configs — CraftConfig() (VGG16-BN
U-Net) and ParseqConfig() (ViT-S d384 x12, max_label_length 25) — so the
committed weights serve the bench's production-geometry programs directly
(reference analog: the TorchScript artifacts tuatara.cpp:333-336,426-432
that zero egress makes unreachable here).

Artifacts:
  evals/production_weights/        servable weights dir (engine-loadable)
  evals/production_eval.json       held-out word + e2e page metrics
  images/production_annotated.png  3-panel annotated held-out render

Usage: python scripts/train_production.py [--quick]
(--quick: smoke-scale; the committed artifact's args are in the JSON.)
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--peak-lr", type=float, default=6e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--maxlen", type=int, default=12,
                    help="max rendered word length for the recognizer pool "
                         "(eval reports both <=8 — comparable to prior "
                         "artifacts — and <=maxlen held-out accuracy)")
    ap.add_argument("--out", default=os.path.join(REPO, "evals"))
    ap.add_argument("--tag", default="production")
    ap.add_argument("--resume", action="store_true",
                    help="warm-start the recognizer from the last _rec_ckpt")
    ap.add_argument("--reuse-detector", action="store_true")
    ap.add_argument("--rec-only", action="store_true",
                    help="stop after the recognizer held-out eval (pilot "
                         "mode); writes a partial eval JSON")
    args = ap.parse_args()
    rec_steps = args.rec_steps or (300 if args.quick else 40000)
    det_steps = args.det_steps or (60 if args.quick else 4000)
    pool_n = args.pool or (512 if args.quick else 131072)

    import jax
    import optax

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
    from tuatara_tpu.tokenizer import Tokenizer
    from tuatara_tpu.train.run import (
        evaluate_recognizer, fit_detector, fit_recognizer,
    )
    from tuatara_tpu.utils.data import synthetic_text_pages, word_batch
    from tuatara_tpu.utils.image import annotate, save_image
    from tuatara_tpu.utils.metrics import char_error_rate, evaluate_engine
    from tuatara_tpu.utils.weights import (
        load_params, save_params, save_weights_dir,
    )

    t_start = time.time()
    tok = Tokenizer()
    craft_cfg = CraftConfig() if not args.quick else CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8))
    parseq_cfg = ParseqConfig() if not args.quick else ParseqConfig(
        embed_dim=96, enc_depth=2, enc_heads=4, dec_heads=4)
    weights_dir = os.path.join(args.out, f"{args.tag}_weights")
    os.makedirs(weights_dir, exist_ok=True)
    ckpt_path = os.path.join(weights_dir, "_rec_ckpt.npz")
    ckpt_meta = os.path.join(weights_dir, "_rec_ckpt.json")

    # ---- recognizer: compact uint8 pool + background refresher ----------
    # A fixed float pool is a memorization trap at production width (ViT-S
    # d384 drove an 8k-pool to loss 0.02 with 4.7% held-out word-acc —
    # round-5 pilot). Three diversity levers, sized to this host's single
    # CPU core: a LARGE uint8-grayscale pool (12x smaller rows -> renders
    # ~2x faster), per-step ON-DEVICE photometric + translation jitter
    # (train.run._augment_gray_u8), and a daemon thread that keeps
    # re-rendering pool rows with fresh words while the device trains
    # (the host is idle during each ~180 ms step).
    import threading

    from tuatara_tpu.utils.data import word_pool

    print(f"rendering {pool_n}-word uint8 pool (maxlen {args.maxlen})...",
          flush=True)
    t0 = time.time()
    pool = word_pool(pool_n, tok, np.random.default_rng(0),
                     max_length=parseq_cfg.max_label_length,
                     max_len=args.maxlen)
    print(f"pool rendered in {time.time() - t0:.0f}s", flush=True)

    pool_lock = threading.Lock()
    stop_refresh = threading.Event()
    fresh_count = [0]

    def refresher():
        rrng = np.random.default_rng(123456)
        chunk = 64
        while not stop_refresh.is_set():
            tmp = word_pool(chunk, tok, rrng,
                            max_length=parseq_cfg.max_label_length,
                            max_len=args.maxlen)
            start = int(rrng.integers(0, pool_n - chunk))
            with pool_lock:
                for k in ("crops_u8", "labels", "lengths"):
                    pool[k][start:start + chunk] = tmp[k]
            fresh_count[0] += chunk

    refresh_thread = threading.Thread(target=refresher, daemon=True)
    refresh_thread.start()

    srng = np.random.default_rng(42)

    def batch_iter():
        while True:
            idx = srng.integers(0, pool_n, args.batch)
            with pool_lock:
                yield {"crops": pool["crops_u8"][idx],
                       "labels": pool["labels"][idx],
                       "lengths": pool["lengths"][idx]}

    init_params, done_steps = None, 0
    if args.resume and os.path.isfile(ckpt_path):
        init_params = load_params(ckpt_path)
        with open(ckpt_meta) as f:
            done_steps = json.load(f)["step"]
        print(f"resuming recognizer from step {done_steps}", flush=True)
    remaining = max(rec_steps - done_steps, 0)

    def ckpt(step, params, _opt):
        save_params(ckpt_path, jax.device_get(params))
        with open(ckpt_meta, "w") as f:
            json.dump({"step": done_steps + step, "total": rec_steps}, f)
        print(f"  ckpt @ step {done_steps + step}/{rec_steps} "
              f"({time.time() - t_start:.0f}s, {fresh_count[0]} rows "
              f"refreshed)", flush=True)

    rec_losses: list = []
    rec_train_s = 0.0
    rec_params = init_params
    if remaining:
        # On resume the schedule restarts over the remaining budget (fresh
        # adam moments; brief re-warmup) — crash insurance, not exact resume.
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.peak_lr, min(args.warmup, remaining // 2 + 1),
            remaining, args.peak_lr / 10)
        print(f"training recognizer: {remaining} steps "
              f"(d{parseq_cfg.embed_dim} x{parseq_cfg.enc_depth}, "
              f"batch {args.batch}, peak lr {args.peak_lr})...", flush=True)
        t0 = time.time()
        rec_params, rec_losses = fit_recognizer(
            steps=remaining, batch_size=args.batch, lr=lr, cfg=parseq_cfg,
            tokenizer=tok, data_iter=batch_iter(), seed=1, k_perms=6,
            grad_clip=1.0, weight_decay=0.01, init_params=init_params,
            log_every=max(remaining // 40, 1),
            ckpt_every=2000, ckpt_fn=ckpt)
        rec_train_s = time.time() - t0
    stop_refresh.set()
    print(f"pool rows re-rendered during training: {fresh_count[0]} "
          f"({fresh_count[0] + pool_n} unique words total)", flush=True)

    # Held-out words, fresh rng streams. The <=8 set is comparable to the
    # committed toy artifacts; the <=maxlen set covers the training range.
    def heldout(max_len, seed):
        held = word_batch(512, tok, np.random.default_rng(seed),
                          max_length=parseq_cfg.max_label_length,
                          max_len=max_len, style="font")
        acc, texts = evaluate_recognizer(rec_params, held, parseq_cfg, tok)
        cer = char_error_rate(list(zip(texts, held["texts"])))
        return acc, cer

    acc8, cer8 = heldout(8, 777)
    accL, cerL = heldout(args.maxlen, 778)
    print(f"recognizer held-out: word_acc<=8={acc8:.3f} cer={cer8:.4f} | "
          f"word_acc<={args.maxlen}={accL:.3f} cer={cerL:.4f} "
          f"(train {rec_train_s:.0f}s)", flush=True)
    if args.rec_only:
        with open(os.path.join(args.out, f"{args.tag}_eval.json"), "w") as f:
            json.dump({"rec_only": True,
                       "args": vars(args),
                       "word_acc_len8": round(acc8, 4),
                       "cer_len8": round(cer8, 4),
                       f"word_acc_len{args.maxlen}": round(accL, 4),
                       "rec_train_s": round(rec_train_s, 1),
                       "loss_curve": [round(v, 4) for v in rec_losses]},
                      f, indent=1)
        return 0

    # ---- detector: full VGG16-BN on TrueType pages -----------------------
    PAGE = 256
    det_ckpt = os.path.join(weights_dir, "_det_ckpt.npz")
    if args.reuse_detector and os.path.isfile(det_ckpt):
        det_params = load_params(det_ckpt)
        det_losses, det_train_s = [], 0.0
        print("reusing detector checkpoint", flush=True)
    else:
        print(f"training detector: {det_steps} steps (full VGG16-BN)...",
              flush=True)
        drng = np.random.default_rng(2)
        page_pool = synthetic_text_pages(192, tok, drng, size=PAGE,
                                         words_per_page=8, max_len=8,
                                         style="font")

        def det_data():
            idx = drng.integers(0, 192, 8)
            return {"pages": page_pool["pages"][idx],
                    "heat": page_pool["heat"][idx]}

        t0 = time.time()
        det_params, det_losses = fit_detector(
            steps=det_steps, cfg=craft_cfg, seed=2, data_fn=det_data,
            lr=optax.warmup_cosine_decay_schedule(
                0.0, 1e-3, min(200, det_steps // 2 + 1), det_steps, 1e-4),
            log_every=max(det_steps // 10, 1))
        det_train_s = time.time() - t0
        save_params(det_ckpt, jax.device_get(det_params))
        print(f"detector trained ({det_train_s:.0f}s, "
              f"final loss {det_losses[-1]:.4f})", flush=True)

    # ---- compose + save -------------------------------------------------
    save_weights_dir(weights_dir, det_params, rec_params,
                     craft_config=craft_cfg, parseq_config=parseq_cfg,
                     charset=tok.charset)
    ocr_cfg = OcrConfig(canvas_size=PAGE, max_boxes=32, rec_buckets=(32,),
                        max_label_length=parseq_cfg.max_label_length)
    engine = OcrEngine(ocr_cfg, weights_dir=weights_dir)

    # ---- end-to-end eval on HELD-OUT pages ------------------------------
    held_pages = synthetic_text_pages(16, tok, np.random.default_rng(888),
                                      size=PAGE, words_per_page=8,
                                      max_len=8, style="font")
    imgs = [(p * 255).astype(np.uint8) for p in held_pages["pages"]]
    e2e = evaluate_engine(engine, imgs, held_pages["truths"],
                          iou_threshold=0.5)
    print("end-to-end held-out:", json.dumps(e2e), flush=True)

    res0 = engine.run(imgs[0])
    render = annotate(imgs[0], res0)
    render_path = os.path.join(REPO, "images", f"{args.tag}_annotated.png")
    save_image(render_path, render)

    artifact = {
        "args": {"rec_steps": rec_steps, "det_steps": det_steps,
                 "pool": pool_n, "batch": args.batch,
                 "peak_lr": args.peak_lr, "warmup": args.warmup,
                 "maxlen": args.maxlen, "quick": bool(args.quick),
                 "style": "font"},
        "backend": str(jax.devices()[0]),
        "recognizer": {
            "config": {"embed_dim": parseq_cfg.embed_dim,
                       "enc_depth": parseq_cfg.enc_depth,
                       "max_label_length": parseq_cfg.max_label_length},
            "heldout_words": 512,
            "word_acc_len8": round(acc8, 4),
            "cer_len8": round(cer8, 4),
            f"word_acc_len{args.maxlen}": round(accL, 4),
            f"cer_len{args.maxlen}": round(cerL, 4),
            "train_seconds": round(rec_train_s, 1),
            "loss_curve": [round(v, 4) for v in rec_losses],
        },
        "detector": {
            "train_seconds": round(det_train_s, 1),
            "loss_curve": [round(v, 4) for v in det_losses],
        },
        "end_to_end": {"heldout_pages": len(imgs), "iou_0.5": e2e},
        "annotated_render": os.path.relpath(render_path, REPO),
        "wall_seconds": round(time.time() - t_start, 1),
    }
    out_json = os.path.join(args.out, f"{args.tag}_eval.json")
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_json} and {render_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
