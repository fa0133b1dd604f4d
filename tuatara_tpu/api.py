"""Engine + public API: image in -> word boxes + transcripts out.

TPU-native replacement for the reference's single god-function
`image_to_data` (tuatara.cpp:314-512). Architectural differences, all
deliberate (SURVEY.md §7):

* Models are loaded/initialized ONCE per engine and stay device-resident
  (the reference reloads both TorchScript files from disk on every call —
  tuatara.cpp:333-340, 423-432).
* The whole detection stage — resize/pad, CRAFT forward, heatmap
  post-processing, box fitting, coordinate scaling and crop extraction — is
  ONE jitted program per input shape; heatmaps, labels and crops never leave
  HBM. Crops come out compacted (valid-first) so recognition runs on the
  smallest bucket that covers the live box count.
* Recognition is a single batched PARSEQ program over the crop slab (the
  reference runs 4-crop chunks on 6 host threads — tuatara.cpp:450-475; here
  the batch dimension is the parallelism, and shards over a device mesh via
  tuatara_tpu.parallel).
* Greedy token ids are computed on device; only (ids, bbox, count) cross
  back to the host, where the tokenizer assembles strings.

Error handling: typed exceptions in place of the reference's
print-and-return-empty (tuatara.cpp:315-347) — ValueError for bad inputs,
FileNotFoundError for missing weights.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig, DEFAULT_CONFIG
from tuatara_tpu.models.craft import craft_forward, fold_batchnorms, init_craft_params
from tuatara_tpu.models.parseq import init_parseq_params, parseq_forward
from tuatara_tpu.ops.boxes import extract_boxes, scale_boxes, tesseract_bbox
from tuatara_tpu.ops.resize import detect_canvas, pad32, resize_geometry
from tuatara_tpu.ops.warp import (
    crop_rects,
    extract_crops_batched,
    extract_crops_perspective_batched,
)
from tuatara_tpu.tokenizer import Tokenizer

logger = logging.getLogger("tuatara_tpu")


def _canvas_prep(image, cfg):
    """Detector canvas prep for ONE page [H, W, C] -> [canvas_h, canvas_w, C].

    Grayscale pages arrive as [H, W, 1]: H2D carries 3x fewer bytes and the
    canvas is built single-channel (3x less pad/cast traffic); the channel
    broadcast happens inside craft_forward, last, fusing into conv1_1's
    input. Results are bit-exact vs an RGB transfer up to bf16 rounding: on
    an R=G=B image the BGR flip is the identity, so it is skipped outright
    (it cost ~6 ms/batch as a full-res fp32 reverse at serving shapes).

    This is the ONE canvas-prep implementation — the serving detect program
    and `OcrEngine.calibrate` both call it, so calibration always observes
    exactly the inputs serving feeds the detector (a drifted copy would
    silently mis-scale the static activation ranges)."""
    gray = image.shape[-1] == 1
    canvas, _, _ = detect_canvas(image, cfg)
    if not gray and cfg.channel_mode == "python":
        canvas = canvas[..., ::-1]
    return canvas[0]


class OcrEngine:
    """Persistent two-stage OCR engine (CRAFT detect + PARSEQ recognize)."""

    def __init__(
        self,
        config: OcrConfig = DEFAULT_CONFIG,
        craft_config: Optional[CraftConfig] = None,
        parseq_config: Optional[ParseqConfig] = None,
        weights_dir: Optional[str] = None,
        seed: int = 0,
        mesh=None,
        compilation_cache: Optional[str] = "auto",
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'dp' axis; when given,
        page batches and crop slabs shard across it (tuatara_tpu.parallel).

        `compilation_cache`: persistent XLA compile-cache directory. The
        stage programs are large; caching across processes cuts cold start
        from minutes to seconds. "auto" = ~/.cache/tuatara_tpu_xla_tpu on
        TPU only (CPU AOT entries are machine-feature specific and compiles
        are cheap); None = never touch the process-global setting; a path =
        use it. Only applied when no cache dir is already configured."""
        if compilation_cache is not None and jax.config.jax_compilation_cache_dir is None:
            import os

            if compilation_cache != "auto":
                jax.config.update("jax_compilation_cache_dir", compilation_cache)
            elif jax.default_backend() == "tpu":
                jax.config.update(
                    "jax_compilation_cache_dir",
                    os.path.expanduser("~/.cache/tuatara_tpu_xla_tpu"),
                )
        self.mesh = mesh
        self.config = config
        # Model architecture resolution: explicit arg > the config stored
        # next to the weights (save_weights_dir / the converter write it) >
        # reference defaults. Without this, loading weights of a non-default
        # architecture would build a mismatched forward and fail deep inside
        # the model.
        stored_craft = stored_parseq = stored_charset = None
        if weights_dir:
            from tuatara_tpu.utils import weights as W

            stored_craft, stored_parseq, stored_charset = W.load_configs(weights_dir)
        self.craft_config = craft_config or stored_craft or CraftConfig()
        self.parseq_config = parseq_config or stored_parseq or ParseqConfig(
            max_label_length=config.max_label_length
        )
        if config.encoder_impl is not None or config.decode_impl is not None:
            # Serving-level lowering overrides (OcrConfig.encoder_impl /
            # decode_impl) applied to the resolved ParseqConfig.
            import dataclasses as _dc

            repl = {}
            if config.encoder_impl is not None:
                repl["encoder_impl"] = config.encoder_impl
            if config.decode_impl is not None:
                repl["decode_impl"] = config.decode_impl
            self.parseq_config = _dc.replace(self.parseq_config, **repl)
        # Tokenizer table resolution: explicit OcrConfig.charset > explicit
        # reference_charset=True (bug-compat mode is a user request — it
        # must not be silently overridden by a table persisted next to the
        # weights) > the charset persisted by save_weights_dir > standard
        # default. Serving a retrained recognizer (e.g. EXTENDED_CHARSET
        # with space — the reference's own TODO, README.md:42) only works
        # when the decode table matches the head.
        charset = config.charset
        if charset is None and not config.reference_charset:
            charset = stored_charset
        if charset is not None:
            self.tokenizer = Tokenizer(charset=charset)
        else:
            self.tokenizer = Tokenizer(reference_charset=config.reference_charset)
        # The recognizer head has parseq_config.num_tokens classes; every
        # emitted id indexes the tokenizer's itos table positionally. A size
        # mismatch means systematic misdecoding (shifted space/BOS/PAD slots)
        # or itos index errors — fail at construction, not per transcript.
        # Exception: bug-compat mode (reference_charset=True, no explicit
        # table) deliberately pairs the reference's oversized 95-char table
        # with a standard 94-class head; that off-by-one IS the documented
        # reference behavior (SURVEY quirk 8), so only require that the
        # table covers the head.
        n_tokens = self.parseq_config.num_tokens
        bug_compat = charset is None and config.reference_charset
        ok = (self.tokenizer.vocab_size >= n_tokens) if bug_compat \
            else (self.tokenizer.vocab_size == n_tokens)
        if not ok:
            raise ValueError(
                f"tokenizer/recognizer mismatch: the recognizer head emits "
                f"{n_tokens} classes (ParseqConfig.charset_size="
                f"{self.parseq_config.charset_size}) but the resolved decode "
                f"table has {self.tokenizer.vocab_size} entries "
                f"({len(self.tokenizer.charset)} chars). Pass "
                f"OcrConfig(charset=...) matching the training charset, or "
                f"persist it via save_weights_dir(..., charset=...)"
            )

        # Crop-geometry consistency: the crop program resizes every box to
        # (rec_height, rec_width); the recognizer's patch/pos-embed geometry
        # is ParseqConfig.img_size. A mismatch would feed the encoder a
        # wrong-length token sequence (shape error deep in the slab program)
        # — refuse at construction with the fix spelled out.
        if tuple(self.parseq_config.img_size) != (config.rec_height,
                                                  config.rec_width):
            raise ValueError(
                f"crop/recognizer geometry mismatch: OcrConfig rec_height/"
                f"rec_width = ({config.rec_height}, {config.rec_width}) but "
                f"the resolved ParseqConfig.img_size is "
                f"{tuple(self.parseq_config.img_size)}. Set OcrConfig("
                f"rec_width=...) to the recognizer's trained crop width "
                f"(e.g. the half-width serving preset pairs rec_width=64 "
                f"with weights trained at img_size=(32, 64))."
            )

        if weights_dir:
            craft_p, parseq_p = W.load_weights_dir(weights_dir)
            self.craft_params = jax.device_put(craft_p)
            self.parseq_params = jax.device_put(parseq_p)
            logger.info("loaded weights from %s", weights_dir)
        else:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            self.craft_params = init_craft_params(k1, self.craft_config)
            self.parseq_params = init_parseq_params(k2, self.parseq_config)
            logger.warning(
                "no weights_dir given: engine initialized with RANDOM weights "
                "(transcripts will be meaningless; throughput is unaffected)"
            )
        # Serving-path optimization: fold BN into conv weights (identical
        # outputs up to fp rounding; idempotent on already-folded trees).
        self.craft_params = fold_batchnorms(
            self.craft_params, eps=self.craft_config.bn_eps
        )
        # NOTE: fusing the encoder's q/k/v projections into one matmul
        # (parseq.fuse_parseq_encoder, bit-identical outputs) was measured
        # SLOWER on v5e — 23.9 -> 25.5 ms per 256-crop encoder pass, stable
        # across interleaved repeats; XLA already overlaps the split
        # projections and the fused [B,L,3D] output pays extra slice/layout
        # copies. The transform stays available but is not applied
        # (docs/PERFORMANCE.md dead-end table).
        if config.quantized_serving:
            from tuatara_tpu.models.craft import quantize_craft_trunk
            from tuatara_tpu.models.parseq import quantize_parseq_encoder

            # Opt-in int8 serving (~2x MXU rate on the quantized layers;
            # NOT bit-parity — threshold-adjacent boxes / low-margin
            # transcripts can differ, see quantize_craft_trunk).
            self.craft_params = quantize_craft_trunk(self.craft_params)
            if self.parseq_config.encoder_impl == "pallas":
                # COMPOSED fast path: int8 detector + bf16 Pallas recognizer.
                # The fused bf16 encoder/decode kernels measure FASTER than
                # the int8 XLA recognizer (0.079 vs 0.134 ms/crop at 256
                # crops, docs/PERFORMANCE.md), so quantizing the encoder here
                # would only disable the Pallas gate and slow recognition
                # down. The detector trunk still quantizes (and calibrates).
                logger.info(
                    "quantized_serving + encoder_impl='pallas': detector "
                    "serves int8, recognizer serves the (faster) bf16 "
                    "Pallas kernels — encoder left unquantized")
            else:
                self.parseq_params = quantize_parseq_encoder(
                    self.parseq_params)
            # Calibrated static activation scales persisted next to the
            # weights (engine.save_calibration) overlay the freshly
            # quantized trees — serving starts reduce-free without a
            # re-calibration pass.
            if weights_dir:
                import os

                from tuatara_tpu.utils import weights as W

                calib = os.path.join(weights_dir, W.CALIB_FILE)
                if os.path.isfile(calib):
                    c_sx, p_sx = W.load_calibration(calib)
                    n = W.apply_static_scales(self.craft_params, c_sx)
                    if "wq" in self.parseq_params["patch_embed"]:
                        n += W.apply_static_scales(self.parseq_params, p_sx)
                    elif p_sx:
                        # Composed config (Pallas bf16 recognizer): encoder
                        # scales saved under the XLA-quantized config are
                        # inapplicable — the encoder isn't quantized here.
                        logger.info(
                            "ignoring %d recognizer calibration scales "
                            "(encoder serves the bf16 Pallas kernels)",
                            len(p_sx))
                    logger.info(
                        "loaded %d calibrated activation scales from %s",
                        n, calib)
        if self.parseq_config.encoder_impl == "pallas":
            from tuatara_tpu.models.parseq import prestack_pallas_encoder

            # Pre-stack the Pallas encoder kernel's block weights once so
            # serving programs don't re-trace the 12-block concat+cast
            # (~21 MB HBM traffic per forward; see parseq.parseq_encode).
            self.parseq_params = prestack_pallas_encoder(
                self.parseq_params, self.parseq_config)
        if self.parseq_config.decode_impl == "pallas":
            from tuatara_tpu.models.parseq import prestack_pallas_decoder

            # Ditto for the fused decode kernel's bundle (incl. the
            # [T, V, D] content K/V table; ops/pallas/decode.py).
            self.parseq_params = prestack_pallas_decoder(
                self.parseq_params, self.parseq_config)
        self.weights_dir = weights_dir

        self._detect_fns: Dict[Tuple[int, int, int, int], Any] = {}
        self._recognize_fns: Dict[int, Any] = {}
        self._slab_fns: Dict[Tuple[int, int, int], Any] = {}
        self._unsort_fns: Dict[int, Any] = {}
        self.last_timings: Dict[str, float] = {}
        # Cumulative serving counters since construction / reset_stats():
        # pages, batches, boxes, per-stage seconds, speculation hit/miss.
        self.stats: Dict[str, float] = self._fresh_stats()
        # Speculative-recognition state, keyed by the full batch geometry
        # (b, h, w, c) -> last bucket served for that shape (see run_pages —
        # lets the dispatch chain skip the count round-trip). Keying by
        # geometry (not just batch size) keeps interleaved mixed-shape
        # workloads (run_mixed) speculating each shape at ITS OWN steady
        # bucket: a single global pair let shape A's bucket drive shape B's
        # speculative program, compiling fresh (shape, bucket) combinations
        # mid-serve. Size is bounded by the compiled-program cache's own
        # shape ladder, so no eviction is needed.
        self._spec: Dict[Tuple[int, int, int, int], int] = {}

    # ------------------------------------------------------------------
    # Stage programs (compiled once per shape, cached)
    # ------------------------------------------------------------------

    def _detect_fn(self, batch: int, h: int, w: int, channels: int = 3):
        key = (batch, h, w, channels)
        if key in self._detect_fns:
            return self._detect_fns[key]

        cfg = self.config
        if cfg.tiled_detection and cfg.mag_ratio * max(h, w) > cfg.canvas_size:
            fn = self._build_tiled_detect(batch, h, w)
            self._detect_fns[key] = fn
            return fn
        ccfg = self.craft_config
        from tuatara_tpu.ops.resize import canvas_shape

        canvas_h, canvas_w, ch, cw, ratio = canvas_shape(h, w, cfg)
        ch2, cw2 = ch // cfg.ratio_net, cw // cfg.ratio_net
        hm_h, hm_w = canvas_h // cfg.ratio_net, canvas_w // cfg.ratio_net
        content_mask = (
            (jnp.arange(hm_h) < ch2)[:, None] & (jnp.arange(hm_w) < cw2)[None, :]
        )

        dtype = jnp.dtype(cfg.compute_dtype)

        def prep(image):
            return _canvas_prep(image, cfg)

        def postproc(score_map):
            out = extract_boxes(score_map[:, :, 0], score_map[:, :, 1],
                                content_mask, cfg)
            if cfg.box_mode == "rotated":
                # Rectification path (the improvement the reference TODO'd:
                # it fits rotated rects but crops axis-aligned —
                # tuatara.cpp:416): bbox = AABB of the rotated corners, like
                # rotated_rect_to_tesseract_format (tuatara.cpp:256-274); the
                # corners feed the lazy perspective-warp crop program.
                scaled_c = scale_boxes(out["corners"], ratio, cfg)
                bbox = tesseract_bbox(jnp.concatenate(
                    [scaled_c.min(axis=1), scaled_c.max(axis=1)], axis=-1))
                rects = scaled_c  # [K, 4, 2] corners
            else:
                scaled = scale_boxes(out["boxes"], ratio, cfg)
                bbox = tesseract_bbox(scaled)
                rects = crop_rects(scaled, h, w)  # [K, 4] crop windows
            # Compact: valid boxes first, preserving component (raster) order.
            # Crops are NOT materialized here: the recognition program
            # extracts only the live bucket's crops (lazy crop extraction) —
            # warping all max_boxes slots per page wastes compute and HBM
            # when pages are sparse.
            order = jnp.argsort(~out["valid"], stable=True)
            return {
                "bbox": bbox[order],
                "valid": out["valid"][order],
                "rects": rects[order],
                "count": out["count"],
            }

        batched_postproc = jax.vmap(postproc)
        if self.mesh is not None:
            # Postproc is embarrassingly page-parallel, but under plain
            # GSPMD two artifacts couple the devices: the CC fixpoint
            # while-loop's convergence predicate is all-reduced EVERY
            # iteration (a batched while's condition reduces over the
            # global batch), and top_k's sort is all-gathered and re-run
            # replicated on every device (conservative sort partitioning).
            # shard_map over dp makes both device-local: each device labels
            # only its own pages and loops to ITS convergence. The conv
            # trunk stays GSPMD (it partitions cleanly). Proven collective-
            # free by the dryrun's HLO assert (__graft_entry__.py).
            from jax.sharding import PartitionSpec as P

            batched_postproc = jax.shard_map(
                batched_postproc, mesh=self.mesh,
                in_specs=P("dp"), out_specs=P("dp"), check_vma=False)

        def detect(params, images):
            if images.ndim == 3:  # [B, H, W] grayscale -> [B, H, W, 1]
                images = images[..., None]
            # CRAFT runs on the REAL batch (not per-page inside the vmap):
            # the fused stage-1 Pallas kernel pipelines over (batch x row
            # tiles), and XLA's conv tiling prefers the true batch dim too.
            canvases = jax.vmap(prep)(images)
            scores, _ = craft_forward(params, canvases, ccfg,
                                      compute_dtype=dtype)
            return batched_postproc(scores)

        detect = self._jit(detect)
        self._detect_fns[key] = detect
        return detect

    def _build_tiled_detect(self, batch: int, h: int, w: int):
        """Detection program for pages larger than the canvas: overlapping
        canvas-sized tiles through CRAFT (tile dim = batch), heatmaps
        max-blended back to full resolution (ops/tiling.py), identical
        post-processing. The page is NOT downscaled (ratio = mag_ratio)."""
        from tuatara_tpu.ops.tiling import extract_tiles, stitch_heatmaps
        from tuatara_tpu.ops.resize import pad32

        cfg = self.config
        ccfg = self.craft_config
        tile = cfg.canvas_size
        th, tw = int(h * cfg.mag_ratio), int(w * cfg.mag_ratio)
        ratio = cfg.mag_ratio
        ch, cw = pad32(th, cfg.size_multiple), pad32(tw, cfg.size_multiple)
        ph, pw = max(ch, tile), max(cw, tile)
        hm_h, hm_w = ph // cfg.ratio_net, pw // cfg.ratio_net
        content_mask = (
            (jnp.arange(hm_h) < ch // cfg.ratio_net)[:, None]
            & (jnp.arange(hm_w) < cw // cfg.ratio_net)[None, :]
        )

        def one_page(params, image):
            # Gray pages: resample/pad single-channel, skip the (identity)
            # BGR flip, broadcast to RGB last; identity resample skipped and
            # the pad run on the input dtype — see the untiled one_page /
            # detect_canvas.
            gray = image.shape[-1] == 1
            c = image.shape[-1]
            x = image
            if (th, tw) != (h, w):
                x = jax.image.resize(x.astype(jnp.float32), (th, tw, c),
                                     "bilinear")
            x = jnp.pad(x, ((0, ph - th), (0, pw - tw), (0, 0)))
            x = x.astype(jnp.float32) / 255.0
            if gray:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            elif cfg.channel_mode == "python":
                x = x[..., ::-1]
            tiles, coords = extract_tiles(x, tile, cfg.tile_overlap, cfg.ratio_net)
            # allow_fused=False: this runs under the per-page vmap, which
            # the fused stage-1 kernel's manual-DMA grid does not batch.
            scores, _ = craft_forward(params, tiles, ccfg,
                                      compute_dtype=jnp.dtype(cfg.compute_dtype),
                                      allow_fused=False)
            stitched = stitch_heatmaps(scores, coords, hm_h, hm_w, cfg.ratio_net)
            out = extract_boxes(stitched[:, :, 0], stitched[:, :, 1],
                                content_mask, cfg)
            scaled = scale_boxes(out["boxes"], ratio, cfg)
            bbox = tesseract_bbox(scaled)
            rects = crop_rects(scaled, h, w)
            order = jnp.argsort(~out["valid"], stable=True)
            return {
                "bbox": bbox[order],
                "valid": out["valid"][order],
                "rects": rects[order],
                "count": out["count"],
            }

        def detect(params, images):
            if images.ndim == 3:  # [B, H, W] grayscale -> [B, H, W, 1]
                images = images[..., None]
            return jax.vmap(lambda im: one_page(params, im))(images)

        return self._jit(detect)

    def _jit(self, fn):
        sh = self._shardings()
        return jax.jit(fn) if sh is None else jax.jit(fn, in_shardings=sh)

    def _shardings(self):
        """(replicated params, dp-sharded batch) when a mesh is attached."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P("dp")))

    @property
    def dp_size(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape.get("dp", 1)

    def _recognize_body(self, params, crops):
        """Crops [N, rec_h, rec_w, 3] in [0,1] -> (ids [N, T], conf [N])."""
        pcfg = self.parseq_config
        mode = self.config.decode_mode
        beam = self.config.beam_size
        dtype = jnp.dtype(self.config.compute_dtype)
        if mode == "beam":
            from tuatara_tpu.models.parseq import parseq_beam_decode, parseq_encode

            memory = parseq_encode(params, crops, pcfg, compute_dtype=dtype)
            ids, logp = parseq_beam_decode(params, memory, pcfg, beam,
                                           compute_dtype=dtype)
            # logp is the UNnormalized sum of token log-probs of the
            # winning beam (selection uses GNMT length normalization
            # internally), so exp(logp) is a true sequence probability —
            # the same semantics as greedy's product of per-step probs.
            return ids, jnp.exp(logp)
        logits = parseq_forward(params, crops, pcfg, compute_dtype=dtype,
                                ar=(mode != "nar"))
        ids = jnp.argmax(logits, axis=-1)
        # Sequence confidence: product of per-position max softmax prob
        # up to (and including) the first EOS.
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1)
        eos = ids == 0
        before_eos = jnp.cumsum(eos.astype(jnp.int32), axis=-1) - eos.astype(jnp.int32) == 0
        conf = jnp.prod(jnp.where(before_eos, pmax, 1.0), axis=-1)
        return ids, conf

    def _recognize_fn(self, n: int):
        """Recognition over a pre-extracted crop slab (bench/warmup path)."""
        if n in self._recognize_fns:
            return self._recognize_fns[n]
        body = self._recognize_body
        if self.mesh is not None:
            # Per-crop work is independent: shard_map over dp keeps the AR
            # decode's batch-EOS early-exit while_loop DEVICE-LOCAL (under
            # plain GSPMD its "all sequences done?" predicate is all-reduced
            # every decode step) and lets each device stop at its own
            # shard's longest word. Params replicated, slab dp-sharded —
            # collective-free (asserted by the dryrun HLO check).
            from jax.sharding import PartitionSpec as P

            body = jax.shard_map(
                body, mesh=self.mesh, in_specs=(P(), P("dp")),
                out_specs=P("dp"), check_vma=False)
        recognize = self._jit(body)
        self._recognize_fns[n] = recognize
        return recognize

    def _crop_fn(self, b: int, k: int, bucket: int,
                 h: int, w: int, channels: int):
        """Lazy crop-extraction program (page-shape keyed, cheap compile).

        (images [B,H,W,C] uint8, rects [B,K,4] or corners [B,K,4,2],
        valid [B,K]) -> (crops [bucket, rec_h, rec_w, 3] in [0,1],
        inv [bucket] i32): `inv[j]` is the slab row holding the j-th live
        crop in (page, slot) raster order — identity when
        rec_sort_by_width is off, the unsort permutation otherwise (see
        OcrConfig.rec_sort_by_width; _finalize's span decoding assumes
        raster order, so sorted slabs are unsorted by _unsort_fn before
        results leave the device chain).

        Crops are extracted ONLY for the live bucket: detection's box budget
        is max_boxes per page, but real pages rarely fill it, so warping all
        B*K slots (the eager design) wastes both MXU time and a
        [B,K,rec_h,rec_w,3] HBM slab. The program compacts (page, slot)
        raster-order live rects across the batch, gathers each row's source
        page IN UINT8 (the fp32 cast happens inside the per-row warp, fused
        into the sampling matmuls — gathering pre-cast fp32 pages would
        materialize bucket full-page duplicates, gigabytes on dense batches),
        and warps just those crops.
        """
        key = (b, k, bucket, h, w, channels)
        if key in self._slab_fns:
            return self._slab_fns[key]
        cfg = self.config
        rotated = cfg.box_mode == "rotated" and not (
            cfg.tiled_detection and cfg.mag_ratio * max(h, w) > cfg.canvas_size
        )
        rh, rw = cfg.rec_height, cfg.rec_width

        def crop(images, rects, valid):
            if images.ndim == 3:  # [B, H, W] grayscale
                images = images[..., None]
            flat_valid = valid.reshape(-1)
            if cfg.rec_sort_by_width:
                # Sort live crops by aspect ratio (width/height of the
                # source box ≈ character count at the fixed crop height):
                # decode tiles become length-homogeneous so the fused
                # kernel's tile-level early exit stops at each tile's own
                # max length. Invalid slots sort last (key = +inf), same
                # as the raster path's argsort(~valid).
                if rotated:
                    c = rects.reshape(b * k, 4, 2)
                    e1 = jnp.sum((c[:, 1] - c[:, 0]) ** 2, axis=-1)
                    e2 = jnp.sum((c[:, 2] - c[:, 1]) ** 2, axis=-1)
                    aspect = (jnp.maximum(e1, e2)
                              / jnp.maximum(jnp.minimum(e1, e2), 1.0))
                else:
                    r = rects.reshape(b * k, 4)
                    aspect = ((r[:, 2] - r[:, 0])
                              / jnp.maximum(r[:, 3] - r[:, 1], 1.0))
                key = jnp.where(flat_valid, aspect, jnp.inf)
                order = jnp.argsort(key, stable=True)[:bucket]
                # inv[j] = sorted-slab row of the j-th raster-order live
                # crop (scatter sorted ranks to flat slots, gather by the
                # raster order _finalize decodes in).
                rank = jnp.zeros((b * k,), jnp.int32).at[order].set(
                    jnp.arange(bucket, dtype=jnp.int32))
                raster = jnp.argsort(~flat_valid, stable=True)[:bucket]
                inv = rank[raster]
            else:
                order = jnp.argsort(~flat_valid, stable=True)[:bucket]
                inv = jnp.arange(bucket, dtype=jnp.int32)
            if rotated:
                # Direct batched gather — no [bucket,H,W,C] source-page
                # materialization (see extract_crops_perspective_batched).
                cr = jnp.take(rects.reshape(b * k, 4, 2), order, axis=0)
                crops = extract_crops_perspective_batched(
                    images, order // k, cr, rh, rw)
            else:
                rc = jnp.take(rects.reshape(b * k, 4), order, axis=0)
                crops = extract_crops_batched(
                    images, order // k, rc, rh, rw)
            if crops.shape[-1] == 1:  # grayscale -> RGB for the recognizer
                crops = jnp.broadcast_to(crops, crops.shape[:-1] + (3,))
            if cfg.channel_mode == "cpp":
                crops = crops[..., ::-1]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                crops = jax.lax.with_sharding_constraint(
                    crops, NamedSharding(self.mesh, P("dp")))
            return crops, inv

        if self.mesh is None:
            fn = jax.jit(crop)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = NamedSharding(self.mesh, P("dp"))
            fn = jax.jit(crop, in_shardings=(dp, dp, dp))
        self._slab_fns[key] = fn
        return fn

    def _unsort_fn(self, bucket: int):
        """Tiny permutation program: sorted-slab results -> raster order.

        Row j of the returned (ids, conf) is the j-th live crop in
        (page, slot) raster order — what _finalize's span decoding
        assumes. Cached per bucket; dispatch cost is a [bucket, T] int
        gather (<0.1 ms)."""
        if bucket in self._unsort_fns:
            return self._unsort_fns[bucket]
        fn = jax.jit(lambda ids, conf, inv: (jnp.take(ids, inv, axis=0),
                                             jnp.take(conf, inv, axis=0)))
        self._unsort_fns[bucket] = fn
        return fn

    def _crop_recognize_fn(self, b: int, k: int, bucket: int,
                           h: int, w: int, channels: int):
        """Lazy-crop + recognition: chained dispatches, no host sync.

        Kept as separate programs so the expensive PARSEQ compile is keyed
        by bucket only — mixed page shapes reuse it and recompile just the
        cheap crop program (a fused single program would recompile the
        recognizer per page shape). With rec_sort_by_width a third tiny
        dispatch unsorts the results back to raster order."""
        cropf = self._crop_fn(b, k, bucket, h, w, channels)
        recf = self._recognize_fn(bucket)
        if not self.config.rec_sort_by_width:
            def run(params, images, rects, valid):
                crops, _ = cropf(images, rects, valid)
                return recf(params, crops)

            return run
        unsf = self._unsort_fn(bucket)

        def run(params, images, rects, valid):
            crops, inv = cropf(images, rects, valid)
            ids, conf = recf(params, crops)
            return unsf(ids, conf, inv)

        return run

    def _bucket(self, count: int) -> int:
        for b in self.config.rec_buckets:
            if count <= b and b <= self.config.max_boxes:
                return b
        return self.config.max_boxes

    def calibrate(self, pages, margin: float = 1.1) -> int:
        """Freeze calibrated static int8 activation scales from sample pages.

        Dynamic per-tensor quantization (the `quantized_serving` default)
        pays a full abs-max read of every quantized layer's input on every
        forward — gigabytes of extra HBM traffic per batch on the detector
        trunk. This runs the quantized detector and recognizer encoder on
        `pages` (one batch array or a list of batch arrays, same shapes
        `run_pages` accepts), records each quantized layer's observed input
        abs-max, and freezes `127/(amax*margin)` into the params as static
        scales (layers.make_static_quant) — the per-forward reduces
        disappear and the quantize cast fuses into each producer's epilogue.

        Inputs beyond the calibrated range SATURATE: calibrate on data
        representative of serving traffic (`margin` adds clip headroom).
        Re-calibration simply replaces the scales. The engine's cached stage
        programs retrace automatically (the params pytree gains "sx"
        leaves). Returns the number of layers calibrated.
        """
        self._check_open()
        if not self.config.quantized_serving:
            raise ValueError(
                "calibrate() requires OcrConfig(quantized_serving=True)")
        from tuatara_tpu.models import layers as L
        from tuatara_tpu.models.parseq import parseq_encode

        cfg = self.config
        ccfg = self.craft_config
        pcfg = self.parseq_config
        dtype = jnp.dtype(cfg.compute_dtype)
        batches = pages if isinstance(pages, (list, tuple)) else [pages]
        cp, pp = self.craft_params, self.parseq_params

        # Both forwards are defined ONCE, outside the batch loop: jax.jit
        # caches on function identity, so per-batch closures would force a
        # full recompile for EVERY calibration batch even at one shared
        # shape. Defined here (not at module scope) so the params are
        # CLOSED OVER — the collector's id(wq) keys must match a later tree
        # walk over self.craft_params/parseq_params (layers.calibration).
        @jax.jit
        def craft_fwd(images):
            with L.calibration() as col:
                if images.ndim == 3:
                    images = images[..., None]
                # Same canvas prep as the serving detect program — shared
                # helper, never a copy (_canvas_prep docstring).
                canvases = jax.vmap(lambda im: _canvas_prep(im, cfg))(images)
                craft_forward(cp, canvases, ccfg, compute_dtype=dtype)
                return dict(col)

        @jax.jit
        def rec_fwd(crops):
            with L.calibration() as col:
                parseq_encode(pp, crops, pcfg, compute_dtype=dtype)
                return dict(col)

        # Under the composed quantized+Pallas config the encoder is served
        # by the bf16 kernels and carries no quantized layers — running the
        # collector forward would observe nothing (and the Pallas lowering
        # is TPU-only), so only the detector calibrates.
        calibrate_rec = "wq" in pp["patch_embed"]

        craft_stats, rec_stats = [], []
        for batch in batches:
            imgs, b, h, w, c = self._batch_geometry(batch)
            # Under a dp mesh the sharded stage programs need dp-divisible
            # batches (same padding as run_pages; blank pages only LOWER
            # the observed abs-max, never raise it past real content).
            dp = self.dp_size
            if b % dp:
                imgs = np.concatenate(
                    [np.asarray(imgs),
                     np.zeros((dp - b % dp,) + np.asarray(imgs).shape[1:],
                              np.asarray(imgs).dtype)], axis=0)
                b = imgs.shape[0]

            craft_stats.append(craft_fwd(imgs))

            if calibrate_rec:
                # Recognizer encoder: calibrate on the pages' own crops (the
                # detector is still dynamically quantized here — the
                # activation distributions match static serving to
                # quantization-noise order, standard post-training-
                # quantization practice).
                det = self._detect_fn(b, h, w, c)(cp, imgs)
                bucket = self._bucket(
                    min(max(cfg.rec_buckets), b * cfg.max_boxes))
                crops, _ = self._crop_fn(b, cfg.max_boxes, bucket, h, w, c)(
                    imgs, det["rects"], det["valid"])

                rec_stats.append(rec_fwd(crops))

        cstats = L.merge_calib_stats(craft_stats)
        rstats = L.merge_calib_stats(rec_stats)
        self.craft_params = L.make_static_quant(cp, cstats, margin)
        self.parseq_params = L.make_static_quant(pp, rstats, margin)
        logger.info("calibrated %d quantized layers (margin %.2f)",
                    len(cstats) + len(rstats), margin)
        return len(cstats) + len(rstats)

    def save_calibration(self, path: Optional[str] = None) -> str:
        """Persist the calibrated static activation scales ("sx" leaves).

        Default destination is `calibration.npz` inside the engine's
        weights_dir, where a fresh `OcrEngine(weights_dir=...,
        quantized_serving=True)` auto-loads them — calibrate once, serve
        reduce-free in every later process. The file is an overlay on the
        init-time-quantized trees (weights are not duplicated); loading it
        under a different architecture or quantization config raises.
        Returns the path written."""
        import os

        from tuatara_tpu.utils import weights as W

        if path is None:
            if not self.weights_dir:
                raise ValueError(
                    "engine has no weights_dir; pass an explicit path")
            path = os.path.join(self.weights_dir, W.CALIB_FILE)
        n = W.save_calibration(path, self.craft_params, self.parseq_params)
        if n == 0:
            raise ValueError(
                "no calibrated scales to save — run engine.calibrate(pages) "
                "first (requires quantized_serving=True)")
        logger.info("saved %d calibrated scales to %s", n, path)
        return path

    # ------------------------------------------------------------------
    # Public entry points
    # ------------------------------------------------------------------

    def run(self, image: np.ndarray, outputs_dir: Optional[str] = None) -> List[Dict]:
        """OCR one image -> [{"text": str, "bbox": [x0, y0, x1, y1]}].

        `image`: [H, W, 3] uint8 RGB (the reference Python-binding contract,
        bindings/python.cpp:12-28 + run_ocr.py:88-91) or [H, W] grayscale
        (bit-identical to feeding the channel-tripled RGB, 3x cheaper to
        transfer). `outputs_dir` is accepted for signature parity and
        ignored, as in the reference (validated-but-unused,
        tuatara.cpp:320-323).
        """
        self._check_open()
        return self.run_pages(image[None])[0]

    @staticmethod
    def _batch_geometry(images) -> Tuple[Any, int, int, int, int]:
        """Parse [B,H,W,3] / [B,H,W,1] / [B,H,W] / [H,W,3] / [H,W] input ->
        (images, b, h, w, channels) WITHOUT touching device-resident data
        (an eager reshape on a committed jax.Array costs a full dispatch
        round-trip on remote backends — rank normalization happens inside
        the jitted detect program instead).

        A 3-D array whose last dim is 3 is read as one RGB page and one
        whose last dim is 1 as one grayscale page [H, W, 1] (so
        `run_pages(img[..., None]) == run_pages(img)` for a gray page); any
        other 3-D array is a grayscale batch (a gray BATCH with page width
        1 or 3 is pathological — pass [B, H, W, 1] to disambiguate)."""
        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        if images.ndim == 2:
            images = images[None] if isinstance(images, np.ndarray) else images[None, ...]
        if images.ndim == 3 and images.shape[-1] in (1, 3):
            images = images[None]
        if images.ndim == 3:
            b, h, w = images.shape
            return images, b, h, w, 1
        if images.ndim != 4 or images.shape[-1] not in (1, 3):
            raise ValueError(
                f"expected an image batch [B, H, W, 3|1] (or [B, H, W] / "
                f"[H, W] grayscale, [H, W, 3] RGB), got "
                f"{getattr(images, 'shape', None)}"
            )
        b, h, w, c = images.shape
        return images, b, h, w, c

    @staticmethod
    def _fresh_stats() -> Dict[str, float]:
        return {"pages": 0, "batches": 0, "boxes": 0,
                "detect_s": 0.0, "recognize_s": 0.0, "decode_s": 0.0,
                "spec_hits": 0, "spec_misses": 0, "spec_wasted": 0}

    def reset_stats(self) -> None:
        """Zero the cumulative serving counters (`engine.stats`)."""
        self.stats = self._fresh_stats()

    def _account(self, b_real: int) -> None:
        t = self.last_timings
        s = self.stats
        s["pages"] += b_real
        s["batches"] += 1
        s["boxes"] += t.get("boxes", 0)
        for k in ("detect_s", "recognize_s", "decode_s"):
            s[k] += t.get(k, 0.0)
        if t.get("speculative"):
            # A speculative dispatch that needed no fallback pass is a hit;
            # one whose batch turned out to have zero boxes did throwaway
            # work but triggered no fallback either — its own bucket.
            if t.get("boxes", 0) == 0:
                s["spec_wasted"] += 1
            else:
                s["spec_misses" if t.get("spec_fallback") else "spec_hits"] += 1

    @staticmethod
    def _check_dtype(images) -> None:
        """Pixels must be uint8 0-255 (the reference contract, CV_8UC3 via
        bindings/python.cpp:12-28). A float image in [0, 1] would silently
        be divided by 255 AGAIN inside the detect program and produce
        near-blank heatmaps — fail loudly instead."""
        dt = getattr(images, "dtype", None)
        if dt is not None and np.dtype(dt) != np.uint8:
            raise TypeError(
                f"image dtype must be uint8 (0-255), got {dt}; scale and "
                f"cast float images with (img * 255).clip(0, 255)"
                f".astype('uint8') if they are in [0, 1]"
            )

    def run_pages(self, images: np.ndarray) -> List[List[Dict]]:
        """OCR a batch of same-sized pages: [B, H, W, 3] uint8 RGB, or
        grayscale [B, H, W] / [B, H, W, 1] (results bit-identical to the
        equivalent R=G=B RGB batch; the single channel broadcasts to 3 on
        device, so host->device transfer carries a third of the bytes —
        material for scanned-document serving).

        The high-throughput path: detection runs batched, all pages' live
        crops are recognized in one PARSEQ slab, results are split per page.
        Device-resident (jax.Array) input is passed through without a host
        round-trip — pair with `run_stream` to overlap H2D and result
        fetches with compute.
        """
        self._check_open()
        return self._finalize(self._dispatch(images))

    def _dispatch(self, images) -> Dict[str, Any]:
        """Issue the device work for one page batch without any host sync.

        Chains detection and (when a speculative bucket is known from the
        previous batch) the fused lazy-crop + recognition program; returns a
        state dict for `_finalize`. Dispatch/finalize are split so a
        pipelined caller (run_stream) can overlap batch i's result fetch
        with batch i+1's compute.
        """
        images, b, h, w, c = self._batch_geometry(images)
        self._check_dtype(images)
        if images.size == 0:
            raise ValueError("empty image")

        # With a mesh attached, the page batch pads to a dp multiple so the
        # dp-sharded program divides evenly; padding pages are dropped below.
        b_real = b
        dp = self.dp_size
        if b % dp:
            pad_pages = dp - b % dp
            pad = jnp.zeros if isinstance(images, jax.Array) else np.zeros
            cat = jnp.concatenate if isinstance(images, jax.Array) else np.concatenate
            images = cat(
                [images, pad((pad_pages,) + images.shape[1:], images.dtype)], axis=0
            )
            b = images.shape[0]

        images_d = jnp.asarray(images)
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation("tuatara_detect"):
            det = self._detect_fn(b, h, w, c)(self.craft_params, images_d)

        # Speculative recognition: the bucket choice needs the live box count,
        # but fetching it is a full host round-trip that would serialize with
        # an otherwise fully device-side dispatch chain. On steady workloads
        # (run_stream) counts barely move, so recognition is dispatched
        # immediately at the previous batch's bucket and count + results come
        # back in ONE combined fetch; a too-small guess falls back to a
        # correctly-sized second recognition pass in _finalize.
        spec = self._spec.get((b, h, w, c))
        rec = None
        if spec is not None:
            with jax.profiler.TraceAnnotation("tuatara_recognize"):
                rec = self._run_recognition(det, spec, b, h, w, c, images_d)
        return {
            "det": det, "rec": rec, "spec": spec, "images_d": images_d,
            "b": b, "b_real": b_real, "h": h, "w": w, "c": c, "t0": t0,
        }

    def _run_recognition(self, det, bucket, b, h, w, c, images_d):
        """One fused lazy-crop + recognition dispatch (no host sync)."""
        return self._crop_recognize_fn(b, self.config.max_boxes, bucket, h, w, c)(
            self.parseq_params, images_d, det["rects"], det["valid"])

    def _finalize(self, st: Dict[str, Any]) -> List[List[Dict]]:
        """Fetch + decode one dispatched batch (see _dispatch)."""
        det, rec, spec = st["det"], st["rec"], st["spec"]
        b, b_real = st["b"], st["b_real"]
        K = self.config.max_boxes
        t0 = st["t0"]

        with jax.profiler.TraceAnnotation("tuatara_fetch"):
            if rec is not None:
                counts, ids, conf, bboxes = jax.device_get(
                    (det["count"], rec[0], rec[1], det["bbox"]))
            else:
                counts, bboxes = jax.device_get((det["count"], det["bbox"]))
            t1 = time.perf_counter()

        spans = [int(counts[i]) for i in range(b_real)]
        total = sum(spans)
        results: List[List[Dict]] = [[] for _ in range(b_real)]
        if total == 0:
            self._spec.pop((b, st["h"], st["w"], st["c"]), None)
            self.last_timings = {
                "detect_s": t1 - t0, "recognize_s": 0.0, "decode_s": 0.0,
                # A speculative pass dispatched for a zero-box batch was
                # wasted work; record it so engine.stats sees it
                # (spec_wasted) instead of dropping it from the counters.
                "speculative": rec is not None, "spec_fallback": False,
                "boxes": 0,
            }
            self._account(b_real)
            return results

        # Oversized totals round up to a multiple of rec_slab_multiple
        # (default: max_boxes — a coarse ladder, at most `b` rungs, so
        # varied multi-page workloads can't grow the compiled-program cache
        # without bound; see OcrConfig.rec_slab_multiple for the fine-
        # granularity trade). Clamp to b*K: the gather can't produce more
        # rows.
        gran = self.config.rec_slab_multiple or K
        bucket = (self._bucket(total) if total <= K
                  else gran * ((total + gran - 1) // gran))
        bucket = min(max(bucket, self.config.rec_buckets[0]), b * K)
        fallback = spec is None or spec < total
        if fallback:
            # No / failed speculation: one correctly-sized pass. (With a
            # sufficient speculative bucket the first `total` slab rows are
            # already the live crops in (page, slot) order.)
            with jax.profiler.TraceAnnotation("tuatara_recognize"):
                ids_d, conf_d = self._run_recognition(
                    det, bucket, b, st["h"], st["w"], st["c"], st["images_d"])
                ids, conf = jax.device_get((ids_d, conf_d))
        self._spec[(b, st["h"], st["w"], st["c"])] = bucket
        t2 = time.perf_counter()

        with jax.profiler.TraceAnnotation("tuatara_decode"):
            texts = self.tokenizer.decode_ids(ids[:total])
            off = 0
            for i in range(b_real):
                n_i = spans[i]
                for j in range(n_i):
                    results[i].append({
                        "text": texts[off + j],
                        "bbox": [float(v) for v in bboxes[i, j]],
                        "confidence": float(conf[off + j]),
                    })
                off += n_i
        t3 = time.perf_counter()

        self.last_timings = {
            # With speculation (speculative=True) detect_s is the wall time
            # of the whole dispatch->combined-fetch span (detection AND
            # recognition overlap inside it; there is no separate recognize
            # wait), and recognize_s covers only a fallback re-recognition.
            "detect_s": t1 - t0,
            "recognize_s": t2 - t1,
            "decode_s": t3 - t2,
            "speculative": rec is not None,
            "spec_fallback": fallback and rec is not None,
            # spans covers real pages only (dp padding pages are dropped).
            "boxes": int(sum(spans)),
        }
        self._account(b_real)
        logger.info("ocr timings %s", self.last_timings)
        return results

    def run_mixed(self, images, max_batch: int = 16,
                  depth: int = 2) -> List[List[Dict]]:
        """OCR a list of pages of ARBITRARY (mixed) sizes.

        Real document workloads mix page sizes; `run_pages` requires one
        shape per batch (one compiled program per shape). This entry groups
        the pages by exact shape, runs each group as proper batches of up to
        `max_batch` (so same-sized pages still amortize dispatches and share
        programs), and returns per-page results in the ORIGINAL order.
        Pages whose shape appears once simply run singly — identical results
        to calling `run` per page, with batching where it's free.

        Batches are PIPELINED (`depth` dispatches in flight, like
        run_stream): batch i's result fetch — a full host round-trip on
        remote backends — overlaps batch i+1's compute, even across
        different page shapes (each shape has its own compiled programs;
        dispatch order is preserved). Speculative-recognition state is
        per-batch-shape inside `_dispatch`, so interleaving shapes only
        costs speculation hits, never correctness.
        """
        self._check_open()
        from collections import deque

        order: Dict[Tuple, List[int]] = {}
        parsed = []
        for i, im in enumerate(images):
            im = np.asarray(im) if not isinstance(im, jax.Array) else im
            parsed.append(im)
            order.setdefault(tuple(im.shape), []).append(i)
        results: List[Optional[List[Dict]]] = [None] * len(parsed)
        pending: "deque" = deque()  # (chunk indices, dispatch state)
        for idxs in order.values():
            for start in range(0, len(idxs), max_batch):
                chunk = idxs[start:start + max_batch]
                batch = np.stack([parsed[i] for i in chunk]) if len(chunk) > 1 \
                    else parsed[chunk[0]][None]
                pending.append((chunk, self._dispatch(batch)))
                if len(pending) > depth:
                    chunk0, st = pending.popleft()
                    for i, res in zip(chunk0, self._finalize(st)):
                        results[i] = res
        while pending:
            chunk0, st = pending.popleft()
            for i, res in zip(chunk0, self._finalize(st)):
                results[i] = res
        return results  # type: ignore[return-value]

    def run_lines(self, image: np.ndarray, **group_kwargs) -> List[Dict]:
        """OCR one image -> line-level hierarchy.

        Words are detected and recognized as usual, then grouped into lines
        (ops/grouping.py — the reference's open TODO of merging horizontally
        adjacent boxes, tuatara.cpp:411-414). Returns
        [{text, bbox, confidence, words}] in reading order; each `words`
        entry is a standard word result.
        """
        from tuatara_tpu.ops.grouping import group_lines

        return group_lines(self.run(image), **group_kwargs)

    def run_blocks(self, image: np.ndarray, **group_kwargs) -> List[Dict]:
        """OCR one image -> paragraph/block-level hierarchy.

        Lines (see run_lines) are further grouped into blocks by vertical
        adjacency + horizontal-extent overlap (ops/grouping.group_blocks —
        keeps columns apart, joins paragraph lines). Returns
        [{text, bbox, confidence, lines}] in reading order; `text` joins
        member lines with newlines and each line still carries its words.
        """
        from tuatara_tpu.ops.grouping import group_blocks

        return group_blocks(self.run_lines(image), **group_kwargs)

    def run_stream(self, batches, prefetch: int = 2,
                   depth: int = 1) -> "list[List[List[Dict]]]":
        """OCR an iterable of same-shaped page batches — the serving loop.

        Overlaps, per batch: host->device transfer (issued from a background
        thread, `prefetch` batches ahead), compute (detect + speculative
        recognition dispatched with no host sync), and the device->host
        result fetch (`depth` batches in flight, so a fetch's round-trip
        latency hides under the next batch's compute). Per-batch results are
        returned in order."""
        self._check_open()
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        _END = object()

        def producer():
            try:
                for b in batches:
                    q.put(jax.device_put(jnp.asarray(b)))
            except BaseException as e:  # propagate instead of deadlocking
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # Software pipeline: batch i's result fetch (a full host round-trip
        # on remote backends) happens AFTER batch i+1's programs are already
        # dispatched, so the device never idles waiting on the host. `depth`
        # in-flight batches; 1 suffices to hide one round-trip.
        from collections import deque

        out = []
        pending: "deque" = deque()
        while True:
            cur = q.get()
            if cur is _END:
                break
            if isinstance(cur, BaseException):
                t.join()
                raise cur
            pending.append(self._dispatch(cur))
            if len(pending) > depth:
                out.append(self._finalize(pending.popleft()))
        while pending:
            out.append(self._finalize(pending.popleft()))
        t.join()
        return out

    def close(self) -> None:
        """Release the engine's device-resident weights and compiled-program
        references (HBM frees once the buffers are unreferenced). The engine
        is unusable afterwards — further calls raise RuntimeError. Idempotent.
        Production-safety complement to the module-level engine cache's LRU
        eviction (get_engine)."""
        self.craft_params = None
        self.parseq_params = None
        self._detect_fns.clear()
        self._recognize_fns.clear()
        self._slab_fns.clear()
        self._unsort_fns.clear()
        self._closed = True

    def _check_open(self) -> None:
        if getattr(self, "_closed", False):
            raise RuntimeError(
                "OcrEngine is closed (close() was called or the engine was "
                "evicted from the get_engine cache) — construct a new one")

    def warmup(self, h: int, w: int, batch: int = 1, channels: int = 3) -> None:
        """Pre-compile the serving programs for a page shape.

        A blank dummy page detects zero boxes (so run_pages alone would never
        reach recognition); the crop + recognition programs are compiled
        explicitly for the smallest bucket — larger buckets compile on first
        use."""
        dummy = np.zeros((batch, h, w, channels), np.uint8)
        self.run_pages(dummy)
        K = self.config.max_boxes
        b0 = self._bucket(1)
        nrect = (4, 2) if self.config.box_mode == "rotated" else (4,)
        rects = jnp.zeros((batch, K) + nrect, jnp.float32)
        valid = jnp.zeros((batch, K), bool)
        jax.block_until_ready(
            self._crop_recognize_fn(batch, K, b0, h, w, channels)(
                self.parseq_params, jnp.asarray(dummy), rects, valid))


# ---------------------------------------------------------------------------
# Module-level convenience API (reference surface parity)
# ---------------------------------------------------------------------------

_engines: "OrderedDict[Tuple, OcrEngine]" = __import__(
    "collections").OrderedDict()
# Each cached engine holds device-resident weights + compiled programs;
# LRU-bounded so a (config, weights_dir)-churning caller can't leak HBM
# (VERDICT r3 weak item 6). Evicted engines are close()d.
ENGINE_CACHE_MAX = 4


def get_engine(
    config: OcrConfig = DEFAULT_CONFIG, weights_dir: Optional[str] = None
) -> OcrEngine:
    """Process-wide engine cache keyed by (config, weights_dir).

    SEMANTICS NOTE (changed when the cache became LRU-bounded): touching
    more than ENGINE_CACHE_MAX distinct keys close()s the least-recently
    used engine EVEN IF a caller still holds its handle — subsequent calls
    on that handle raise RuntimeError. Long-lived handles that must survive
    cache churn should construct their own `OcrEngine(...)` directly (it is
    the same object, just not cached) or raise ENGINE_CACHE_MAX.
    """
    key = (config, weights_dir or "")
    eng = _engines.get(key)
    if eng is None:
        eng = OcrEngine(config, weights_dir=weights_dir)
        _engines[key] = eng
        while len(_engines) > ENGINE_CACHE_MAX:
            _, old = _engines.popitem(last=False)
            old.close()
    else:
        _engines.move_to_end(key)
    return eng


def clear_engines() -> None:
    """Close and drop every cached engine (frees device-resident weights
    and compiled-program references)."""
    while _engines:
        _, old = _engines.popitem(last=False)
        old.close()


def image_to_data(
    image: np.ndarray,
    weights_dir: Optional[str] = None,
    outputs_dir: Optional[str] = None,
    config: OcrConfig = DEFAULT_CONFIG,
) -> List[Dict]:
    """Extract text and bounding boxes from an image.

    Same contract as `pytuatara.image_to_data` (bindings/python.cpp:54-58):
    3-D uint8 RGB array in, list of {text, bbox} dicts out — plus a
    confidence field. Engines are cached per (config, weights_dir); models
    load once per process, not per call.
    """
    image = np.asarray(image)
    if image.ndim != 3:
        raise ValueError("Input array should have 3 dimensions")
    return get_engine(config, weights_dir).run(image, outputs_dir)
