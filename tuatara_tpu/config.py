"""Configuration for the tuatara-tpu OCR engine.

Every constant the reference hardcodes lives here, defaulting to the reference
values because they are parity-critical (reference: tuatara.cpp:352-353 canvas
size / mag ratio, tuatara.cpp:397-399 thresholds, tuatara.cpp:440 crop size,
tuatara.cpp:148 min component area, tuatara.cpp:166 dilation iteration formula).

Unlike the reference — which hardcodes these inline with a TODO admitting it
("move these to a config struct", tuatara.cpp:396) — the whole engine is
parameterized by a single frozen dataclass so a config is hashable and can be
a static argument to jitted stage programs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class OcrConfig:
    """Frozen, hashable engine configuration.

    Defaults reproduce the reference pipeline's behavior (see module docstring
    for citations). Fields that fix reference bugs are documented as such.
    """

    # ---- Detection preprocessing (reference: tuatara.cpp:352-353, 206-234) ----
    canvas_size: int = 1024        # long-side cap for the detection canvas
    mag_ratio: float = 1.0         # magnification before capping
    size_multiple: int = 32        # pad H/W up to a multiple of this
    # Canvas dims round up to this bucket (0 = always the full square): one
    # compiled detect program per bucket pair, proportionally less detector
    # compute for non-square pages; outputs are identical (content-masked).
    canvas_bucket: int = 256
    # Tiled detection: pages whose magnified size exceeds the canvas run
    # CRAFT over overlapping canvas-sized tiles with max-blended heatmaps
    # instead of being downscaled (preserves small text on large pages — an
    # improvement over the reference's always-downscale, tuatara.cpp:352-358).
    tiled_detection: bool = False
    tile_overlap: int = 256

    # ---- Detection post-processing thresholds (reference: tuatara.cpp:397-399) ----
    text_threshold: float = 0.7    # min peak region score to keep a component
    link_threshold: float = 0.4    # affinity binarization threshold
    low_text: float = 0.4          # region binarization threshold
    min_component_area: int = 10   # drop components smaller than this (tuatara.cpp:148)

    # CRAFT emits heatmaps at half the canvas resolution (tuatara.cpp:236-253
    # rescales by ratio_net=2).
    ratio_net: int = 2

    # ---- Static shapes (TPU-first: everything padded/masked, compiled once) ----
    max_boxes: int = 256           # fixed box budget per page; extras masked out
    cc_max_iters: int = 64         # safety cap for connected-component label propagation

    # ---- Recognition (reference: tuatara.cpp:440 crop 128x32) ----
    rec_height: int = 32
    rec_width: int = 128
    max_label_length: int = 25     # PARSEQ decode budget (26 steps incl. EOS)
    # "greedy": AR argmax + cloze refinement (reference/upstream behavior).
    # "beam": batched beam search (beam_size), length-normalized; refinement
    # is skipped (it re-reads greedy logits, which beam doesn't produce).
    # "nar": single-pass non-autoregressive decode + cloze refinement (the
    # PARSEQ paper's NAR mode, upstream decode_ar=False) — ~10x lower
    # decode latency than the 26-step AR scan; near-AR accuracy on
    # PLM-trained models, NOT identical outputs.
    decode_mode: str = "greedy"
    beam_size: int = 4
    # Recognizer encoder lowering: None = whatever the resolved ParseqConfig
    # says (default "xla"); "pallas" = the fused VMEM-resident ViT-block
    # kernel (ops/pallas/vit.py, ~2x the XLA encoder on v5e; bf16-class
    # divergence, not bit-parity — docs/PERFORMANCE.md round 4). TPU-only.
    encoder_impl: Optional[str] = None
    # Greedy AR decode lowering: None = resolved ParseqConfig (default
    # "xla"); "pallas" = fused VMEM-resident decode kernel
    # (ops/pallas/decode.py; bf16-class divergence). TPU-only.
    decode_impl: Optional[str] = None

    # ---- Recognition charset ----
    # DELIBERATE FIX of reference quirk: the reference's charset literal
    # (tuatara.cpp:32-34) contains a stray backslash between '&' and "'",
    # mis-decoding all punctuation after '&'. We default to the standard
    # 94-char PARSEQ charset; set `reference_charset=True` for bug-compatible
    # decoding (alphanumerics are identical either way).
    reference_charset: bool = False
    # Explicit character table for the recognizer (e.g.
    # tokenizer.EXTENDED_CHARSET for a space-aware retrain — the reference's
    # own TODO, README.md:42). None = use the charset persisted next to the
    # weights (save_weights_dir stores it), falling back to the
    # reference_charset flag above. The engine validates at construction
    # that the resolved table matches the recognizer head's class count.
    charset: "str | None" = None

    # ---- Box fitting ----
    # "axis" reproduces the reference's public output (axis-aligned min/max
    # bbox, tuatara.cpp:256-274) and its axis-aligned crops (tuatara.cpp:416).
    # "rotated" enables rotated box fitting + perspective-warp rectified
    # crops (an improvement over the reference; it fits rotated rects but
    # then crops axis-aligned anyway — tuatara.cpp:416).
    box_mode: str = "axis"
    # Rotated-rect fitter (box_mode="rotated" only). "exact" computes the
    # true minimum-area rectangle of the dilated, content-clipped component
    # (ops/minarearect.py: row-extreme profiles -> monotone-chain hull ->
    # hull-edge direction sweep; matches cv2.minAreaRect / the reference's
    # tuatara.cpp:177-179 up to fp rounding — cross-checked in
    # tests/test_minarearect.py). "pca" is the cheaper second-moment
    # approximation (ops/boxes._pca_corners); "exact" falls back to it per
    # component on hull-budget overflow (not observed on real heatmaps).
    rotated_fit: str = "exact"

    # Integer-arithmetic semantics of the reference's dilation radius formula
    # `int(sqrt(size * min(w,h) / (w*h) * 2))` with C++ integer division
    # (tuatara.cpp:166). "upstream" uses the CRAFT paper repo's float formula
    # `int(sqrt(size * min(w,h) / (w*h)) * 2)`.
    niter_mode: str = "reference"

    # ---- Kernels ----
    # "auto": use the Pallas postproc kernels (in-VMEM CC labeling, fused
    # component stats) on TPU when shapes allow; "on"/"off" force.
    use_pallas: str = "auto"

    # ---- Compute ----
    # bfloat16 model compute keeps the MXU fed at 2x fp32 throughput; heatmap
    # post-processing always runs fp32.
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # Opt-in int8 detector (per-channel int8 weights + per-tensor int8
    # activations — dynamic, or calibrated-static via engine.calibrate —
    # on the VGG/fc convs, the U-Net decoder, the head's 3x3 convs, and
    # the recognizer's ViT encoder; v5e runs int8 convs/matmuls at ~2x
    # bf16). NOT bit-parity with the bf16 path: detection is
    # threshold-robust but threshold-adjacent boxes can differ. The head's
    # final 1x1 convs (they feed the score thresholds) and the AR decoder
    # stay bf16.
    quantized_serving: bool = False

    # ---- Batching ----
    page_batch: int = 1            # pages per detect() call
    # Recognition runs on the smallest bucket >= the live box count so sparse
    # pages don't pay for the full box budget; each bucket compiles once.
    rec_buckets: Tuple[int, ...] = (32, 64, 128, 256)
    # Oversized recognition slabs (live boxes > max_boxes on a page batch)
    # round up to a multiple of this. None = max_boxes (a coarse ladder: at
    # most `page_batch` compiled rungs, robust to varying workloads). A
    # finer value (e.g. 64) trims slab padding — the bench's dense load
    # pads 1856 live crops to 2048 at the default, ~10% wasted recognizer
    # compute — at the cost of more compiled rungs and more speculation
    # fallbacks when batch box counts vary. Best for steady dense loads.
    rec_slab_multiple: Optional[int] = None

    # Order recognition-slab rows by box aspect ratio (≈ character count)
    # instead of (page, slot) raster order. A PURE PERMUTATION — results
    # are unsorted back to raster order on device, so outputs are
    # bit-identical — but it makes each decode tile length-homogeneous,
    # which is what the fused decode kernel's TILE-level early exit
    # (ops/pallas/decode.py, 32-crop tiles) needs to stop at the tile's
    # own max word length instead of the whole slab's length mix. No-op
    # for accuracy; pays on trained weights with decode_impl="pallas".
    rec_sort_by_width: bool = True

    # ---- Channel-order parity (SURVEY.md quirk 1) ----
    # The reference feeds its two models *different* channel orders: the full
    # image is swapped once before CRAFT (tuatara.cpp:349) and each crop is
    # swapped again before PARSEQ (tuatara.cpp:441), an involution. With RGB
    # input (the Python-binding path that produced the golden artifact):
    #   "python": CRAFT sees BGR, PARSEQ sees RGB  (parity default)
    #   "cpp":    CRAFT sees RGB, PARSEQ sees BGR  (imread/BGR-input path)
    #   "rgb":    both models see RGB              (clean mode)
    channel_mode: str = "python"

    @classmethod
    def latency(cls, **overrides) -> "OcrConfig":
        """Batch-1 single-image serving preset (the reference's CLI shape:
        one image in, words out — examples/resume.cpp).

        Throughput serving amortizes canvas padding over a page batch; at
        batch 1 every padded pixel is pure added latency. This preset
        fits the detect canvas exactly to the page's /32 geometry
        (canvas_bucket=32 — e.g. 607x763 -> 608x768 instead of the
        768x768 bucket, 21% less detector compute), adds a finer
        recognition bucket so sparse pages pay fewer wasted crop slots,
        and serves the fused Pallas recognizer kernels. Trade-off: one
        compiled detect program per distinct /32 page geometry (first hit
        per geometry pays the compile; a fixed-format scanner pays once).
        Keyword overrides win, so `OcrConfig.latency(box_mode="rotated")`
        composes. The Pallas recognizer kernels are TPU-only; on other
        backends the preset keeps the XLA lowerings (the factory reads the
        ambient default backend — pass encoder_impl/decode_impl to force)."""
        import jax  # late import: config stays importable without a backend

        on_tpu = jax.default_backend() == "tpu"
        base = dict(canvas_bucket=32, rec_buckets=(16, 32, 64, 128, 256),
                    encoder_impl="pallas" if on_tpu else None,
                    decode_impl="pallas" if on_tpu else None,
                    page_batch=1)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def production(cls, **overrides) -> "OcrConfig":
        """Fast dense-serving preset: the composed configuration that wins
        the single-chip throughput measurements (bench headline since
        round 5; scripts/profile_composed.py has the stage attribution).

        Composition: calibrated-int8 detector (`quantized_serving=True` —
        run `engine.calibrate(sample_pages)` once at startup or ship a
        calibration.npz next to the weights), bf16 Pallas recognizer
        kernels (fused ViT blocks + fused greedy decode with tile-level
        early exit), exact-fit /32 detect canvas (one compiled program per
        distinct page geometry), 64-granularity recognition slabs, and
        aspect-sorted decode tiles (default-on).

        NOT bit-parity with the reference fp32 math: int8 detection is
        threshold-robust but threshold-adjacent boxes can differ, and the
        Pallas kernels are bf16-class divergent. Measured deltas on
        trained weights live in evals/parity_production.json. For parity
        work use DEFAULT_CONFIG (or compute_dtype="float32").

        The Pallas kernels are TPU-only; on other backends the preset
        keeps the XLA lowerings (reads the ambient default backend, like
        `latency()`).

        `production(rec_width=64)` is the shipped fast serving point
        (bench headline since round 5): 64-wide recognition crops halve
        the ViT token count (~2x fewer encoder FLOPs) and require
        width-64-finetuned weights (scripts/train_width64.py;
        evals/production_weights_w64). Held-out accuracy is measured
        neutral vs full width (evals/production_w64_eval.json: e2e
        word-acc 89.1% vs 87.5%, F1 1.0 both); the engine refuses a
        rec_width that disagrees with the weights' stored img_size at
        construction. Weights trained at 128 wide (e.g. converted
        reference checkpoints) must keep the default rec_width."""
        import jax

        on_tpu = jax.default_backend() == "tpu"
        base = dict(quantized_serving=True, canvas_bucket=32,
                    rec_slab_multiple=64,
                    encoder_impl="pallas" if on_tpu else None,
                    decode_impl="pallas" if on_tpu else None)
        base.update(overrides)
        return cls(**base)

    @property
    def heatmap_size(self) -> Tuple[int, int]:
        s = self.canvas_size // self.ratio_net
        return (s, s)

    @property
    def num_decode_steps(self) -> int:
        return self.max_label_length + 1  # + EOS


# Reference-default config singleton.
DEFAULT_CONFIG = OcrConfig()


@dataclasses.dataclass(frozen=True)
class CraftConfig:
    """CRAFT detector architecture hyperparameters.

    The reference runs CRAFT as an opaque TorchScript artifact
    (tuatara.cpp:333-336); this rebuild implements the architecture itself:
    VGG16-BN backbone, U-Net-style skip decoder, 2-channel head emitting
    region/affinity maps at half input resolution.
    """

    # VGG16-BN stage output channels.
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512, 512)
    # conv6/conv7 ("fc" stage) channels.
    fc_channels: int = 1024
    # U-Net double-conv block (mid, out) channels per decoder level.
    up_channels: Tuple[Tuple[int, int], ...] = (
        (512, 256), (256, 128), (128, 64), (64, 32),
    )
    head_channels: Tuple[int, ...] = (32, 32, 16, 16)
    num_classes: int = 2           # region + affinity
    bn_eps: float = 1e-5
    # Input normalization BAKED INTO the model contract: x -> (x - mean)/std
    # applied to the [0,1] input at the top of the forward. Empty = identity
    # (the reference feeds /255 only, tuatara.cpp:363-370). The weight
    # converter's normalization probe (utils/convert.py
    # probe_input_normalization) sets these automatically when a real traced
    # artifact is detected to normalize internally (SURVEY.md quirk 2), so
    # first contact with real weights serves correctly without code changes.
    input_mean: Tuple[float, ...] = ()
    input_std: Tuple[float, ...] = ()


@dataclasses.dataclass(frozen=True)
class ParseqConfig:
    """PARSEQ recognizer architecture hyperparameters (paper defaults).

    The reference runs PARSEQ as an opaque TorchScript artifact
    (tuatara.cpp:426-432); this rebuild implements the architecture: ViT-S
    encoder over the 32x128 crop + a depth-1 permutation-LM cross-attention
    decoder with autoregressive greedy decode and optional iterative
    refinement.
    """

    img_size: Tuple[int, int] = (32, 128)
    patch_size: Tuple[int, int] = (4, 8)
    embed_dim: int = 384
    enc_depth: int = 12
    enc_heads: int = 6
    enc_mlp_ratio: float = 4.0
    dec_heads: int = 12
    dec_mlp_ratio: float = 4.0
    dec_depth: int = 1
    max_label_length: int = 25
    # 94 printable ASCII chars (standard PARSEQ charset); vocab adds EOS/BOS/PAD.
    charset_size: int = 94
    refine_iters: int = 1
    dropout: float = 0.1
    layer_norm_eps: float = 1e-6
    # Encoder lowering: "xla" (default; the parity-tested block chain) or
    # "pallas" (ops/pallas/vit.py fused-block kernel — the serving speed
    # path; same math, NOT bit-identical, ~bf16-accumulation-order deltas.
    # fp32 compute always uses the XLA path regardless).
    encoder_impl: str = "xla"
    # Greedy AR decode lowering: "xla" (default; KV-cached scan with batch
    # EOS early-exit) or "pallas" (ops/pallas/decode.py fused decode kernel
    # — memory K/V + cache VMEM-resident across all steps; same math, NOT
    # bit-identical; TPU-only serving opt-in). Only affects
    # decode_mode="greedy"; beam/NAR always use the XLA path.
    decode_impl: str = "xla"
    # Input normalization baked into the model contract (see
    # CraftConfig.input_mean): (x - mean)/std on the [0,1] crops at the top
    # of parseq_encode. Empty = identity (the reference feeds /255 only,
    # tuatara.cpp:440-446). Set automatically by the converter's
    # normalization probe on artifacts that normalize internally.
    input_mean: Tuple[float, ...] = ()
    input_std: Tuple[float, ...] = ()

    @property
    def num_tokens(self) -> int:
        # [EOS] + charset + [BOS] + [PAD]
        return self.charset_size + 3

    @property
    def seq_len(self) -> int:
        h = self.img_size[0] // self.patch_size[0]
        w = self.img_size[1] // self.patch_size[1]
        return h * w
