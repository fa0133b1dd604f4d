"""CRAFT text detector in functional JAX (NHWC).

The reference loads CRAFT as an opaque TorchScript artifact
(`craft_traced_torchscript_model.pt`, tuatara.cpp:333-336) and only consumes
its output: a `[B, H/2, W/2, 2]` tensor whose channel 0 is the region ("text")
score and channel 1 the affinity ("link") score (tuatara.cpp:382-394). This
module implements the architecture itself — VGG16-BN backbone with U-Net-style
skip decoder and a 2-channel head at half input resolution — so the engine is
self-contained and weights can be converted from the public checkpoints.

Architectural notes (matching the public CRAFT network so converted weights
drop in):

* The backbone slices end on a BatchNorm output *before* its ReLU; the next
  slice applies that ReLU first. Skip connections therefore carry pre-ReLU BN
  outputs. Slice boundaries: bn2_2 (128ch @ 1/2), bn3_2 (256 @ 1/4),
  bn4_2 (512 @ 1/8), bn5_2 (512 @ 1/16).
* conv5_3 and the final VGG maxpool are dropped; in their place a stride-1
  3x3 maxpool, a dilated (rate-6) 3x3 conv to 1024 ("fc6") and a 1x1 conv to
  1024 ("fc7"), with no BN/ReLU.
* Decoder: at each level, concat(trunk, skip) -> double_conv
  (1x1 conv + BN + ReLU, then 3x3 conv + BN + ReLU), bilinear-upsample
  (half-pixel / align_corners=False semantics) to the next skip's size.
* Head: 3x[3x3 conv+ReLU] -> 1x1 conv+ReLU -> 1x1 conv to 2 channels,
  emitted NHWC.

Everything is shape-static: the engine always feeds the padded
`canvas_size x canvas_size` detection canvas, so XLA compiles exactly one
program for the hot path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig
from tuatara_tpu.models import layers as L

Params = Dict[str, Any]

# Convs per VGG stage as CRAFT consumes them: full blocks 1-4 plus only the
# first two convs of block 5 (conv5_3 and the final pool are dropped).
_STAGE_COUNTS = (2, 2, 3, 3, 2)


def _vgg_plan(cfg: CraftConfig):
    """[(name, cin, cout, pool_before, skip_tag)] trunk table from config.

    Skips are captured at the BN output (pre-ReLU) of the *second* conv of
    stages 2-5: bn2_2 / bn3_2 / bn4_2 / bn5_2 (f2..f5).
    """
    plan = []
    cin = 3
    for s, (count, cout) in enumerate(zip(_STAGE_COUNTS, cfg.stage_channels)):
        for i in range(count):
            name = f"conv{s + 1}_{i + 1}"
            skip = f"f{s + 1}" if (s >= 1 and i == 1) else None
            plan.append((name, cin, cout, s >= 1 and i == 0, skip))
            cin = cout
    return plan


def init_craft_params(key: jax.Array, cfg: CraftConfig = CraftConfig()) -> Params:
    """Random-init parameter pytree (he-normal convs, identity BN stats)."""
    keys = iter(jax.random.split(key, 64))
    p: Params = {"vgg": {}, "fc": {}, "up": {}, "head": {}}
    for name, cin, cout, _, _ in _vgg_plan(cfg):
        p["vgg"][name] = {
            "conv": L.init_conv(next(keys), 3, 3, cin, cout),
            "bn": L.init_batchnorm(cout),
        }
    s = cfg.stage_channels
    p["fc"]["fc6"] = L.init_conv(next(keys), 3, 3, s[4], cfg.fc_channels)
    p["fc"]["fc7"] = L.init_conv(next(keys), 1, 1, cfg.fc_channels, cfg.fc_channels)

    # Decoder double_conv blocks. Input channels: concat(trunk, skip) where
    # the skips are f5..f2 (stage channels 5..2) top-down.
    in_chs = [
        cfg.fc_channels + s[4],
        cfg.up_channels[0][1] + s[3],
        cfg.up_channels[1][1] + s[2],
        cfg.up_channels[2][1] + s[1],
    ]
    for i, ((mid, out), cin) in enumerate(zip(cfg.up_channels, in_chs), start=1):
        k1, k2 = next(keys), next(keys)
        p["up"][f"upconv{i}"] = {
            "conv1": L.init_conv(k1, 1, 1, cin, mid),
            "bn1": L.init_batchnorm(mid),
            "conv2": L.init_conv(k2, 3, 3, mid, out),
            "bn2": L.init_batchnorm(out),
        }

    hc = cfg.head_channels
    p["head"]["conv1"] = L.init_conv(next(keys), 3, 3, cfg.up_channels[-1][1], hc[0])
    p["head"]["conv2"] = L.init_conv(next(keys), 3, 3, hc[0], hc[1])
    p["head"]["conv3"] = L.init_conv(next(keys), 3, 3, hc[1], hc[2])
    p["head"]["conv4"] = L.init_conv(next(keys), 1, 1, hc[2], hc[3])
    p["head"]["conv5"] = L.init_conv(next(keys), 1, 1, hc[3], cfg.num_classes)
    return p


def fold_batchnorms(params: Params, eps: float = 1e-5) -> Params:
    """Fold every inference-mode BatchNorm into its preceding conv.

    y = scale*(conv(x)+b - mean)*rsqrt(var+eps) + bias is exactly a conv
    with w' = w*g and b' = (b-mean)*g + bias where g = scale*rsqrt(var+eps).
    The BN entries are REMOVED from the tree and `craft_forward` skips the
    normalization op entirely when a block has no "bn" key — with the BN op
    present (even as an identity) every conv output round-trips through an
    fp32 elementwise pass, doubling activation bytes between convs; removing
    it keeps the whole trunk in the compute dtype with ReLUs fused into conv
    epilogues. Serving-path optimization; training keeps live BNs. Jitted as
    one program — dozens of eager elementwise ops would dominate engine
    startup on remote backends. `eps` must equal the CraftConfig.bn_eps the
    running stats were folded under. Idempotent on already-folded trees.
    """
    if "bn" not in next(iter(params["vgg"].values())):
        return params  # already folded
    return _fold_batchnorms_jit(params, eps=eps)


@functools.partial(jax.jit, static_argnames=("eps",))
def _fold_batchnorms_jit(params: Params, eps: float) -> Params:
    def fold(conv, bn):
        g = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
        new_conv = {"w": conv["w"] * g[None, None, None, :]}
        b = conv.get("b", 0.0)
        new_conv["b"] = (b - bn["mean"]) * g + bn["bias"]
        return new_conv

    p: Params = {"fc": params["fc"], "head": params["head"], "vgg": {}, "up": {}}
    for name, blk in params["vgg"].items():
        p["vgg"][name] = {"conv": fold(blk["conv"], blk["bn"])}
    for name, blk in params["up"].items():
        p["up"][name] = {
            "conv1": fold(blk["conv1"], blk["bn1"]),
            "conv2": fold(blk["conv2"], blk["bn2"]),
        }
    return p


def _pack4_conv_w(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] conv weights -> width-packed [3,3,4C,4O].

    A stride-1 3x3 conv on [B,H,W,C] is exactly a 3x3 conv on the pure
    reshape [B,H,W/4,4C] ("4 consecutive columns' channels side by side")
    with weights W'[KY,KX,(bj,c),(aj,o)] = W[KY,kx,c,o] where
    kx = 4*KX - 3 + bj - aj (valid slots only; the rest are zero). The
    packed conv keeps the MXU's 128-wide output lanes full where the
    original 16/32-channel convs used 1/8-1/4 of them — ~2.5x faster on
    the serving head despite computing 4x the (mostly-zero) FLOPs.
    SAME padding in packed space pads a whole 4-column block; the extra
    taps hit zero weight slots, so results are exact (verified equal to
    the unpacked conv up to f32 accumulation order).

    Built with gather + mask ONLY — an einsum against a 0/1 selector runs
    on the MXU in reduced precision and corrupts the weights at the 1e-3
    level (observed on TPU).
    """
    import numpy as np

    C, O = w.shape[2], w.shape[3]
    kxm = np.full((3, 4, 4), -1, np.int32)  # [KX, bj, aj]
    for KX in range(3):
        for bj in range(4):
            for aj in range(4):
                kx = 4 * KX - 3 + bj - aj
                if 0 <= kx < 3:
                    kxm[KX, bj, aj] = kx
    valid = jnp.asarray(kxm >= 0)
    kxc = jnp.asarray(np.clip(kxm, 0, 2))
    wp = w[:, kxc]  # [KY, KX, bj, aj, C, O] — pure copy
    wp = jnp.where(valid[None, :, :, :, None, None], wp, jnp.zeros((), w.dtype))
    wp = wp.transpose(0, 1, 2, 4, 3, 5)  # [KY, KX, bj, C, aj, O]
    return wp.reshape(3, 3, 4 * C, 4 * O)


def _pack4_1x1_w(w: jnp.ndarray) -> jnp.ndarray:
    """[1,1,C,O] -> block-diagonal packed [1,1,4C,4O] (selection only)."""
    C, O = w.shape[2], w.shape[3]
    blk = jnp.broadcast_to(w[0, 0][None, :, None, :], (4, C, 4, O))
    eye = (jnp.arange(4)[:, None] == jnp.arange(4)[None, :])
    wp = jnp.where(eye[:, None, :, None], blk, jnp.zeros((), w.dtype))
    return wp.reshape(1, 1, 4 * C, 4 * O)


def _pack4(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 4, 4 * c)


def _unpack4(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w4, c4 = x.shape
    return x.reshape(b, h, w4 * 4, c4 // 4)


def quantize_craft_trunk(params: Params, decoder: bool = True) -> Params:
    """Serving-only int8 quantization of the VGG trunk + fc convs, and
    (decoder=True, the default) the U-Net decoder + head's wide convs.

    Requires a BN-folded tree (fold_batchnorms). conv1_1 stays bf16 — its
    input is the /255 image whose 8-bit dynamic range a second int8
    round-trip would halve, and at cin=3 the int8 conv path has no MXU
    advantage anyway. In the decoder, each level's 1x1 conv1 is pre-split
    along cin into the (trunk, skip) halves the forward's concat-free
    formulation consumes — "conv1a"/"conv1b", each per-output-channel
    quantized on its own slice (stable weight identities are what keeps
    engine.calibrate working across the width-pack transform). The head's
    final 1x1 convs (conv4, conv5) stay bf16: they are tiny and feed the
    score thresholds directly, where quantization noise matters most.
    Opt-in via OcrConfig.quantized_serving — NOT bit-parity with the
    reference math; detection is threshold-robust but boxes can differ on
    threshold-adjacent components.
    """
    if "bn" in next(iter(params["vgg"].values())):
        raise ValueError("quantize_craft_trunk requires BN-folded params "
                         "(fold_batchnorms first)")
    if "wq" in params["vgg"].get("conv1_2", {}).get("conv", {}):
        return params  # already quantized (e.g. weights saved from a
        # quantized engine) — idempotent
    q: Params = {"vgg": {}, "fc": {}, "up": params["up"], "head": params["head"]}
    for name, blk in params["vgg"].items():
        if name == "conv1_1":
            # Stays bf16: a zero-point-128 int8 variant over the uint8
            # pixel grid (layers.conv2d_q_u8) traced NO faster — the int8
            # conv emitter has no advantage at cin=3 and the explicit
            # -128 pad costs what the fused fp32 input-prep did.
            q["vgg"][name] = blk
        else:
            q["vgg"][name] = {"conv": L.quantize_conv(blk["conv"])}
    q["fc"]["fc6"] = L.quantize_conv(params["fc"]["fc6"])
    q["fc"]["fc7"] = L.quantize_conv(params["fc"]["fc7"])
    if not decoder:
        return q

    # Decoder: conv1 split point = the trunk-side channel count at each
    # level (fc7's output for upconv1, the previous level's conv2 output
    # after). Derived from the weights themselves so any architecture works.
    q["up"] = {}
    ca = params["fc"]["fc7"]["w"].shape[3]
    for blk_name in ("upconv1", "upconv2", "upconv3", "upconv4"):
        p = params["up"][blk_name]
        w1 = p["conv1"]["w"]
        a = {"w": w1[:, :, :ca]}
        if "b" in p["conv1"]:
            a["b"] = p["conv1"]["b"]
        q["up"][blk_name] = {
            "conv1a": L.quantize_conv(a),
            "conv1b": L.quantize_conv({"w": w1[:, :, ca:]}),
            "conv2": L.quantize_conv(p["conv2"]),
        }
        ca = p["conv2"]["w"].shape[3]
    q["head"] = {
        "conv1": L.quantize_conv(params["head"]["conv1"]),
        "conv2": L.quantize_conv(params["head"]["conv2"]),
        "conv3": L.quantize_conv(params["head"]["conv3"]),
        "conv4": params["head"]["conv4"],
        "conv5": params["head"]["conv5"],
    }
    return q


# Fused stage-1 Pallas kernel gate: "auto" uses it on TPU for the folded
# bf16 serving path; "on" forces it anywhere (interpret mode off-TPU — tests
# use this to run the fused path on CPU); "off" disables.
#
# DEFAULT OFF — measured a net LOSS on v5e at serving shapes (batch-16,
# 1024x768): full CRAFT forward 109.1 ms fused vs 99.1 ms plain across four
# kernel iterations (staged im2col 116.4, accumulated-dot 116.4, RT=64 +
# double-buffered DMA 109.1). The conv+pool fusion saves pool1's HBM
# round-trip but loses more to the packed input's pad/pack materialization
# and Mosaic's relayouts of shifted matmul operands. Kept in-tree (correct,
# interpret-tested) as the shapes/hardware may differ elsewhere; see
# docs/PERFORMANCE.md "stage-1 fusion" dead-end table.
FUSED_STAGE1 = "off"


def _fused_stage1_ok(params: Params, x: jnp.ndarray, compute_dtype,
                     train: bool) -> bool:
    if FUSED_STAGE1 == "off" or train:
        return False
    blk11 = params["vgg"]["conv1_1"]
    blk12 = params["vgg"]["conv1_2"]
    ok = (
        "bn" not in blk11  # folded (serving) tree
        and "w" in blk11["conv"]  # not int8/u8-quantized
        and "w" in blk12["conv"]
        and jnp.dtype(compute_dtype) == jnp.bfloat16
        and x.shape[1] % 16 == 0
        and x.shape[2] % 2 == 0
    )
    if FUSED_STAGE1 == "on":
        return ok
    return ok and jax.default_backend() == "tpu"


def _conv_or_q(cp: Params, h: jnp.ndarray, compute_dtype,
               dilation: int = 1) -> jnp.ndarray:
    if "sumw" in cp:  # zero-point u8 first conv (see conv2d_q_u8; unused
        return L.conv2d_q_u8(cp, h, out_dtype=compute_dtype)  # by default)
    if "wq" in cp:
        return L.conv2d_q(cp, h, dilation=dilation, out_dtype=compute_dtype)
    return L.conv2d(cp, h, dilation=dilation, compute_dtype=compute_dtype)


def _upsample_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear upsample with half-pixel (align_corners=False) semantics.

    Runs in the activation dtype: upcasting to fp32 here doubles the HBM
    traffic of the decoder's largest tensors (the 2x upsample feeding
    upconv4 moves ~200 MB/batch at serving shapes). The 2x bilinear
    weights (0.25, 0.75) are exact in bf16, but the multiply-accumulate on
    bf16 activations still rounds (~1 ulp per output) — same-class error
    as the bf16 trunk's own rounding, not exact (see PARITY.md; the fp32
    compute_dtype path remains the bit-stable surface)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


def craft_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: CraftConfig = CraftConfig(),
    compute_dtype=jnp.bfloat16,
    allow_fused: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CRAFT forward pass (inference-mode BN on running statistics).

    Args:
      x: [B, H, W, 3] float image in [0, 1] (the reference feeds /255 only,
         no mean/std normalization — tuatara.cpp:363-370); [B, H, W, 1]
         grayscale is accepted (broadcast to conv1_1's cin just before the
         conv, so XLA fuses it into the conv's input and the decoder never
         sees 3-channel traffic).
      allow_fused: permit the fused stage-1 Pallas kernel (see FUSED_STAGE1).
         Callers that trace this function under vmap (the tiled-detection
         path) must pass False — the kernel's manual-DMA grid does not
         batch.

    Returns:
      (scores, feature): scores [B, H/2, W/2, 2] fp32 (region, affinity),
      feature [B, H/2, W/2, 32] — mirroring the reference model's output
      tuple of which the pipeline consumes element 0 (tuatara.cpp:382-384).
    """
    scores, feat, _ = _craft_apply(params, x, cfg, compute_dtype, train=False,
                                   allow_fused=allow_fused)
    return scores, feat


def craft_forward_train(
    params: Params,
    x: jnp.ndarray,
    cfg: CraftConfig = CraftConfig(),
    compute_dtype=jnp.bfloat16,
    momentum: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """Training-mode forward: BN normalizes with BATCH statistics and the
    running statistics update with `momentum` (torch semantics). Returns
    (scores, feature, new_params) where new_params is `params` with the
    updated running mean/var (stop-gradient'ed — thread them into the train
    state after the optimizer step, see train/trainer.py)."""
    return _craft_apply(params, x, cfg, compute_dtype, train=True, momentum=momentum)


def _craft_apply(
    params: Params,
    x: jnp.ndarray,
    cfg: CraftConfig,
    compute_dtype,
    train: bool,
    momentum: float = 0.1,
    allow_fused: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    eps = cfg.bn_eps
    updated: Dict[Tuple[str, str, str], Params] = {}

    def bn(group: str, block: str, key: str, h: jnp.ndarray) -> jnp.ndarray:
        bnp = params[group][block].get(key)
        if bnp is None:  # BN folded into the conv (fold_batchnorms)
            if train:
                raise ValueError(
                    "training-mode forward on BN-folded params: fold_batchnorms "
                    "is a serving-path transform; train on the raw checkpoint"
                )
            return h
        if not train:
            return L.batchnorm(bnp, h, eps)
        y, new = L.batchnorm_train(bnp, h, eps, momentum)
        updated[(group, block, key)] = {
            "scale": bnp["scale"],
            "bias": bnp["bias"],
            "mean": jax.lax.stop_gradient(new["mean"]),
            "var": jax.lax.stop_gradient(new["var"]),
        }
        return y

    skips = {}
    h = x
    if cfg.input_mean:
        # Model-contract input normalization (converter-detected; see
        # CraftConfig.input_mean). Per-channel stats need the full channel
        # count, so the grayscale fast path broadcasts first.
        if h.shape[-1] == 1 and len(cfg.input_mean) > 1:
            h = jnp.broadcast_to(h, h.shape[:-1] + (len(cfg.input_mean),))
        mean = jnp.asarray(cfg.input_mean, jnp.float32)
        std = jnp.asarray(cfg.input_std or (1.0,) * len(cfg.input_mean),
                          jnp.float32)
        h = (h.astype(jnp.float32) - mean) / std
    plan = _vgg_plan(cfg)
    start = 0
    fused_pool_done = False
    fused = allow_fused and _fused_stage1_ok(params, x, compute_dtype, train)
    # Grayscale canvas [B, H, W, 1] against an RGB-trained conv1_1:
    # broadcast to the conv's cin so XLA fuses it into the conv input.
    gray = h.shape[-1] == 1
    c11blk = params["vgg"]["conv1_1"]["conv"]
    cin11 = c11blk["w"].shape[2] if "w" in c11blk else 3
    if gray and cin11 != 1:
        h = jnp.broadcast_to(h, h.shape[:-1] + (cin11,))
    if fused:
        # conv1_1 stays an XLA conv (input prep fuses into it; at cin=3 the
        # Pallas path has no advantage), then conv1_2 + ReLU + pool1 run as
        # ONE VMEM-resident Pallas pass (ops/pallas/stage1.py) — stage 1
        # has no skip capture, so the fusion is output-equivalent
        # (bf16-rounding class).
        from tuatara_tpu.ops.pallas.stage1 import fused_conv_pool

        c12 = params["vgg"]["conv1_2"]["conv"]
        h = jax.nn.relu(_conv_or_q(c11blk, h, compute_dtype))
        zeros2 = jnp.zeros((c12["w"].shape[3],), jnp.float32)
        h = fused_conv_pool(
            h, c12["w"], c12.get("b", zeros2),
            interpret=jax.default_backend() != "tpu",
        )
        start = 2
        fused_pool_done = True  # pool1 (conv2_1's pool_before) already applied
    for idx, (name, _, _, pool_before, skip) in enumerate(plan):
        if idx < start:
            continue
        if pool_before and not (fused_pool_done and idx == start):
            h = L.max_pool(h, 2, 2)
        h = bn("vgg", name, "bn",
               _conv_or_q(params["vgg"][name]["conv"], h, compute_dtype))
        if skip is not None:
            skips[skip] = h  # pre-ReLU BN output
        h = jax.nn.relu(h)

    # fc stage: stride-1 3x3 maxpool, dilated fc6, 1x1 fc7 (no BN/ReLU).
    # (An int8-chained trunk variant — activations kept int8 across
    # relu/pool between quantized convs — traced IDENTICAL device time to
    # this per-conv dynamic form on v5e: XLA already fuses the
    # dequant/relu/requant chains, so the simpler form stands.)
    h = L.max_pool(h, 3, 1, padding="SAME_LOWER")
    h = _conv_or_q(params["fc"]["fc6"], h, compute_dtype, dilation=6)
    h = _conv_or_q(params["fc"]["fc7"], h, compute_dtype)

    def conv1_split(block: str, y: jnp.ndarray, skip: jnp.ndarray,
                    up: "Tuple[int, int] | None" = None) -> jnp.ndarray:
        # conv1 is always 1x1 over concat(trunk, skip); splitting its weight
        # along cin turns it into two matmuls summed — exactly equal math —
        # so the concatenated tensor (the decoder's largest activations,
        # ~2.3 GB/batch at serving shapes across the four levels) is never
        # materialized in HBM. When the trunk side arrives at the PREVIOUS
        # level's resolution (`up` set), its 1x1 conv runs at LOW res and the
        # 2x bilinear upsample moves the post-conv (half-width) channels:
        # a channel-pointwise linear map commutes exactly with spatial
        # interpolation, and the bias commutes because bilinear weights sum
        # to 1 — measured 1.3-1.7x per level on v5e (the resize lowers to
        # dot_generals whose cost scales with channels; see
        # docs/PERFORMANCE.md "decoder upsample commute").
        # compute_dtype=float32 keeps the REFERENCE operation order
        # (upsample the trunk input, then conv): fp32 is the pinned
        # parity/debug surface (PARITY.md, the golden f32 pins), and while
        # conv-then-upsample commutes exactly in real arithmetic, it rounds
        # differently per output — math-order optimizations therefore apply
        # only to the serving dtypes (bf16/int8).
        if up is not None and jnp.dtype(compute_dtype) == jnp.float32:
            y = _upsample_to(y, up[0], up[1])
            up = None
        p = params["up"][block]
        if "conv1a" in p:  # int8 decoder: halves pre-split + pre-quantized
            # at quantize_craft_trunk time (stable weight identities keep
            # engine.calibrate's id-keyed collector working).
            ya = L.conv2d_q(p["conv1a"], y, out_dtype=compute_dtype)
            if up is not None:
                ya = _upsample_to(ya, up[0], up[1])
            yb = L.conv2d_q(p["conv1b"], skip, out_dtype=compute_dtype)
            return jax.nn.relu(bn("up", block, "bn1", ya + yb))
        w1 = p["conv1"]["w"]
        ca = y.shape[-1]
        pa = {"w": w1[:, :, :ca]}
        if "b" in p["conv1"]:
            pa["b"] = p["conv1"]["b"]
        ya = L.conv2d(pa, y, compute_dtype=compute_dtype)
        if up is not None:
            ya = _upsample_to(ya, up[0], up[1])
        yb = L.conv2d({"w": w1[:, :, ca:]}, skip, compute_dtype=compute_dtype)
        return jax.nn.relu(bn("up", block, "bn1", ya + yb))

    def double_conv(block: str, y: jnp.ndarray, skip: jnp.ndarray,
                    up: "Tuple[int, int] | None" = None) -> jnp.ndarray:
        y = conv1_split(block, y, skip, up=up)
        p = params["up"][block]
        y = jax.nn.relu(bn("up", block, "bn2",
                           _conv_or_q(p["conv2"], y, compute_dtype)))
        return y

    # Decoder. Each level's 2x upsample is folded into the next level's
    # trunk-side 1x1 conv (see conv1_split `up`).
    y = double_conv("upconv1", h, skips["f5"])
    y = double_conv("upconv2", y, skips["f4"],
                    up=(skips["f4"].shape[1], skips["f4"].shape[2]))
    y = double_conv("upconv3", y, skips["f3"],
                    up=(skips["f3"].shape[1], skips["f3"].shape[2]))
    up4 = (skips["f2"].shape[1], skips["f2"].shape[2])

    hp = params["head"]
    # Serving path (folded BNs, /4-divisible width): run upconv4's 3x3 and
    # the whole head width-packed so the 16/32-channel convs fill the MXU
    # (see _pack4_conv_w — exact math, ~2.5x on this tail). Training keeps
    # the plain layout (BN needs per-channel stats in unpacked space).
    packed = (
        not train
        and "bn2" not in params["up"]["upconv4"]  # folded-BN (serving) tree
        and skips["f2"].shape[2] % 4 == 0
        and skips["f2"].shape[2] // 4 >= 3
    )
    if packed:
        z = conv1_split("upconv4", y, skips["f2"], up=up4)
        p4 = params["up"]["upconv4"]["conv2"]
        zp = _pack4(z)

        def pconv(pp, x, pack):
            if "wq" in pp:
                # Quantize against the ORIGINAL block (calibration keys on
                # its weight identity), then conv with the width-packed
                # int8 weights — packed zeros are exact int8 zeros, so the
                # packed quantized conv is BIT-equal to the unpacked one
                # (int32 accumulation has no ordering error).
                xq, xs = L.quantize_act_q(pp, x)
                kp = {"wq": pack(pp["wq"]), "sw": jnp.tile(pp["sw"], 4)}
                if "b" in pp:
                    kp["b"] = jnp.tile(pp["b"], 4)
                return L.conv2d_q_pre(kp, xq, xs, out_dtype=compute_dtype)
            kp = {"w": pack(pp["w"])}
            if "b" in pp:
                kp["b"] = jnp.tile(pp["b"], 4)
            return L.conv2d(kp, x, compute_dtype=compute_dtype)

        featp = jax.nn.relu(pconv(p4, zp, _pack4_conv_w))
        yp = jax.nn.relu(pconv(hp["conv1"], featp, _pack4_conv_w))
        yp = jax.nn.relu(pconv(hp["conv2"], yp, _pack4_conv_w))
        yp = jax.nn.relu(pconv(hp["conv3"], yp, _pack4_conv_w))
        yp = jax.nn.relu(pconv(hp["conv4"], yp, _pack4_1x1_w))
        yp = pconv(hp["conv5"], yp, _pack4_1x1_w)
        feat = _unpack4(featp)
        y = _unpack4(yp)
    else:
        feat = double_conv("upconv4", y, skips["f2"], up=up4)
        y = jax.nn.relu(_conv_or_q(hp["conv1"], feat, compute_dtype))
        y = jax.nn.relu(_conv_or_q(hp["conv2"], y, compute_dtype))
        y = jax.nn.relu(_conv_or_q(hp["conv3"], y, compute_dtype))
        y = jax.nn.relu(_conv_or_q(hp["conv4"], y, compute_dtype))
        y = _conv_or_q(hp["conv5"], y, compute_dtype)

    if not train:
        return y.astype(jnp.float32), feat.astype(jnp.float32), params
    new_params = {
        "vgg": {n: dict(blk) for n, blk in params["vgg"].items()},
        "fc": params["fc"],
        "up": {n: dict(blk) for n, blk in params["up"].items()},
        "head": params["head"],
    }
    for (group, block, key), stats in updated.items():
        new_params[group][block][key] = stats
    return y.astype(jnp.float32), feat.astype(jnp.float32), new_params
