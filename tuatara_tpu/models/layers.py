"""Functional neural-net primitives for tuatara-tpu models.

Pure-functional layers over explicit parameter pytrees (nested dicts), NHWC
activation layout and HWIO kernel layout — the TPU-native convention XLA tiles
best onto the MXU. No framework module system: every layer is
``f(params, x, ...) -> y`` so the whole model is a single traced program under
`jax.jit`, trivially shardable with `jax.sharding`.

The reference executes its models as opaque TorchScript via LibTorch
(tuatara.cpp:333-336, 426-432); these primitives are the rebuild's equivalent
of that runtime layer, with torch (CPU) used in tests only as a math oracle.

Dtype policy: parameters are stored fp32; matmul/conv inputs are cast to a
compute dtype (bfloat16 by default) with fp32 accumulation
(`preferred_element_type`), which keeps the MXU at full rate without
accumulating rounding error.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def he_normal_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Convolution + BatchNorm
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, cin, cout, bias=True) -> Params:
    p = {"w": he_normal_conv(key, kh, kw, cin, cout)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


# Mixed-precision policy: in bf16 mode both operands AND outputs are bf16 —
# the MXU still accumulates fp32 internally, only the stored activation is
# rounded — which keeps fwd/bwd dtype-consistent so jax.grad works through
# every op. In fp32 mode, precision=HIGHEST forbids bf16 pass-splitting so
# results are exact (torch-parity tests rely on this).


def _mm_kwargs(compute_dtype):
    if compute_dtype == jnp.float32:
        return {"precision": jax.lax.Precision.HIGHEST}
    return {}


def conv2d(
    params: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    dilation: int = 1,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    w = params["w"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **_mm_kwargs(compute_dtype),
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def quantize_conv(params: Params) -> Params:
    """Per-output-channel symmetric int8 quantization of conv weights.

    {"w" [kh,kw,ci,co] f32, "b"?} -> {"wq" int8, "sw" [co] f32 dequant
    scales, "b"?}. The v5e MXU runs int8 x int8 -> int32 convolutions at
    ~2x the bf16 rate (measured 3.7 vs 7.2 ms on a 928-GFLOP 128x128
    conv); conv2d_q below pairs this with dynamic per-tensor activation
    quantization. Serving-only (no gradients through rounding).
    """
    w = params["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))           # [co]
    sw = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    out: Params = {"wq": wq, "sw": sw}
    if "b" in params:
        out["b"] = params["b"].astype(jnp.float32)
    return out


def quantize_act(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8 quantization of an activation.

    Returns (xq int8, xs f32 scalar) with x ~= xq / xs. One fused abs-max
    reduction; no calibration state. Zero maps to exactly 0, and for s > 0
    the map is monotone — so relu and max_pool commute with it (an int8
    max-pool of xq IS the quantization of the pooled tensor under the same
    scale), letting quantized conv chains keep activations in int8 across
    relu/pool instead of round-tripping bf16 through HBM.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12)
    xs = 127.0 / amax
    xq = jnp.clip(jnp.round(xf * xs), -127, 127).astype(jnp.int8)
    return xq, xs


# --- Calibrated (static) activation scales ---------------------------------
#
# Dynamic per-tensor quantization pays a full abs-max read of every quantized
# layer's input on every forward — at serving shapes the detector's trunk
# activations alone are multiple GB/batch of extra HBM traffic, and the trace
# shows the saved MXU time partly returning as these reduce passes
# (docs/PERFORMANCE.md int8 section). A calibration pass records each
# quantized layer's observed input abs-max on representative data; freezing
# 127/(amax*margin) into the layer as a static "sx" scale removes the reduce
# (the remaining scale+round+cast fuses into the producer's epilogue since
# the input then has a single consumer). Inputs beyond the calibrated range
# SATURATE — margin > 1 trades a little resolution for clip headroom.

_CALIB: Optional[Dict[int, jnp.ndarray]] = None


class calibration:
    """Context manager collecting per-quantized-layer input abs-max.

    Usage — params must be CLOSED OVER (not jit arguments) so the "wq"
    leaves inside the trace are the concrete arrays whose id() a later
    `make_static_quant` tree walk can match::

        def fwd(x):
            with L.calibration() as col:
                forward(params, x)             # conv2d_q/linear_q record
                return dict(col)               # {id(wq): traced amax}
        stats = jax.jit(fwd)(batch)            # concrete after execution

    Repeat per calibration batch and fold with `merge_calib_stats`.
    """

    def __enter__(self) -> Dict[int, jnp.ndarray]:
        global _CALIB
        self._prev = _CALIB
        _CALIB = {}
        return _CALIB

    def __exit__(self, *exc) -> None:
        global _CALIB
        _CALIB = self._prev


def _observe_act(qp: Params, x: jnp.ndarray) -> None:
    if _CALIB is None:
        return
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    k = id(qp["wq"])
    _CALIB[k] = jnp.maximum(_CALIB[k], amax) if k in _CALIB else amax


def merge_calib_stats(stats: Sequence[Dict[int, Any]]) -> Dict[int, Any]:
    """Elementwise max across per-batch calibration stat dicts."""
    out: Dict[int, Any] = {}
    for s in stats:
        for k, v in s.items():
            out[k] = max(out[k], float(v)) if k in out else float(v)
    return out


def make_static_quant(params, stats: Dict[int, Any], margin: float = 1.1):
    """Freeze calibrated static activation scales into a quantized tree.

    Walks `params`; every dict holding int8 weights ("wq") whose id appears
    in `stats` gains "sx" = 127/(amax*margin), switching conv2d_q/linear_q
    to the reduce-free static path. Layers the calibration forward never
    exercised keep dynamic quantization (correct either way). Idempotent
    over re-calibration (sx is simply replaced)."""
    if isinstance(params, dict):
        if "wq" in params and id(params["wq"]) in stats:
            new = {k: v for k, v in params.items() if k != "sx"}
            amax = max(float(stats[id(params["wq"])]), 1e-12)
            new["sx"] = jnp.float32(127.0 / (amax * margin))
            return new
        return {k: make_static_quant(v, stats, margin) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(make_static_quant(v, stats, margin) for v in params)
    return params


def conv2d_q_pre(
    qp: Params,
    xq: jnp.ndarray,
    xs: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    dilation: int = 1,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Quantized NHWC conv over a PRE-quantized activation (see
    quantize_act): int8 x int8 -> int32, fp32 dequant + bias, `out_dtype`
    output. Zero-padding is exact (0 represents 0.0)."""
    y = jax.lax.conv_general_dilated(
        xq,
        qp["wq"],
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (qp["sw"] / xs)
    if "b" in qp:
        y = y + qp["b"]
    return y.astype(out_dtype)


def conv2d_q(
    qp: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    dilation: int = 1,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Quantized NHWC conv: per-tensor int8 activations x per-channel int8
    weights, int32 accumulation, fp32 dequant + bias.

    The activation scale is dynamic by default (the live batch's abs-max —
    one fused reduction; robust to any input distribution, no calibration
    state). With a calibrated static scale present ("sx", see
    make_static_quant) the reduce is skipped and out-of-range inputs
    saturate. Zero-padding is exact: x=0 quantizes to 0.
    """
    xq, xs = quantize_act_q(qp, x)
    return conv2d_q_pre(qp, xq, xs, stride=stride, padding=padding,
                        dilation=dilation, out_dtype=out_dtype)


def quantize_act_q(qp: Params, x: jnp.ndarray):
    """Quantize an activation against layer `qp` — static scale when
    calibrated ("sx"), else dynamic — recording the observation for the
    calibration collector. Exposed for callers that transform qp["wq"]
    (e.g. width-packing) before running conv2d_q_pre: observing/keying on
    the ORIGINAL block keeps calibration stable across the transform."""
    _observe_act(qp, x)
    if "sx" in qp:
        xs = qp["sx"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * xs), -127, 127
                      ).astype(jnp.int8)
        return xq, xs
    return quantize_act(x)


def conv2d_q_u8(qp: Params, x: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Quantized first conv over a [0,1] image known to lie on the uint8
    grid (x = k/255): zero-point-128 int8 input with EXACT 8-bit fidelity.

    xq = round(x*255) - 128 is an exact affine recoding of the uint8
    pixels (XLA folds the /255 -> *255 round-trip away, so the fp32 image
    never materializes); the conv pads explicitly with -128 (true black,
    matching the reference's zero-pad) and runs VALID int8x int8 -> int32.
    Dequant inverts the affine map: conv(x, w) = (sw*conv_i32 + 128*sumw)
    / 255 + b, with sumw[o] = sum of the fp32 weights per out channel
    (stored at quantization time). For resampled inputs that left the u8
    grid the rounding adds <= 1/510 absolute input error — same class as
    the weight quantization error. 3x3 stride-1 convs only.
    """
    kh, kw = qp["wq"].shape[:2]
    assert (kh, kw) == (3, 3), "u8 zero-point path assumes a 3x3 conv"
    xq = (jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), 0, 255) - 128
          ).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
    y = jax.lax.conv_general_dilated(
        xq, qp["wq"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * qp["sw"] + 128.0 * qp["sumw"]) / 255.0
    if "b" in qp:
        y = y + qp["b"]
    return y.astype(out_dtype)


def init_batchnorm(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def batchnorm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batchnorm using running statistics (fp32)."""
    inv = jax.lax.rsqrt(params["var"] + eps)
    return (x.astype(jnp.float32) - params["mean"]) * (inv * params["scale"]) + params["bias"]


def batchnorm_train(
    params: Params, x: jnp.ndarray, eps: float = 1e-5, momentum: float = 0.1
) -> Tuple[jnp.ndarray, Params]:
    """Training-mode batchnorm: batch statistics + updated running stats.

    torch BatchNorm semantics: normalization uses the BIASED batch variance,
    but the running-var update uses the UNBIASED (Bessel-corrected) estimate."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = jnp.mean(x32, axis=axes)
    var = jnp.var(x32, axis=axes)
    inv = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * (inv * params["scale"]) + params["bias"]
    new = dict(params)
    new["mean"] = (1 - momentum) * params["mean"] + momentum * mean
    unbiased = var * (n / max(n - 1, 1))
    new["var"] = (1 - momentum) * params["var"] + momentum * unbiased
    return y, new


def max_pool(x: jnp.ndarray, window: int, stride: int, padding="VALID") -> jnp.ndarray:
    """NHWC max pooling."""
    if padding == "SAME_LOWER":
        # torch MaxPool2d(k,1,p) symmetric padding with -inf fill
        pad = (window - 1) // 2
        padding = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    else:
        padding = [(0, 0)] * 4 if padding == "VALID" else padding
        if isinstance(padding, str):
            raise ValueError(padding)
    return jax.lax.reduce_window(
        x,
        # Floats keep the weak-typed Python scalar: a device-array init
        # value breaks reverse-mode AD through reduce_window (training
        # path). Integer pools (serving-only, e.g. int8 chains) need the
        # init typed to the operand dtype.
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype),
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


# ---------------------------------------------------------------------------
# Linear / LayerNorm / MLP
# ---------------------------------------------------------------------------

def init_linear(key, cin, cout, bias=True, init=trunc_normal) -> Params:
    p = {"w": init(key, (cin, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def linear(params: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    if "wq" in params:  # quantized weights (quantize_linear) — serving only
        return linear_q(params, x, out_dtype=compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        **_mm_kwargs(compute_dtype),
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def quantize_linear(params: Params) -> Params:
    """Per-output-column symmetric int8 quantization of linear weights
    ({"w" [in,out], "b"?} -> {"wq" int8, "sw" [out], "b"?}); `linear`
    dispatches on the "wq" key, so a transformer encoder quantizes by a
    pure params transform with no forward-code changes."""
    w = params["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    sw = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    out: Params = {"wq": wq, "sw": sw}
    if "b" in params:
        out["b"] = params["b"].astype(jnp.float32)
    return out


def linear_q(qp: Params, x: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Quantized matmul: per-tensor int8 activations x per-column int8
    weights -> int32, fp32 dequant + bias (dynamic or calibrated-static
    activation scale — see conv2d_q)."""
    xq, xs = quantize_act_q(qp, x)
    y = jax.lax.dot_general(
        xq, qp["wq"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (qp["sw"] / xs)
    if "b" in qp:
        y = y + qp["b"]
    return y.astype(out_dtype)


def init_layernorm(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def layernorm(params: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


def init_mlp(key, dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden), "fc2": init_linear(k2, hidden, dim)}


def mlp(params: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    h = jax.nn.gelu(linear(params["fc1"], x, compute_dtype), approximate=False)
    return linear(params["fc2"], h, compute_dtype)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

def init_mha(key, dim: int, qkv_bias: bool = True) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": init_linear(kq, dim, dim, bias=qkv_bias, init=xavier_uniform),
        "k": init_linear(kk, dim, dim, bias=qkv_bias, init=xavier_uniform),
        "v": init_linear(kv, dim, dim, bias=qkv_bias, init=xavier_uniform),
        "o": init_linear(ko, dim, dim, bias=True, init=xavier_uniform),
    }


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)  # [B,H,L,hd]


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B,H,L,hd] tensors.

    mask: broadcastable to [B,H,Lq,Lk]; True/1 = attend, False/0 = blocked.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = (
        jnp.einsum(
            "bhqd,bhkd->bhqk",
            q.astype(compute_dtype),
            k.astype(compute_dtype),
            **_mm_kwargs(compute_dtype),
        ).astype(jnp.float32)
        * scale
    )
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    p = jax.nn.softmax(logits, axis=-1)  # fp32 softmax
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        p.astype(compute_dtype),
        v.astype(compute_dtype),
        **_mm_kwargs(compute_dtype),
    )


def fuse_mha_qkv(params: Params) -> Params:
    """Serving-only transform: concatenate an MHA block's q/k/v projection
    weights into ONE [D, 3D] matmul ({"qkv", "o"} replaces {"q","k","v","o"}).

    Exact: each output column of a matmul is an independent dot product over
    the shared input, so concatenating weight columns changes neither any
    column's math nor its accumulation order — outputs are bit-identical
    (tested). The win is structural: the input activation is read from HBM
    once instead of three times per block, and the int8 path (quantize_linear
    on the fused block — per-COLUMN scales, so quantize-after-fuse equals
    quantize-before-fuse exactly) pays ONE activation-quantization pass
    instead of three. Only self-attention callers can consume the fused
    form (`mha` requires xq is xkv); decoder blocks that cache K/V keep the
    split layout. Idempotent."""
    if "qkv" in params:
        return params
    w = jnp.concatenate(
        [params["q"]["w"], params["k"]["w"], params["v"]["w"]], axis=1)
    qkv: Params = {"w": w}
    if "b" in params["q"]:
        qkv["b"] = jnp.concatenate(
            [params["q"]["b"], params["k"]["b"], params["v"]["b"]])
    return {"qkv": qkv, "o": params["o"]}


def mha(
    params: Params,
    xq: jnp.ndarray,
    xkv: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Multi-head attention; xq [B,Lq,D] attends over xkv [B,Lk,D]."""
    if "qkv" in params:  # fused self-attention projection (fuse_mha_qkv)
        if xq is not xkv:
            raise ValueError(
                "fused-QKV MHA params require self-attention (xq is xkv); "
                "cross-attention blocks must keep the split q/k/v layout")
        d = xq.shape[-1]
        qkv = linear(params["qkv"], xq, compute_dtype)
        q = _split_heads(qkv[..., :d], heads)
        k = _split_heads(qkv[..., d:2 * d], heads)
        v = _split_heads(qkv[..., 2 * d:], heads)
        if mask is not None and mask.ndim == 2:
            mask = mask[None, None]
        out = attention_core(q, k, v, mask, compute_dtype)
        return linear(params["o"], _merge_heads(out), compute_dtype)
    q = _split_heads(linear(params["q"], xq, compute_dtype), heads)
    k = _split_heads(linear(params["k"], xkv, compute_dtype), heads)
    v = _split_heads(linear(params["v"], xkv, compute_dtype), heads)
    if mask is not None and mask.ndim == 2:
        mask = mask[None, None]
    out = attention_core(q, k, v, mask, compute_dtype)
    return linear(params["o"], _merge_heads(out), compute_dtype)


def mha_kv(params: Params, xkv: jnp.ndarray, heads: int, compute_dtype=jnp.bfloat16):
    """Precompute K/V heads for incremental decoding."""
    k = _split_heads(linear(params["k"], xkv, compute_dtype), heads)
    v = _split_heads(linear(params["v"], xkv, compute_dtype), heads)
    return k, v


def mha_with_kv(
    params: Params,
    xq: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Attention with externally cached K/V ([B,H,Lk,hd])."""
    q = _split_heads(linear(params["q"], xq, compute_dtype), heads)
    if mask is not None and mask.ndim == 2:
        mask = mask[None, None]
    out = attention_core(q, k, v, mask, compute_dtype)
    return linear(params["o"], _merge_heads(out), compute_dtype)


# ---------------------------------------------------------------------------
# ViT encoder block (pre-norm, timm-style — used by PARSEQ's encoder)
# ---------------------------------------------------------------------------

def init_vit_block(key, dim: int, mlp_ratio: float) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm1": init_layernorm(dim),
        "attn": init_mha(k1, dim),
        "norm2": init_layernorm(dim),
        "mlp": init_mlp(k2, dim, int(dim * mlp_ratio)),
    }


def vit_block(
    params: Params,
    x: jnp.ndarray,
    heads: int,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    h = layernorm(params["norm1"], x, eps)
    x = x + mha(params["attn"], h, h, heads, compute_dtype=compute_dtype)
    x = x + mlp(params["mlp"], layernorm(params["norm2"], x, eps), compute_dtype)
    return x
