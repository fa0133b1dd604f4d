"""Primitive-level parity tests against torch (CPU) on random weights.

Without pretrained checkpoints in this environment, parity is established at
the math level: each JAX primitive must match its torch counterpart so that a
converted state_dict reproduces the original model's activations
(SURVEY.md §4.3 model-parity strategy).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tuatara_tpu.models import layers as L


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.mark.parametrize("k,dil", [(3, 1), (1, 1), (3, 6)])
def test_conv2d_matches_torch(rng, k, dil):
    cin, cout = 5, 7
    x = rng.standard_normal((2, 16, 20, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.1
    b = rng.standard_normal(cout, dtype=np.float32)

    y = L.conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x),
                 dilation=dil, compute_dtype=jnp.float32)

    wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)))  # HWIO -> OIHW
    pad = dil * (k - 1) // 2
    yt = F.conv2d(torch.tensor(to_nchw(x)), wt, torch.tensor(b),
                  padding=pad, dilation=dil)
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch(rng):
    c = 6
    x = rng.standard_normal((2, 8, 8, c), dtype=np.float32)
    p = {
        "scale": jnp.array(rng.standard_normal(c, dtype=np.float32)),
        "bias": jnp.array(rng.standard_normal(c, dtype=np.float32)),
        "mean": jnp.array(rng.standard_normal(c, dtype=np.float32)),
        "var": jnp.array(rng.random(c, dtype=np.float32) + 0.5),
    }
    y = L.batchnorm(p, jnp.array(x))
    yt = F.batch_norm(
        torch.tensor(to_nchw(x)),
        torch.tensor(np.asarray(p["mean"])), torch.tensor(np.asarray(p["var"])),
        torch.tensor(np.asarray(p["scale"])), torch.tensor(np.asarray(p["bias"])),
        training=False, eps=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_maxpool_2x2_matches_torch(rng):
    x = rng.standard_normal((1, 8, 12, 3), dtype=np.float32)
    y = L.max_pool(jnp.array(x), 2, 2)
    yt = F.max_pool2d(torch.tensor(to_nchw(x)), 2, 2)
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)))


def test_maxpool_3x3_stride1_pad1_matches_torch(rng):
    """The CRAFT fc-stage pool: MaxPool2d(kernel=3, stride=1, padding=1)."""
    x = rng.standard_normal((1, 8, 12, 3), dtype=np.float32)
    y = L.max_pool(jnp.array(x), 3, 1, padding="SAME_LOWER")
    yt = F.max_pool2d(torch.tensor(to_nchw(x)), 3, 1, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)))


def test_bilinear_upsample_matches_torch(rng):
    """jax.image.resize bilinear == torch interpolate(align_corners=False)."""
    import jax

    x = rng.standard_normal((1, 5, 7, 4), dtype=np.float32)
    y = jax.image.resize(jnp.array(x), (1, 11, 13, 4), method="bilinear")
    yt = F.interpolate(torch.tensor(to_nchw(x)), size=(11, 13), mode="bilinear",
                       align_corners=False)
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((3, 10, 8), dtype=np.float32)
    w = rng.standard_normal((8, 12), dtype=np.float32) * 0.1
    b = rng.standard_normal(12, dtype=np.float32)
    y = L.linear({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x),
                 compute_dtype=jnp.float32)
    yt = F.linear(torch.tensor(x), torch.tensor(w.T), torch.tensor(b))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)


def test_layernorm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    p = {
        "scale": jnp.array(rng.standard_normal(16, dtype=np.float32)),
        "bias": jnp.array(rng.standard_normal(16, dtype=np.float32)),
    }
    y = L.layernorm(p, jnp.array(x))
    yt = F.layer_norm(torch.tensor(x), (16,),
                      torch.tensor(np.asarray(p["scale"])),
                      torch.tensor(np.asarray(p["bias"])), eps=1e-6)
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-5, atol=1e-5)


def test_mha_matches_torch(rng):
    """Separate-QKV MHA == torch.nn.MultiheadAttention with mapped weights."""
    import jax

    dim, heads, lq, lk = 16, 4, 6, 9
    key = jax.random.PRNGKey(0)
    p = L.init_mha(key, dim)
    xq = rng.standard_normal((2, lq, dim), dtype=np.float32)
    xkv = rng.standard_normal((2, lk, dim), dtype=np.float32)

    y = L.mha(p, jnp.array(xq), jnp.array(xkv), heads, compute_dtype=jnp.float32)

    m = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    with torch.no_grad():
        wq, wk, wv = (np.asarray(p[n]["w"]).T for n in ("q", "k", "v"))
        m.in_proj_weight.copy_(torch.tensor(np.concatenate([wq, wk, wv], 0)))
        m.in_proj_bias.copy_(torch.tensor(np.concatenate(
            [np.asarray(p[n]["b"]) for n in ("q", "k", "v")], 0)))
        m.out_proj.weight.copy_(torch.tensor(np.asarray(p["o"]["w"]).T))
        m.out_proj.bias.copy_(torch.tensor(np.asarray(p["o"]["b"])))
        yt, _ = m(torch.tensor(xq), torch.tensor(xkv), torch.tensor(xkv))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((64,), dtype=np.float32)
    import jax

    y = jax.nn.gelu(jnp.array(x), approximate=False)
    yt = F.gelu(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-5, atol=1e-5)


def test_quantized_conv_close_to_float(rng):
    """int8 per-channel weight + dynamic per-tensor activation quantization
    stays within the expected quantization error envelope of the f32 conv."""
    from tuatara_tpu.models.layers import conv2d, conv2d_q, quantize_conv

    x = jnp.array(rng.standard_normal((2, 16, 24, 32)).astype(np.float32))
    p = {"w": jnp.array((rng.standard_normal((3, 3, 32, 16)) * 0.1).astype(np.float32)),
         "b": jnp.array(rng.standard_normal(16).astype(np.float32))}
    ref = np.asarray(conv2d(p, x, compute_dtype=jnp.float32))
    got = np.asarray(conv2d_q(quantize_conv(p), x, out_dtype=jnp.float32))
    # error scales with the per-output dot length (288) * step sizes; the
    # practical envelope on random data is well under 2% of the output range.
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 0.02 * scale, (
        np.abs(ref - got).max(), scale)


def test_quantized_conv_zero_pad_exact(rng):
    """Zero padding quantizes to exactly zero (no edge bias)."""
    from tuatara_tpu.models.layers import conv2d_q, quantize_conv

    p = quantize_conv({"w": jnp.ones((3, 3, 4, 2), jnp.float32)})
    x = jnp.zeros((1, 4, 4, 4), jnp.float32)
    y = np.asarray(conv2d_q(p, x, out_dtype=jnp.float32))
    np.testing.assert_array_equal(y, 0.0)


def test_quantized_linear_close_to_float(rng):
    from tuatara_tpu.models.layers import linear, quantize_linear

    x = jnp.array(rng.standard_normal((4, 7, 64)).astype(np.float32))
    p = {"w": jnp.array((rng.standard_normal((64, 48)) * 0.1).astype(np.float32)),
         "b": jnp.array(rng.standard_normal(48).astype(np.float32))}
    ref = np.asarray(linear(p, x, compute_dtype=jnp.float32))
    got = np.asarray(linear(quantize_linear(p), x, compute_dtype=jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 0.02 * scale


def test_quantized_u8_first_conv_close_to_float(rng):
    """Zero-point-128 int8 first conv over the uint8 pixel grid: error is
    bounded by WEIGHT quantization only (input recoding is exact), and the
    explicit -128 padding reproduces the reference's zero-pad."""
    from tuatara_tpu.models.layers import conv2d, conv2d_q_u8, quantize_conv

    u8 = rng.integers(0, 256, (2, 16, 24, 3)).astype(np.float32)
    x = jnp.array(u8 / 255.0)
    p = {"w": jnp.array((rng.standard_normal((3, 3, 3, 16)) * 0.2).astype(np.float32)),
         "b": jnp.array(rng.standard_normal(16).astype(np.float32))}
    ref = np.asarray(conv2d(p, x, compute_dtype=jnp.float32))
    qp = quantize_conv(p)
    qp["sumw"] = p["w"].sum((0, 1, 2))
    got = np.asarray(conv2d_q_u8(qp, x, out_dtype=jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 0.01 * scale, (
        np.abs(ref - got).max(), scale)
