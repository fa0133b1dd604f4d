"""Fused conv+ReLU+pool Pallas kernel vs the XLA chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.models import layers as L
from tuatara_tpu.ops.pallas.stage1 import fused_conv_pool


def _reference(x, w, b, compute_dtype=jnp.float32):
    y = L.conv2d({"w": w, "b": b}, x, compute_dtype=compute_dtype)
    y = jax.nn.relu(y)
    return L.max_pool(y, 2, 2)


@pytest.mark.parametrize("c,o,h,w", [
    (16, 16, 32, 130),   # odd-ish width (only %2 required)
    (8, 16, 16, 64),
    (64, 64, 32, 128),   # full stage-1 widths, small spatial
])
def test_fused_conv_pool_matches_chain(c, o, h, w, rng):
    x = rng.random((2, h, w, c), np.float32)
    wk = (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    b = (rng.standard_normal(o) * 0.1).astype(np.float32)

    got = fused_conv_pool(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b),
                          interpret=True)
    want = _reference(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b))
    assert got.shape == want.shape == (2, h // 2, w // 2, o)
    # Kernel runs bf16 inputs with fp32 accumulation; compare against the
    # fp32 chain at bf16-class tolerance.
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2)


def test_fused_conv_pool_zero_input_edges(rng):
    """SAME zero-padding at the borders: an input with mass only at the
    corners must match (halo rows + packed pad columns)."""
    x = np.zeros((1, 16, 64, 8), np.float32)
    x[0, 0, 0] = 1.0
    x[0, -1, -1] = 1.0
    wk = (rng.standard_normal((3, 3, 8, 8)) * 0.3).astype(np.float32)
    b = (rng.standard_normal(8) * 0.1).astype(np.float32)
    got = fused_conv_pool(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b),
                          interpret=True)
    want = _reference(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_craft_forward_fused_matches_plain(rng):
    """Full CRAFT forward with the fused stage-1 kernel FORCED (interpret on
    CPU) vs the plain XLA path, on a folded serving tree."""
    from tuatara_tpu.config import CraftConfig
    from tuatara_tpu.models import craft as M

    cfg = CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                      up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                      head_channels=(8, 8, 8, 8))
    params = M.fold_batchnorms(
        M.init_craft_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(rng.random((1, 64, 96, 3), np.float32))
    want, _ = M.craft_forward(params, x, cfg, compute_dtype=jnp.bfloat16)
    old = M.FUSED_STAGE1
    M.FUSED_STAGE1 = "on"
    try:
        got, _ = M.craft_forward(params, x, cfg, compute_dtype=jnp.bfloat16)
    finally:
        M.FUSED_STAGE1 = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
    # Grayscale single-channel input broadcasts into conv1_1 on both paths.
    g = jnp.asarray(rng.random((1, 64, 96, 1), np.float32))
    want_g, _ = M.craft_forward(params, g, cfg, compute_dtype=jnp.bfloat16)
    M.FUSED_STAGE1 = "on"
    try:
        got_g, _ = M.craft_forward(params, g, cfg, compute_dtype=jnp.bfloat16)
    finally:
        M.FUSED_STAGE1 = old
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=3e-2, atol=3e-2)
