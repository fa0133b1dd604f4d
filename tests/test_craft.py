"""CRAFT model structural tests (shapes, determinism, jit, dtype policy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.config import CraftConfig
from tuatara_tpu.models.craft import craft_forward, init_craft_params


@pytest.fixture(scope="module")
def craft_params():
    return init_craft_params(jax.random.PRNGKey(0))


def test_forward_contract(craft_params):
    """Pipeline contract: [B, H/2, W/2, 2] fp32 scores (tuatara.cpp:382-394),
    batched, deterministic under jit, finite, and the bf16 MXU path stays
    within tolerance of full fp32 compute. One test to amortize the compile
    cost on this 1-core host."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 64, 3))
    f = jax.jit(lambda p, x: craft_forward(p, x))
    scores, feat = f(craft_params, x)
    assert scores.shape == (2, 16, 32, 2)
    assert feat.shape == (2, 16, 32, 32)
    assert scores.dtype == jnp.float32
    again, _ = f(craft_params, x)
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(again))
    assert np.isfinite(np.asarray(scores)).all()

    f32 = jax.jit(lambda p, x: craft_forward(p, x, compute_dtype=jnp.float32)[0])
    s32 = f32(craft_params, x)
    err = np.max(np.abs(np.asarray(scores) - np.asarray(s32)))
    scale = np.max(np.abs(np.asarray(s32))) + 1e-6
    assert err / scale < 0.1


def test_param_count_plausible(craft_params):
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(craft_params))
    # Public CRAFT has ~20.8M params; backbone+decoder+head here must land
    # in the same ballpark (BN running stats included in the pytree).
    assert 19e6 < n < 23e6, n
