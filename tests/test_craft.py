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


def test_fold_batchnorms_matches_unfolded():
    """Folded params (BN removed, conv rescaled) reproduce the live-BN
    forward exactly in fp32, drop the bn entries, and fold idempotently."""
    from tuatara_tpu.models.craft import fold_batchnorms

    cfg = CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8),
    )
    params = init_craft_params(jax.random.PRNGKey(2), cfg)
    # Randomize BN affine + running stats so folding is non-trivial.
    rng = np.random.default_rng(0)

    def randomize(p):
        for blk in p["vgg"].values():
            bn = blk["bn"]
            for k in ("scale", "bias", "mean"):
                bn[k] = jnp.asarray(rng.normal(0, 0.5, bn[k].shape), jnp.float32)
            bn["var"] = jnp.asarray(rng.uniform(0.5, 1.5, bn["var"].shape), jnp.float32)
        for blk in p["up"].values():
            for k in ("bn1", "bn2"):
                for s in ("scale", "bias", "mean"):
                    blk[k][s] = jnp.asarray(rng.normal(0, 0.5, blk[k][s].shape), jnp.float32)
                blk[k]["var"] = jnp.asarray(rng.uniform(0.5, 1.5, blk[k]["var"].shape), jnp.float32)
        return p

    params = randomize(params)
    folded = fold_batchnorms(params, eps=cfg.bn_eps)
    assert "bn" not in folded["vgg"]["conv1_1"]
    assert "bn1" not in folded["up"]["upconv1"]
    assert fold_batchnorms(folded) is folded  # idempotent

    x = jnp.asarray(rng.random((1, 32, 64, 3)), jnp.float32)
    a, _ = jax.jit(lambda p: craft_forward(p, x, cfg, compute_dtype=jnp.float32))(params)
    b, _ = jax.jit(lambda p: craft_forward(p, x, cfg, compute_dtype=jnp.float32))(folded)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # Training-mode forward must refuse folded trees.
    from tuatara_tpu.models.craft import craft_forward_train

    with pytest.raises(ValueError, match="BN-folded"):
        craft_forward_train(folded, x, cfg)


def test_param_count_plausible(craft_params):
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(craft_params))
    # Public CRAFT has ~20.8M params; backbone+decoder+head here must land
    # in the same ballpark (BN running stats included in the pytree).
    assert 19e6 < n < 23e6, n


def test_pack4_conv_exact_property():
    """Width-packed conv == plain conv for random channel/width combos
    (pure-selection weight expansion; fp32 HIGHEST precision)."""
    from tuatara_tpu.models.craft import _pack4, _pack4_conv_w, _pack4_1x1_w, _unpack4
    from tuatara_tpu.models import layers as L
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for (C, O, H, W) in [(1, 5, 6, 8), (8, 8, 4, 16), (16, 2, 5, 12), (3, 7, 4, 20)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(O), jnp.float32)
        ref = np.asarray(L.conv2d({"w": w, "b": b}, x, compute_dtype=jnp.float32))
        got = np.asarray(_unpack4(L.conv2d(
            {"w": _pack4_conv_w(w), "b": jnp.tile(b, 4)},
            _pack4(x), compute_dtype=jnp.float32)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        w1 = jnp.asarray(rng.standard_normal((1, 1, C, O)), jnp.float32)
        ref1 = np.asarray(L.conv2d({"w": w1}, x, compute_dtype=jnp.float32))
        got1 = np.asarray(_unpack4(L.conv2d(
            {"w": _pack4_1x1_w(w1)}, _pack4(x), compute_dtype=jnp.float32)))
        np.testing.assert_allclose(got1, ref1, rtol=1e-5, atol=1e-5)


def test_pack4_quantized_conv_bit_exact():
    """Width-packed INT8 conv is BIT-equal to the unpacked int8 conv: the
    packed weight expansion's zero slots are exact int8 zeros and int32
    accumulation has no ordering error (stronger than the float packed
    path's f32-accumulation-order equivalence). This is the property the
    quantized serving head relies on (craft.py pconv)."""
    from tuatara_tpu.models.craft import _pack4, _pack4_conv_w, _unpack4
    from tuatara_tpu.models import layers as L
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for (C, O, H, W) in [(8, 8, 4, 16), (16, 32, 6, 24), (3, 5, 4, 20)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        qp = L.quantize_conv({
            "w": jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.2,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal(O), jnp.float32),
        })
        ref = np.asarray(L.conv2d_q(qp, x, out_dtype=jnp.float32))
        xq, xs = L.quantize_act_q(qp, x)
        got = np.asarray(_unpack4(L.conv2d_q_pre(
            {"wq": _pack4_conv_w(qp["wq"]), "sw": jnp.tile(qp["sw"], 4),
             "b": jnp.tile(qp["b"], 4)},
            _pack4(xq), xs, out_dtype=jnp.float32)))
        np.testing.assert_array_equal(got, ref)
