"""Training-step and sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.parallel.mesh import make_mesh
from tuatara_tpu.train.losses import (
    gen_permutations,
    perm_attention_masks,
)
from tuatara_tpu.train.trainer import (
    init_train_state,
    shard_batch,
    shard_train_state,
    train_step,
)

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


def _batch(rng, B=2, N=4, T=7):
    return {
        "pages": jnp.asarray(rng.random((B, 64, 64, 3)), jnp.float32),
        "heat": jnp.asarray(rng.random((B, 32, 32, 2)), jnp.float32),
        "crops": jnp.asarray(rng.random((N, 32, 128, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 90, (N, T + 2)), jnp.int32),
        "lengths": jnp.full((N,), 5, jnp.int32),
    }


def test_device_count():
    assert len(jax.devices()) == 8  # conftest virtual devices


def test_gen_permutations():
    p = gen_permutations(jax.random.PRNGKey(0), 7, 6)
    assert p.shape == (6, 7)
    np.testing.assert_array_equal(np.asarray(p[0]), np.arange(1, 8))
    np.testing.assert_array_equal(np.asarray(p[1]), np.arange(7, 0, -1))
    for row in np.asarray(p):
        assert sorted(row) == list(range(1, 8))


def test_perm_mask_lr_is_causal():
    m = np.asarray(perm_attention_masks(jnp.arange(1, 8), 7))
    T = 8
    for q in range(T):
        for c in range(T):
            # left-to-right: query q sees BOS and tokens strictly before q+1
            assert m[q, c] == (c <= q), (q, c)


def test_train_step_runs_and_descends():
    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng)
    import functools

    step = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        state, metrics = step(state, batch, key)  # same key: same perms
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # optimizing the same batch descends
    assert int(state.step) == 4


def test_train_step_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng, B=4, N=8)
    import functools

    stepf = functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ)

    _, m_single = jax.jit(stepf)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
    sstate = shard_train_state(mesh, state, tx)
    sbatch = shard_batch(mesh, batch)
    news, m_shard = jax.jit(stepf)(sstate, sbatch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4,
    )
    # tp weights actually sharded
    w = news.parseq_params["enc"][0]["attn"]["q"]["w"]
    assert len(w.sharding.device_set) == 8


def test_shard_mid_training_preserves_optimizer_state():
    """Sharding a mid-training state must keep Adam moments/step (regression:
    an earlier version re-ran tx.init, silently zeroing them)."""
    import functools

    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng, B=4, N=8)
    stepf = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    key = jax.random.PRNGKey(1)

    s1, _ = stepf(state, batch, key)
    _, m2_plain = stepf(s1, batch, key)

    mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
    s1_sharded = shard_train_state(mesh, jax.device_get(s1), tx)
    _, m2_sharded = stepf(s1_sharded, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(m2_plain["loss"]), float(m2_sharded["loss"]), rtol=2e-4)


def test_run_stream_propagates_producer_errors():
    """A bad batch in the stream raises instead of deadlocking."""
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)

    def gen():
        yield np.zeros((1, 64, 64, 3), np.uint8)
        raise RuntimeError("bad batch source")

    with pytest.raises(RuntimeError, match="bad batch source"):
        eng.run_stream(gen())


def test_engine_with_mesh_matches_unsharded():
    from tuatara_tpu.api import OcrEngine

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 255, (3, 96, 96, 3)).astype(np.uint8)  # 3 % dp != 0
    plain = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    mesh = make_mesh(8, axes=("dp",))
    sharded = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0, mesh=mesh)
    a = plain.run_pages(pages)
    b = sharded.run_pages(pages)
    assert len(b) == 3
    for ra, rb in zip(a, b):
        assert [i["text"] for i in ra] == [i["text"] for i in rb]
        assert [i["bbox"] for i in ra] == [i["bbox"] for i in rb]
