"""Weight-conversion tests.

No pretrained artifacts exist in this environment, so conversion is validated
structurally (converted trees must match the init trees leaf-for-leaf in
path and shape) and functionally for the tricky transforms (fused qkv split,
patch-embed conv -> GEMM) against torch on random weights.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig, ParseqConfig
from tuatara_tpu.models.craft import init_craft_params
from tuatara_tpu.models.parseq import init_parseq_params, parseq_encode
from tuatara_tpu.utils.convert import (
    convert_craft_state_dict,
    convert_parseq_state_dict,
)
from tuatara_tpu.utils.weights import flatten_tree


def _synthetic_craft_sd(rng):
    """Upstream-shaped CRAFT state_dict (clovaai naming, torchvision vgg16_bn
    feature indices) with random values."""
    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128),
             (128, 256), (256, 256), (256, 256),
             (256, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    idxs = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37]

    def slice_of(i):
        return "slice1" if i < 12 else "slice2" if i < 19 else "slice3" if i < 29 else "slice4"

    for (cin, cout), idx in zip(chans, idxs):
        b = f"basenet.{slice_of(idx)}.{idx}"
        sd[f"{b}.weight"] = rng.standard_normal((cout, cin, 3, 3), dtype=np.float32)
        sd[f"{b}.bias"] = rng.standard_normal(cout, dtype=np.float32)
        bn = f"basenet.{slice_of(idx + 1)}.{idx + 1}"
        for suffix, val in [("weight", np.ones), ("bias", np.zeros),
                            ("running_mean", np.zeros), ("running_var", np.ones)]:
            sd[f"{bn}.{suffix}"] = val(cout, dtype=np.float32)
    sd["basenet.slice5.1.weight"] = rng.standard_normal((1024, 512, 3, 3), dtype=np.float32)
    sd["basenet.slice5.1.bias"] = rng.standard_normal(1024, dtype=np.float32)
    sd["basenet.slice5.2.weight"] = rng.standard_normal((1024, 1024, 1, 1), dtype=np.float32)
    sd["basenet.slice5.2.bias"] = rng.standard_normal(1024, dtype=np.float32)
    upspec = [(1536, 512, 256), (768, 256, 128), (384, 128, 64), (192, 64, 32)]
    for i, (cin, mid, out) in enumerate(upspec, start=1):
        b = f"upconv{i}.conv"
        sd[f"{b}.0.weight"] = rng.standard_normal((mid, cin, 1, 1), dtype=np.float32)
        sd[f"{b}.0.bias"] = rng.standard_normal(mid, dtype=np.float32)
        for suffix, val in [("weight", np.ones), ("bias", np.zeros),
                            ("running_mean", np.zeros), ("running_var", np.ones)]:
            sd[f"{b}.1.{suffix}"] = val(mid, dtype=np.float32)
        sd[f"{b}.3.weight"] = rng.standard_normal((out, mid, 3, 3), dtype=np.float32)
        sd[f"{b}.3.bias"] = rng.standard_normal(out, dtype=np.float32)
        for suffix, val in [("weight", np.ones), ("bias", np.zeros),
                            ("running_mean", np.zeros), ("running_var", np.ones)]:
            sd[f"{b}.4.{suffix}"] = val(out, dtype=np.float32)
    headspec = [(32, 32, 3), (32, 32, 3), (32, 16, 3), (16, 16, 1), (16, 2, 1)]
    for j, (cin, cout, k) in zip([0, 2, 4, 6, 8], headspec):
        sd[f"conv_cls.{j}.weight"] = rng.standard_normal((cout, cin, k, k), dtype=np.float32)
        sd[f"conv_cls.{j}.bias"] = rng.standard_normal(cout, dtype=np.float32)
    return sd


@pytest.mark.slow
def test_craft_conversion_structure(rng):
    sd = _synthetic_craft_sd(rng)
    converted = convert_craft_state_dict(sd)
    ref = init_craft_params(jax.random.PRNGKey(0))
    got = {k: v.shape for k, v in flatten_tree(converted).items()}
    want = {k: v.shape for k, v in flatten_tree(ref).items()}
    assert got == want


def _synthetic_parseq_sd(rng, cfg):
    D = cfg.embed_dim
    ph, pw = cfg.patch_size
    sd = {
        "encoder.patch_embed.proj.weight": rng.standard_normal((D, 3, ph, pw), dtype=np.float32),
        "encoder.patch_embed.proj.bias": rng.standard_normal(D, dtype=np.float32),
        "encoder.pos_embed": rng.standard_normal((1, cfg.seq_len, D), dtype=np.float32) * 0.02,
        "encoder.norm.weight": np.ones(D, np.float32),
        "encoder.norm.bias": np.zeros(D, np.float32),
        "text_embed.embedding.weight": rng.standard_normal((cfg.num_tokens, D), dtype=np.float32),
        "pos_queries": rng.standard_normal((1, cfg.max_label_length + 1, D), dtype=np.float32),
        "decoder.norm.weight": np.ones(D, np.float32),
        "decoder.norm.bias": np.zeros(D, np.float32),
        "head.weight": rng.standard_normal((cfg.charset_size + 1, D), dtype=np.float32),
        "head.bias": rng.standard_normal(cfg.charset_size + 1, dtype=np.float32),
    }
    H = int(D * cfg.enc_mlp_ratio)
    for i in range(cfg.enc_depth):
        b = f"encoder.blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.standard_normal((3 * D, D), dtype=np.float32)
        sd[f"{b}.attn.qkv.bias"] = rng.standard_normal(3 * D, dtype=np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.standard_normal((D, D), dtype=np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.standard_normal(D, dtype=np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal((H, D), dtype=np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.standard_normal(H, dtype=np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal((D, H), dtype=np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.standard_normal(D, dtype=np.float32)
    Hd = int(D * cfg.dec_mlp_ratio)
    for i in range(cfg.dec_depth):
        b = f"decoder.layers.{i}"
        for attn in ("self_attn", "cross_attn"):
            sd[f"{b}.{attn}.in_proj_weight"] = rng.standard_normal((3 * D, D), dtype=np.float32)
            sd[f"{b}.{attn}.in_proj_bias"] = rng.standard_normal(3 * D, dtype=np.float32)
            sd[f"{b}.{attn}.out_proj.weight"] = rng.standard_normal((D, D), dtype=np.float32)
            sd[f"{b}.{attn}.out_proj.bias"] = rng.standard_normal(D, dtype=np.float32)
        for ln in ("norm_q", "norm_c", "norm1", "norm2"):
            sd[f"{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.linear1.weight"] = rng.standard_normal((Hd, D), dtype=np.float32)
        sd[f"{b}.linear1.bias"] = rng.standard_normal(Hd, dtype=np.float32)
        sd[f"{b}.linear2.weight"] = rng.standard_normal((D, Hd), dtype=np.float32)
        sd[f"{b}.linear2.bias"] = rng.standard_normal(D, dtype=np.float32)
    return sd


CFG = ParseqConfig(embed_dim=32, enc_depth=2, enc_heads=4, dec_heads=4,
                   max_label_length=7)


def test_parseq_conversion_structure(rng):
    sd = _synthetic_parseq_sd(rng, CFG)
    converted = convert_parseq_state_dict(sd, CFG)
    ref = init_parseq_params(jax.random.PRNGKey(0), CFG)
    got = {k: v.shape for k, v in flatten_tree(converted).items()}
    want = {k: v.shape for k, v in flatten_tree(ref).items()}
    assert got == want


def test_patch_embed_conversion_matches_torch_conv(rng):
    """Converted patch-embed GEMM == torch stride-patch conv."""
    import torch.nn.functional as F

    cfg = CFG
    sd = _synthetic_parseq_sd(rng, cfg)
    params = convert_parseq_state_dict(sd, cfg)
    img = rng.random((2, 32, 128, 3), np.float32)

    # torch: conv with kernel=stride=patch -> [N, D, gh, gw] -> tokens
    w = torch.tensor(sd["encoder.patch_embed.proj.weight"])
    b = torch.tensor(sd["encoder.patch_embed.proj.bias"])
    x = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
    y = F.conv2d(x, w, b, stride=cfg.patch_size)
    tokens_t = y.flatten(2).transpose(1, 2).numpy()  # [N, gh*gw, D]

    from tuatara_tpu.models import layers as L

    n = img.shape[0]
    gh, gw = 32 // cfg.patch_size[0], 128 // cfg.patch_size[1]
    xj = jnp.array(img).reshape(n, gh, cfg.patch_size[0], gw, cfg.patch_size[1], 3)
    xj = xj.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, -1)
    tokens_j = L.linear({"w": jnp.array(params["patch_embed"]["w"]),
                         "b": jnp.array(params["patch_embed"]["b"])},
                        xj, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(tokens_j), tokens_t, rtol=1e-4, atol=1e-4)


class _TorchCraft(torch.nn.Module):
    """Upstream-shaped CRAFT (clovaai structure + torchvision vgg16_bn
    indices) at tiny channel widths — the functional oracle for conversion."""

    def __init__(self, c=(8, 16, 16, 16, 16), fc=16,
                 up=((16, 16), (16, 16), (16, 8), (8, 8)), head=(8, 8, 8, 8)):
        super().__init__()
        nn = torch.nn

        def cbr(cin, cout):
            return [nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU()]

        feats = (
            cbr(3, c[0]) + cbr(c[0], c[0]) + [nn.MaxPool2d(2, 2)]
            + cbr(c[0], c[1]) + cbr(c[1], c[1]) + [nn.MaxPool2d(2, 2)]
            + cbr(c[1], c[2]) + cbr(c[2], c[2]) + cbr(c[2], c[2]) + [nn.MaxPool2d(2, 2)]
            + cbr(c[2], c[3]) + cbr(c[3], c[3]) + cbr(c[3], c[3]) + [nn.MaxPool2d(2, 2)]
            + cbr(c[3], c[4]) + cbr(c[4], c[4])
        )

        class Base(nn.Module):
            def __init__(self):
                super().__init__()
                for name, rng_ in [("slice1", range(0, 12)), ("slice2", range(12, 19)),
                                   ("slice3", range(19, 29)), ("slice4", range(29, 39))]:
                    seq = nn.Sequential()
                    for i in rng_:
                        seq.add_module(str(i), feats[i])
                    setattr(self, name, seq)
                self.slice5 = nn.Sequential(
                    nn.MaxPool2d(3, 1, 1),
                    nn.Conv2d(c[4], fc, 3, padding=6, dilation=6),
                    nn.Conv2d(fc, fc, 1),
                )

        self.basenet = Base()

        def double_conv(cin, mid, out):
            return nn.Sequential(
                nn.Conv2d(cin, mid, 1), nn.BatchNorm2d(mid), nn.ReLU(),
                nn.Conv2d(mid, out, 3, padding=1), nn.BatchNorm2d(out), nn.ReLU(),
            )

        in_chs = [fc + c[4], up[0][1] + c[3], up[1][1] + c[2], up[2][1] + c[1]]
        for i, ((mid, out), cin) in enumerate(zip(up, in_chs), start=1):
            blk = nn.Module()
            blk.conv = double_conv(cin, mid, out)
            setattr(self, f"upconv{i}", blk)
        h = head
        self.conv_cls = nn.Sequential(
            nn.Conv2d(up[-1][1], h[0], 3, padding=1), nn.ReLU(),
            nn.Conv2d(h[0], h[1], 3, padding=1), nn.ReLU(),
            nn.Conv2d(h[1], h[2], 3, padding=1), nn.ReLU(),
            nn.Conv2d(h[2], h[3], 1), nn.ReLU(),
            nn.Conv2d(h[3], 2, 1),
        )

    def forward(self, x):
        import torch.nn.functional as F

        b = self.basenet
        h = b.slice1(x); f2 = h
        h = b.slice2(h); f3 = h
        h = b.slice3(h); f4 = h
        h = b.slice4(h); f5 = h
        h = b.slice5(h)
        y = torch.cat([h, f5], dim=1)
        y = self.upconv1.conv(y)
        y = F.interpolate(y, size=f4.shape[2:], mode="bilinear", align_corners=False)
        y = self.upconv2.conv(torch.cat([y, f4], dim=1))
        y = F.interpolate(y, size=f3.shape[2:], mode="bilinear", align_corners=False)
        y = self.upconv3.conv(torch.cat([y, f3], dim=1))
        y = F.interpolate(y, size=f2.shape[2:], mode="bilinear", align_corners=False)
        feat = self.upconv4.conv(torch.cat([y, f2], dim=1))
        return self.conv_cls(feat).permute(0, 2, 3, 1)


def test_craft_full_model_conversion_matches_torch(rng):
    """End-to-end functional conversion parity: a randomly-initialized
    upstream-structured torch CRAFT and our JAX CRAFT with the converted
    weights produce the same scores on the same input."""
    from tuatara_tpu.config import CraftConfig
    from tuatara_tpu.models.craft import craft_forward

    torch.manual_seed(0)
    m = _TorchCraft().eval()
    # randomize BN running stats so inference-mode BN is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    cfg = CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                      up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                      head_channels=(8, 8, 8, 8))
    params = convert_craft_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)

    x = rng.random((1, 64, 96, 3), np.float32)
    with torch.no_grad():
        want = m(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got, _ = craft_forward(params, jnp.array(x), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_parseq_encoder_conversion_matches_torch(rng):
    """Full encoder functional parity: timm-style ViT in torch vs our
    converted JAX encoder on the same input."""
    import torch.nn.functional as F

    from tuatara_tpu.models.parseq import parseq_encode

    cfg = CFG
    D = cfg.embed_dim
    sd = _synthetic_parseq_sd(rng, cfg)
    params = jax.tree.map(jnp.asarray, convert_parseq_state_dict(sd, cfg))

    x_img = rng.random((2, 32, 128, 3), np.float32)

    def t(name):
        return torch.tensor(sd[name])

    with torch.no_grad():
        x = torch.tensor(np.transpose(x_img, (0, 3, 1, 2)))
        h = F.conv2d(x, t("encoder.patch_embed.proj.weight"),
                     t("encoder.patch_embed.proj.bias"), stride=cfg.patch_size)
        h = h.flatten(2).transpose(1, 2)  # [N, S, D]
        h = h + t("encoder.pos_embed")
        heads = cfg.enc_heads
        for i in range(cfg.enc_depth):
            b = f"encoder.blocks.{i}"
            hn = F.layer_norm(h, (D,), t(f"{b}.norm1.weight"), t(f"{b}.norm1.bias"), 1e-6)
            qkv = F.linear(hn, t(f"{b}.attn.qkv.weight"), t(f"{b}.attn.qkv.bias"))
            q, k, v = qkv.chunk(3, dim=-1)

            def split(z):
                n, s, _ = z.shape
                return z.reshape(n, s, heads, D // heads).transpose(1, 2)

            attn = F.scaled_dot_product_attention(split(q), split(k), split(v))
            attn = attn.transpose(1, 2).reshape(h.shape)
            h = h + F.linear(attn, t(f"{b}.attn.proj.weight"), t(f"{b}.attn.proj.bias"))
            hn = F.layer_norm(h, (D,), t(f"{b}.norm2.weight"), t(f"{b}.norm2.bias"), 1e-6)
            hh = F.gelu(F.linear(hn, t(f"{b}.mlp.fc1.weight"), t(f"{b}.mlp.fc1.bias")))
            h = h + F.linear(hh, t(f"{b}.mlp.fc2.weight"), t(f"{b}.mlp.fc2.bias"))
        want = F.layer_norm(h, (D,), t("encoder.norm.weight"), t("encoder.norm.bias"), 1e-6).numpy()

    got = parseq_encode(params, jnp.array(x_img), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_qkv_split_matches_torch_mha(rng):
    """Fused in_proj split == torch nn.MultiheadAttention."""
    D, heads = 32, 4
    wq = rng.standard_normal((3 * D, D), dtype=np.float32)
    bq = rng.standard_normal(3 * D, dtype=np.float32)
    wo = rng.standard_normal((D, D), dtype=np.float32)
    bo = rng.standard_normal(D, dtype=np.float32)

    from tuatara_tpu.models import layers as L
    from tuatara_tpu.utils.convert import _split_qkv

    p = _split_qkv(wq, bq, D)
    p["o"] = {"w": wo.T, "b": bo}

    xq = rng.standard_normal((2, 5, D), dtype=np.float32)
    xkv = rng.standard_normal((2, 9, D), dtype=np.float32)
    y = L.mha({k: {kk: jnp.array(vv) for kk, vv in v.items()} for k, v in p.items()},
              jnp.array(xq), jnp.array(xkv), heads, compute_dtype=jnp.float32)

    m = torch.nn.MultiheadAttention(D, heads, batch_first=True)
    with torch.no_grad():
        m.in_proj_weight.copy_(torch.tensor(wq))
        m.in_proj_bias.copy_(torch.tensor(bq))
        m.out_proj.weight.copy_(torch.tensor(wo))
        m.out_proj.bias.copy_(torch.tensor(bo))
        yt, _ = m(torch.tensor(xq), torch.tensor(xkv), torch.tensor(xkv))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-4)


def test_craft_conversion_strips_wrapper_prefix(rng):
    """A CRAFT checkpoint whose keys carry a tracing-wrapper attribute path
    (e.g. re-traced inside a wrapper module -> 'net.basenet...') converts to
    the identical pytree (VERDICT r2 #6 — first-contact robustness)."""

    class Wrapper(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.net = inner

        def forward(self, x):
            return self.net(x)

    torch.manual_seed(0)
    m = _TorchCraft().eval()
    plain = convert_craft_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()},
        CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                    head_channels=(8, 8, 8, 8)))
    wrapped_sd = {k: v.numpy() for k, v in Wrapper(m).state_dict().items()}
    assert all(k.startswith("net.") for k in wrapped_sd)
    wrapped = convert_craft_state_dict(
        wrapped_sd,
        CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                    head_channels=(8, 8, 8, 8)))
    jax.tree.map(np.testing.assert_array_equal, plain, wrapped)


def test_parseq_conversion_strips_wrapper_prefix(rng):
    """Same for PARSEQ: a doubly-wrapped state dict ('system.model.encoder...')
    converts identically to the bare one."""
    sd = _synthetic_parseq_sd(rng, CFG)
    plain = convert_parseq_state_dict(sd, CFG)
    wrapped = convert_parseq_state_dict(
        {f"system.model.{k}": v for k, v in sd.items()}, CFG)
    jax.tree.map(np.testing.assert_array_equal, plain, wrapped)


def test_missing_key_lists_nearest_actual_keys(rng):
    """A genuinely absent key must raise with candidate real keys in the
    message — diagnosable without a debugger."""
    sd = _synthetic_parseq_sd(rng, CFG)
    renamed = {k.replace("encoder.norm.", "encoder.final_norm."): v
               for k, v in sd.items()}
    with pytest.raises(KeyError) as ei:
        convert_parseq_state_dict(renamed, CFG)
    msg = str(ei.value)
    assert "encoder.norm.weight" in msg  # the key it looked for
    assert "final_norm" in msg           # the nearest real key, suggested


def test_load_torch_state_dict_accepts_plain_checkpoints(tmp_path, rng):
    """First-contact robustness: the converter's loader accepts a plain
    torch.save'd state dict and the common {'state_dict': ...} checkpoint
    wrapper under the reference filenames, not just TorchScript archives."""
    from tuatara_tpu.utils.convert import _load_torch_state_dict

    sd = {"a.weight": torch.tensor([[1.0, 2.0]]), "a.bias": torch.tensor([3.0])}

    p1 = str(tmp_path / "bare.pt")
    torch.save(sd, p1)
    got = _load_torch_state_dict(p1)
    np.testing.assert_array_equal(got["a.weight"], [[1.0, 2.0]])

    p2 = str(tmp_path / "wrapped.pt")
    torch.save({"epoch": 7, "state_dict": sd}, p2)
    got = _load_torch_state_dict(p2)
    np.testing.assert_array_equal(got["a.bias"], [3.0])

    p3 = str(tmp_path / "garbage.pt")
    with open(p3, "wb") as f:
        f.write(b"not a torch file")
    with pytest.raises(ValueError, match="neither"):
        _load_torch_state_dict(p3)


def test_load_torch_checkpoint_module_wrapper(tmp_path):
    """{'model': <nn.Module>} checkpoints (yolov5/fairseq style) must
    unwrap to the module's state dict, not silently yield {} (which would
    surface downstream as a KeyError listing zero 'nearest actual keys')."""
    import torch

    from tuatara_tpu.utils.convert import _load_torch_state_dict

    mod = torch.nn.Conv2d(3, 4, 3)
    path = str(tmp_path / "wrapped.pt")
    torch.save({"model": mod}, path)
    sd = _load_torch_state_dict(path)
    assert set(sd) == {"weight", "bias"}
    assert sd["weight"].shape == (4, 3, 3, 3)
