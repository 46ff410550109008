"""VQ tokenizer tests: torch-oracle parity for the conv blocks (layout and
padding are where NHWC rewrites break) plus structural round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mmada_parallel_tpu.models import vqgan_common as C
from mmada_parallel_tpu.models import magvit2 as M
from mmada_parallel_tpu.models import amused_vq as A


def _to_torch_conv(p):
    # HWIO -> OIHW
    w = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))
    b = torch.tensor(np.asarray(p["b"]))
    return w, b


def test_conv2d_same_matches_torch():
    key = jax.random.key(0)
    p = C.init_conv(key, 3, 3, 5, 7)
    x = np.random.default_rng(0).normal(size=(2, 9, 11, 5)).astype(np.float32)
    got = np.asarray(C.conv2d(p, jnp.asarray(x)))
    w, b = _to_torch_conv(p)
    want = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), w, b, padding=1)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_downsample_asymmetric_pad_matches_torch():
    key = jax.random.key(1)
    p = {"conv": C.init_conv(key, 3, 3, 4, 4)}
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(C.downsample(p, jnp.asarray(x)))
    w, b = _to_torch_conv(p["conv"])
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (0, 1, 0, 1))  # reference: common_modules.py:86-88
    want = F.conv2d(xt, w, b, stride=2).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_matches_torch():
    p = C.init_group_norm(8)
    p = {"scale": p["scale"] + 0.3, "bias": p["bias"] - 0.1}
    x = np.random.default_rng(2).normal(size=(2, 5, 6, 8)).astype(np.float32)
    got = np.asarray(C.group_norm(p, jnp.asarray(x), groups=4, eps=1e-6))
    want = F.group_norm(torch.tensor(x.transpose(0, 3, 1, 2)), 4,
                        torch.tensor(np.asarray(p["scale"])),
                        torch.tensor(np.asarray(p["bias"])), eps=1e-6)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_resnet_block_matches_torch_oracle():
    key = jax.random.key(3)
    p = C.init_resnet_block(key, 8, 12)
    x = np.random.default_rng(3).normal(size=(1, 6, 6, 8)).astype(np.float32)
    got = np.asarray(C.resnet_block(p, jnp.asarray(x), groups=4, eps=1e-6))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    h = F.group_norm(xt, 4, torch.tensor(np.asarray(p["norm1"]["scale"])),
                     torch.tensor(np.asarray(p["norm1"]["bias"])), 1e-6)
    h = h * torch.sigmoid(h)
    w, b = _to_torch_conv(p["conv1"]); h = F.conv2d(h, w, b, padding=1)
    h = F.group_norm(h, 4, torch.tensor(np.asarray(p["norm2"]["scale"])),
                     torch.tensor(np.asarray(p["norm2"]["bias"])), 1e-6)
    h = h * torch.sigmoid(h)
    w, b = _to_torch_conv(p["conv2"]); h = F.conv2d(h, w, b, padding=1)
    w, b = _to_torch_conv(p["nin_shortcut"]); xs = F.conv2d(xt, w, b)
    want = (xs + h).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attn_block_matches_torch_oracle():
    key = jax.random.key(4)
    p = C.init_attn_block(key, 8)
    x = np.random.default_rng(4).normal(size=(1, 4, 5, 8)).astype(np.float32)
    got = np.asarray(C.attn_block(p, jnp.asarray(x), groups=4, eps=1e-6))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    h = F.group_norm(xt, 4, torch.tensor(np.asarray(p["norm"]["scale"])),
                     torch.tensor(np.asarray(p["norm"]["bias"])), 1e-6)
    def cv(name, t):
        w, b = _to_torch_conv(p[name]); return F.conv2d(t, w, b)
    q, k, v = cv("q", h), cv("k", h), cv("v", h)
    B, Cc, H, W = q.shape
    q = q.reshape(B, Cc, H * W).permute(0, 2, 1)
    k = k.reshape(B, Cc, H * W)
    w_ = torch.bmm(q, k) * (Cc ** -0.5)
    w_ = torch.softmax(w_, dim=2)
    v = v.reshape(B, Cc, H * W)
    h_ = torch.bmm(v, w_.permute(0, 2, 1)).reshape(B, Cc, H, W)
    want = (xt + cv("proj_out", h_)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# LFQ / MagViT-v2
# ---------------------------------------------------------------------------


def test_lfq_roundtrip_and_bitpacking():
    z = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 4, 4)),
                    jnp.float32)
    z_q, idx = M.lfq_quantize(z)
    assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < 16
    # MSB-first: z[...,0] > 0 contributes 2^(C-1)
    want0 = (np.asarray(z)[..., 0] > 0).astype(int).reshape(2, -1) * 8
    assert np.all((np.asarray(idx) & 8) == want0)
    # codebook entry reproduces the binarization
    back = M.lfq_codebook_entry(idx, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z_q))


def test_magvit_encode_decode_shapes():
    cfg = M.MagvitConfig.tiny()
    params = M.init_magvit_params(jax.random.key(6), cfg)
    px = jnp.asarray(np.random.default_rng(6).normal(size=(1, 16, 16, 3)),
                     jnp.float32)
    codes = M.magvit_get_code(params, cfg, px)
    assert codes.shape == (1, (16 // cfg.scale) ** 2)
    out = M.magvit_decode_code(params, cfg, codes)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_magvit_full_config_structure():
    """The real config builds and its scale/codebook match the paper specs."""
    cfg = M.MagvitConfig()
    assert cfg.scale == 16
    assert cfg.codebook_size == 8192


def test_lfq_losses_finite_and_grad():
    z = jnp.asarray(np.random.default_rng(7).normal(size=(1, 2, 2, 4)),
                    jnp.float32)
    losses = M.lfq_losses(z)
    assert np.isfinite(float(losses["entropy_loss"]))
    assert np.isfinite(float(losses["commit_loss"]))
    g = jax.grad(lambda zz: M.lfq_losses(zz)["commit_loss"])(z)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# Amused-VQ
# ---------------------------------------------------------------------------


def test_amused_encode_quantize_decode():
    cfg = A.AmusedVQConfig.tiny()
    params = A.init_amused_vq_params(jax.random.key(8), cfg)
    px = jnp.asarray(np.random.default_rng(8).uniform(size=(1, 8, 8, 3)),
                     jnp.float32)
    lat = A.amused_encode(params, cfg, px)
    gh = 8 // cfg.scale
    assert lat.shape == (1, gh, gh, cfg.embed_dim)
    z_q, idx = A.amused_quantize(params, cfg, lat)
    assert idx.shape == (1, gh * gh)
    assert np.asarray(idx).max() < cfg.num_vq_embeddings
    # quantized rows are exact codebook entries (through the STE value path)
    emb = np.asarray(params["quant"]["embedding"])
    np.testing.assert_allclose(
        np.asarray(z_q).reshape(-1, cfg.embed_dim),
        emb[np.asarray(idx).reshape(-1)], atol=1e-6)
    out = A.amused_decode_code(params, cfg, idx, (gh, gh))
    assert out.shape == (1, 8, 8, 3)
    assert np.asarray(out).min() >= 0.0 and np.asarray(out).max() <= 1.0


def test_amused_quantize_is_argmin():
    cfg = A.AmusedVQConfig.tiny()
    params = A.init_amused_vq_params(jax.random.key(9), cfg)
    lat = jnp.asarray(np.random.default_rng(9).normal(
        size=(1, 2, 2, cfg.embed_dim)), jnp.float32)
    _, idx = A.amused_quantize(params, cfg, lat)
    emb = np.asarray(params["quant"]["embedding"])
    z = np.asarray(lat).reshape(-1, cfg.embed_dim)
    want = np.argmin(((z[:, None] - emb[None]) ** 2).sum(-1), axis=1)
    assert np.array_equal(np.asarray(idx).reshape(-1), want)


def test_amused_full_config_scale():
    assert A.AmusedVQConfig().scale == 16  # 2**(5-1), image_utils.py:40
