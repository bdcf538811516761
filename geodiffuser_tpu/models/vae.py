"""AutoencoderKL (SD VAE) in flax.linen (NHWC).

Covers both the SD-1.4 built-in VAE and the `stabilityai/sd-vae-ft-mse` swap
the reference performs for v1 models (diffusion.py:126-128) — same
architecture, different weights.  Scaling factor 0.18215 applied by callers
(diffusion.py:63, 96).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D


class VaeAttentionBlock(nn.Module):
    """Single-head self-attention over the spatial grid (diffusers Attention
    in AutoencoderKL mid blocks)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="group_norm", **kw)(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q", **kw)(y)
        k = nn.Dense(c, name="to_k", **kw)(y)
        v = nn.Dense(c, name="to_v", **kw)(y)
        logits = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1)
        y = jnp.einsum("bij,bjd->bid", probs.astype(v.dtype), v)
        y = nn.Dense(c, name="to_out_0", **kw)(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        chans: Tuple[int, ...] = cfg.vae_block_out_channels
        groups = 32 if chans[0] >= 32 else 8
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in", **kw)(x.astype(cfg.dtype))
        for i, ch in enumerate(chans):
            for j in range(cfg.vae_layers_per_block):
                x = ResnetBlock2D(ch, groups=groups, use_time_emb=False,
                                  name=f"down_blocks_{i}_resnets_{j}", **kw)(x)
            if i < len(chans) - 1:
                x = Downsample2D(ch, name=f"down_blocks_{i}_downsamplers_0", **kw)(x)
        x = ResnetBlock2D(chans[-1], groups=groups, use_time_emb=False, name="mid_block_resnets_0", **kw)(x)
        x = VaeAttentionBlock(chans[-1], groups=groups, name="mid_block_attentions_0", **kw)(x)
        x = ResnetBlock2D(chans[-1], groups=groups, use_time_emb=False, name="mid_block_resnets_1", **kw)(x)
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-6, name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.vae_latent_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class Decoder(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        chans = list(reversed(cfg.vae_block_out_channels))
        groups = 32 if chans[-1] >= 32 else 8
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in", **kw)(z.astype(cfg.dtype))
        x = ResnetBlock2D(chans[0], groups=groups, use_time_emb=False, name="mid_block_resnets_0", **kw)(x)
        x = VaeAttentionBlock(chans[0], groups=groups, name="mid_block_attentions_0", **kw)(x)
        x = ResnetBlock2D(chans[0], groups=groups, use_time_emb=False, name="mid_block_resnets_1", **kw)(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.vae_layers_per_block + 1):
                x = ResnetBlock2D(ch, groups=groups, use_time_emb=False,
                                  name=f"up_blocks_{i}_resnets_{j}", **kw)(x)
            if i < len(chans) - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(x)
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-6, name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out", **kw)(x).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode() returns the posterior mean (the reference always uses
    latent_dist.mean: diffusion.py:95, inversion.py:108)."""

    config: ModelConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        kw = dict(dtype=self.config.dtype, param_dtype=self.config.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.vae_latent_channels, (1, 1), name="quant_conv", **kw)
        self.post_quant_conv = nn.Conv(self.config.vae_latent_channels, (1, 1), name="post_quant_conv", **kw)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """(S, H, W, 3) in [-1, 1] -> (S, H/8, W/8, 4) posterior mean (unscaled)."""
        moments = self.quant_conv(self.encoder(x))
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(S, H/8, W/8, 4) unscaled latents -> (S, H, W, 3) in [-1, 1]."""
        return self.decoder(self.post_quant_conv(z.astype(self.config.dtype)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))
