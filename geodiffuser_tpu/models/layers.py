"""Shared flax.linen building blocks for the SD-1.x model family.

Module and parameter names mirror the diffusers layout (UNet2DConditionModel /
AutoencoderKL) so that checkpoint conversion (models/weights.py) is a
mechanical rename.  All activations are NHWC (TPU-preferred layout; the
torch reference is NCHW).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers convention for SD-1.x
    (flip_sin_to_cos=True, downscale_freq_shift=0): [cos | sin]."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """MLP on the sinusoidal embedding (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.time_embed_dim, name="linear_1", **kw)(sample.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, name="linear_2", **kw)(x)


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv -> +time -> GN -> silu -> conv -> +shortcut
    (diffusers ResnetBlock2D; spec via reference UNet usage)."""

    out_channels: int
    groups: int = 32
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm1", **kw)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", **kw)(h)
        if temb is not None and self.use_time_emb:
            t = nn.Dense(self.out_channels, name="time_emb_proj", **kw)(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm2", **kw)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", **kw)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **kw)(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # diffusers uses asymmetric (0,1) padding for stride-2 convs
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID", name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)


class GEGLU(nn.Module):
    """x W1 * gelu(x W2) feed-forward gate (diffusers GEGLU, 'proj' layout)."""

    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = nn.Dense(self.dim_out * 2, name="proj", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim_out: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim_out * self.mult
        # diffusers names: ff.net.0 (GEGLU), ff.net.2 (Dense); net.1 is dropout
        x = GEGLU(inner, dtype=self.dtype, param_dtype=self.param_dtype, name="net_0")(x)
        return nn.Dense(self.dim_out, name="net_2", dtype=self.dtype, param_dtype=self.param_dtype)(x)
