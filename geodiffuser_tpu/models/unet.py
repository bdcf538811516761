"""SD-1.x UNet2DConditionModel in flax.linen (NHWC, bf16).

Native JAX implementation of the architecture the reference drives through
diffusers (`load_model`, diffusion.py:99-150: CompVis/stable-diffusion-v1-4,
also covers SD-1.5).  Structure:

    conv_in
    down: CrossAttnDownBlock2D x3, DownBlock2D        (layers_per_block=2)
    mid:  UNetMidBlock2DCrossAttn
    up:   UpBlock2D, CrossAttnUpBlock2D x3            (layers_per_block+1=3)
    conv_norm_out / conv_out

16 BasicTransformerBlocks => 32 attention layers, matching the processor
count the reference registers (attention_processors.py:26-53).

Edit hook: pass `edit: EditState` and apply with mutable=['edit'] to collect
the shared-attention losses (see models/attention.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.core.edit_state import EditState
from geodiffuser_tpu.models.attention import Transformer2DModel
from geodiffuser_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,            # (S, H, W, 4) noisy latents, NHWC
        timestep: jnp.ndarray,          # scalar or (S,)
        encoder_hidden_states: jnp.ndarray,  # (S, 77, cross_dim)
        edit: Optional[EditState] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        groups = cfg.norm_num_groups
        chans: Tuple[int, ...] = cfg.block_out_channels
        n_blocks = len(chans)
        context = encoder_hidden_states.astype(cfg.dtype)

        # --- time embedding
        t = jnp.broadcast_to(jnp.asarray(timestep), (sample.shape[0],))
        temb = timestep_embedding(t, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, name="time_embedding", **kw)(temb)

        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in", **kw)(sample.astype(cfg.dtype))

        def attn_block(ch: int, name: str, block_idx: int):
            return Transformer2DModel(
                in_channels=ch,
                heads=cfg.heads_for_block(block_idx),
                cross_attention_dim=cfg.cross_attention_dim,
                num_layers=cfg.transformer_layers_per_block,
                groups=groups,
                remat=cfg.remat,
                use_linear_projection=cfg.use_linear_projection,
                name=name,
                **kw,
            )

        # --- down path
        skips = [x]
        for i, ch in enumerate(chans):
            has_attn = i < n_blocks - 1  # last block is DownBlock2D (no attention)
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=groups, name=f"down_blocks_{i}_resnets_{j}", **kw)(x, temb)
                if has_attn:
                    x = attn_block(ch, f"down_blocks_{i}_attentions_{j}", i)(x, context, edit)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, name=f"down_blocks_{i}_downsamplers_0", **kw)(x)
                skips.append(x)

        # --- mid
        x = ResnetBlock2D(chans[-1], groups=groups, name="mid_block_resnets_0", **kw)(x, temb)
        x = attn_block(chans[-1], "mid_block_attentions_0", n_blocks - 1)(x, context, edit)
        x = ResnetBlock2D(chans[-1], groups=groups, name="mid_block_resnets_1", **kw)(x, temb)

        # --- up path
        rev = list(reversed(chans))
        for i, ch in enumerate(rev):
            has_attn = i > 0  # first up block (mirror of DownBlock2D) has no attention
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, groups=groups, name=f"up_blocks_{i}_resnets_{j}", **kw)(x, temb)
                if has_attn:
                    x = attn_block(ch, f"up_blocks_{i}_attentions_{j}", n_blocks - 1 - i)(x, context, edit)
            # Feature tap per up block (no-op unless applied with
            # mutable=['features']) — backs DIFT-style semantic features for
            # the MD metric (reference: evaluation/dift_sd.py exposes
            # up-block activations via a modified UNet2DConditionModel).
            if not self.is_initializing():
                self.sow("features", f"up_block_{i}", x)
            if i < n_blocks - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(x)

        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)
        return x.astype(jnp.float32)
