"""CLIP text encoder (openai/clip-vit-large-patch14) in flax.linen.

The reference obtains prompt embeddings through the diffusers pipeline's
text_encoder (editor.py:106-119, inversion.py:113-128) and always uses the
final-layer hidden states.  Native implementation: 12-layer pre-LN causal
transformer, quick_gelu MLP, learned position embeddings, final LayerNorm.
Parameter names mirror the HF CLIPTextModel layout for weight conversion.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.config import ModelConfig


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, l, _ = x.shape
        d = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="q_proj", **kw)(x) * (d ** -0.5)
        k = nn.Dense(self.hidden, name="k_proj", **kw)(x)
        v = nn.Dense(self.hidden, name="v_proj", **kw)(x)
        q = q.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        logits = logits + mask[None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.hidden)
        return nn.Dense(self.hidden, name="out_proj", **kw)(out)


class CLIPEncoderLayer(nn.Module):
    hidden: int
    heads: int
    hidden_act: str = "quick_gelu"   # SD-2.x OpenCLIP towers use "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1", **kw)(x)
        x = x + CLIPAttention(self.hidden, self.heads, name="self_attn", **kw)(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2", **kw)(x)
        h = nn.Dense(self.hidden * 4, name="mlp_fc1", **kw)(h)
        h = quick_gelu(h) if self.hidden_act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, name="mlp_fc2", **kw)(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) int32 token ids -> (B, 77, hidden) final hidden states."""
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, l = input_ids.shape
        tok = nn.Embed(
            cfg.text_vocab_size, cfg.text_hidden_size, name="token_embedding",
            param_dtype=cfg.param_dtype, dtype=cfg.dtype,
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.text_max_length, cfg.text_hidden_size),
            cfg.param_dtype,
        )
        x = tok + pos[None, :l].astype(cfg.dtype)
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
        for i in range(cfg.text_layers):
            x = CLIPEncoderLayer(
                cfg.text_hidden_size, cfg.text_heads,
                hidden_act=cfg.text_hidden_act, name=f"layers_{i}", **kw
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm", **kw)(x)
        return x.astype(jnp.float32)
