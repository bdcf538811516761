"""UNet attention modules with the GeoDiffuser edit hook.

Replaces the reference's processor-swap machinery
(register_attention_control_diffusers / EditProcessor / VanillaAttentionProcessor,
attention_processors.py:26-228): instead of monkey-patching 32 processor
objects and mutating controller flags per phase, the edit behavior is a pure
function of the `EditState` pytree passed through `__call__`; `edit=None`
gives vanilla attention.

Edit losses are collected via linen `sow` into the 'edit' collection:
   apply(..., mutable=['edit']) -> state['edit']['...']['loss'] summed over
   the 32 attention layers — the functional replacement for
   `controller.loss +=` (attention_processors.py:494, 604).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.core import edit_attention
from geodiffuser_tpu.core.edit_state import EditState, RecordTaps


def _sum_reduce(a, b):
    return jax.tree.map(jnp.add, a, b)


def _replace_reduce(a, b):
    return b


class Attention(nn.Module):
    """Multi-head attention, diffusers parameter layout (to_q/to_k/to_v/to_out.0).

    Inputs are (S, L, C) where S is the CFG-stream axis (the reference's
    batch); heads stay an explicit axis internally.
    """

    query_dim: int
    heads: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        edit: Optional[EditState] = None,
    ) -> jnp.ndarray:
        is_cross = encoder_hidden_states is not None
        context = encoder_hidden_states if is_cross else hidden_states
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        inner = self.query_dim
        head_dim = inner // self.heads
        scale = head_dim ** -0.5

        q = nn.Dense(inner, name="to_q", **kw)(hidden_states)
        k = nn.Dense(inner, name="to_k", **kw)(context)
        v = nn.Dense(inner, name="to_v", **kw)(context)

        s, lq, _ = q.shape
        lk = k.shape[1]
        # (S, H, L, D)
        q = q.reshape(s, lq, self.heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(s, lk, self.heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(s, lk, self.heads, head_dim).transpose(0, 2, 1, 3)

        # Attention-map capture (reference AttentionStore keeps maps up to
        # 16^2 tokens, attention_sharing.py:168-179): only when the caller
        # makes 'attn_store' mutable, and only for small maps.
        if (
            self.is_mutable_collection("attn_store")
            and not self.is_initializing()
            and lq <= 16 * 16
        ):
            probs = edit_attention.attn_probs(q, k, scale)
            self.sow(
                "attn_store", "map", probs.mean(axis=0),
                reduce_fn=lambda a, b: b, init_fn=lambda: 0.0,
            )

        if isinstance(edit, RecordTaps):
            # base-stream pass: vanilla attention + record q/k/v for the
            # 1-stream differentiated edit pass (see RecordTaps docstring)
            if self.is_mutable_collection("taps") and not self.is_initializing():
                for name, val in (("q", q), ("k", k), ("v", v)):
                    self.sow("taps", name, val,
                             reduce_fn=_replace_reduce, init_fn=lambda: 0.0)
            out = edit_attention.fast_attention(q, k, v, scale, allow_flash=True)
        elif edit is None:
            # inversion / reconstruction / feature passes are all no-grad
            out = edit_attention.fast_attention(q, k, v, scale, allow_flash=True)
        else:
            if edit.consume_taps:
                # rebuild the [base, edit] stream pair at the attention
                # boundary only — the rest of the UNet ran 1-stream
                q_b = jax.lax.stop_gradient(self.get_variable("taps", "q"))
                k_b = jax.lax.stop_gradient(self.get_variable("taps", "k"))
                v_b = jax.lax.stop_gradient(self.get_variable("taps", "v"))
                q = jnp.concatenate([q_b, q], axis=0)
                k = jnp.concatenate([k_b, k], axis=0)
                v = jnp.concatenate([v_b, v], axis=0)
            out, loss, logs = edit_attention.edited_attention(
                q, k, v, is_cross=is_cross, state=edit, scale=scale
            )
            if edit.consume_taps:
                out = out[1:]
            self.sow(
                "edit", "loss", loss,
                reduce_fn=_sum_reduce, init_fn=lambda: jnp.float32(0.0),
            )
            self.sow(
                "edit", "logs", logs,
                reduce_fn=_sum_reduce, init_fn=edit_attention.zero_logs,
            )

        out = out.transpose(0, 2, 1, 3).reshape(s, lq, inner)
        return nn.Dense(
            inner, name="to_out_0", dtype=self.dtype, param_dtype=self.param_dtype
        )(out)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn->LN->cross-attn->LN->GEGLU-FF with residuals
    (diffusers BasicTransformerBlock, the SD-1.x UNet variant)."""

    dim: int
    heads: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, edit: Optional[EditState] = None):
        from geodiffuser_tpu.models.layers import FeedForward

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", **kw)(x)
        x = x + Attention(self.dim, self.heads, name="attn1", **kw)(h, None, edit)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", **kw)(x)
        x = x + Attention(
            self.dim, self.heads, cross_attention_dim=self.cross_attention_dim,
            name="attn2", **kw,
        )(h, context, edit)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3", **kw)(x)
        return x + FeedForward(self.dim, name="ff", **kw)(h)


class Transformer2DModel(nn.Module):
    """GN -> proj in -> transformer blocks -> proj out + residual
    (diffusers Transformer2DModel).  SD-1.x uses 1x1 conv projections;
    SD-2.x (use_linear_projection) reshapes first and uses Dense."""

    in_channels: int
    heads: int
    cross_attention_dim: int
    num_layers: int = 1
    groups: int = 32
    remat: bool = False
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, edit: Optional[EditState] = None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm", **kw)(x)
        if self.use_linear_projection:
            y = y.reshape(b, h * w, c)
            y = nn.Dense(self.in_channels, name="proj_in", **kw)(y)
        else:
            y = nn.Conv(self.in_channels, (1, 1), name="proj_in", **kw)(y)
            y = y.reshape(b, h * w, self.in_channels)
        # jax.checkpoint on the block: the optimize pass differentiates
        # through the full UNet; recomputing attention in the backward pass
        # trades FLOPs for the HBM that 64^2 attention maps would pin.
        # Selective: only the high-resolution blocks (seq >= 32^2) hold big
        # maps; low-res blocks keep their activations (cheap) and skip the
        # recompute.
        # the RecordTaps base pass is no-grad: remat would only complicate
        # the 'taps' sow without saving any backward memory
        use_remat = (
            self.remat and (h * w >= 1024) and not isinstance(edit, RecordTaps)
        )
        block_cls = nn.remat(BasicTransformerBlock) if use_remat else BasicTransformerBlock
        for i in range(self.num_layers):
            y = block_cls(
                self.in_channels, self.heads, self.cross_attention_dim,
                name=f"transformer_blocks_{i}", **kw,
            )(y, context, edit)
        if self.use_linear_projection:
            y = nn.Dense(self.in_channels, name="proj_out", **kw)(y)
            y = y.reshape(b, h, w, self.in_channels)
        else:
            y = y.reshape(b, h, w, self.in_channels)
            y = nn.Conv(self.in_channels, (1, 1), name="proj_out", **kw)(y)
        return y + residual
