"""DINOv2 ViT backbone in flax.linen (Depth-Anything's encoder).

Native implementation of the architecture the reference vendors at
GeoDiffuser/Depth-Anything/torchhub/facebookresearch_dinov2_main (loaded in
depth_anything/dpt.py:146) — patch-14 ViT with class token, interpolated
position embeddings, LayerScale blocks, and `get_intermediate_layers`
feature taps.  Parameter names mirror the torch module tree for checkpoint
conversion.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    pos_grid: int = 37            # pretraining grid (518/14)
    layerscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def vit_large() -> "DinoConfig":
        return DinoConfig()

    @staticmethod
    def vit_base() -> "DinoConfig":
        return DinoConfig(embed_dim=768, depth=12, num_heads=12)

    @staticmethod
    def vit_small() -> "DinoConfig":
        return DinoConfig(embed_dim=384, depth=12, num_heads=6)

    @staticmethod
    def tiny() -> "DinoConfig":
        return DinoConfig(embed_dim=32, depth=4, num_heads=2, pos_grid=8, patch_size=4)


class DinoBlock(nn.Module):
    cfg: DinoConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        kw = dict(dtype=c.dtype)
        d = c.embed_dim
        h = nn.LayerNorm(epsilon=1e-6, name="norm1", **kw)(x)
        qkv = nn.Dense(3 * d, name="attn_qkv", **kw)(h)
        b, l, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(b, l, 3, c.num_heads, d // c.num_heads), 3, axis=2)
        q, k, v = [t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v)]
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (d // c.num_heads) ** -0.5, axis=-1)
        att = jnp.einsum("bhij,bhjd->bhid", probs.astype(v.dtype), v)
        att = att.transpose(0, 2, 1, 3).reshape(b, l, d)
        att = nn.Dense(d, name="attn_proj", **kw)(att)
        if c.layerscale:
            g1 = self.param("ls1_gamma", nn.initializers.ones, (d,), jnp.float32)
            att = att * g1
        x = x + att
        h = nn.LayerNorm(epsilon=1e-6, name="norm2", **kw)(x)
        h = nn.Dense(d * c.mlp_ratio, name="mlp_fc1", **kw)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="mlp_fc2", **kw)(h)
        if c.layerscale:
            g2 = self.param("ls2_gamma", nn.initializers.ones, (d,), jnp.float32)
            h = h * g2
        return x + h


class DinoViT(nn.Module):
    cfg: DinoConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, n_last: int = 4
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """(B, H, W, 3) normalized image (H, W multiples of patch) ->
        [(patch_tokens (B, hw, D), cls (B, D))] for the last n_last blocks,
        each after the final LayerNorm — matching DINOv2's
        get_intermediate_layers(n, return_class_token=True, norm=True), the
        exact tap Depth-Anything uses (dpt.py:155)."""
        c = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // c.patch_size, w // c.patch_size
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            name="patch_embed_proj", dtype=c.dtype,
        )(x.astype(c.dtype))
        x = x.reshape(b, ph * pw, c.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.pos_grid * c.pos_grid + 1, c.embed_dim), jnp.float32,
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (c.pos_grid, c.pos_grid):
            # bicubic interpolation of the position grid (DINOv2 interpolate_pos_encoding)
            grid = pos_patch.reshape(1, c.pos_grid, c.pos_grid, c.embed_dim)
            grid = jax.image.resize(grid, (1, ph, pw, c.embed_dim), method="cubic")
            pos_patch = grid.reshape(1, ph * pw, c.embed_dim)
        x = x + pos_patch.astype(c.dtype)
        cls_tok = (cls + pos_cls).astype(c.dtype)
        x = jnp.concatenate([jnp.tile(cls_tok, (b, 1, 1)), x], axis=1)

        taps = []
        take_from = c.depth - n_last
        for i in range(c.depth):
            x = DinoBlock(c, name=f"blocks_{i}")(x)
            if i >= take_from:
                taps.append(x)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=c.dtype)
        out = []
        for t in taps:
            t = norm(t)
            out.append((t[:, 1:], t[:, 0]))
        return out
