"""MiDaS DPT-Large monocular depth in flax.linen.

Rebuilds the `dpt_large` option of the reference's depth predictor
(get_monocular_depth, depth_predictor.py:105-274; model code vendored under
GeoDiffuser/dpt/).  Architecture: ViT-L/16 backbone (384^2, learned pos
embed, class token), feature taps at blocks (5, 11, 17, 23) with 'project'
readout (concat cls -> linear+gelu), reassemble to four scales, RefineNet
fusion, monocular depth head.

Reuses the RefineNet fusion blocks from models/depth_anything.py (the DPT
family shares them).  `dpt_hybrid` (ResNet50 stem) and the vendored
midas_v21 are not implemented — the pipeline's defaults are Depth-Anything
and constant depth; DPT-Large covers the remaining ViT path.

Note: the vendored reference implementation requires timm (not present in
this build image), so unlike SAM/Depth-Anything no runtime parity oracle is
available; the converter is validated structurally.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.models.depth_anything import FeatureFusionBlock, _resize


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    pos_grid: int = 24            # 384 / 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    post_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256

    @staticmethod
    def tiny() -> "DPTConfig":
        return DPTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=2,
                         pos_grid=8, hooks=(0, 1, 2, 3),
                         post_channels=(8, 16, 32, 32), features=16)


class ViTBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.embed_dim
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="attn_qkv")(h)
        b, l, _ = qkv.shape
        hd = d // c.num_heads
        qkv = qkv.reshape(b, l, 3, c.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * hd ** -0.5, axis=-1)
        att = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
        att = att.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(d, name="attn_proj")(att)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(d * 4, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="mlp_fc2")(h)
        return x + h


class DPTLarge(nn.Module):
    """(B, H, W, 3) ImageNet-normalized image (H, W multiples of patch) ->
    (B, H, W) relative inverse depth (larger = closer)."""

    cfg: DPTConfig = DPTConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // c.patch_size, w // c.patch_size

        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), name="patch_embed_proj")(x)
        x = x.reshape(b, ph * pw, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.pos_grid * c.pos_grid + 1, c.embed_dim), jnp.float32)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (c.pos_grid, c.pos_grid):
            grid = pos_patch.reshape(1, c.pos_grid, c.pos_grid, c.embed_dim)
            grid = jax.image.resize(grid, (1, ph, pw, c.embed_dim), method="linear")
            pos_patch = grid.reshape(1, ph * pw, c.embed_dim)
        x = jnp.concatenate([jnp.tile(cls + pos_cls, (b, 1, 1)), x + pos_patch], axis=1)

        taps: List[jnp.ndarray] = []
        for i in range(c.depth):
            x = ViTBlock(c, name=f"blocks_{i}")(x)
            if i in c.hooks:
                taps.append(x)

        feats = []
        for i, t in enumerate(taps):
            patch_tok, cls_tok = t[:, 1:], t[:, 0]
            # 'project' readout: concat the class token, linear + gelu
            readout = jnp.concatenate(
                [patch_tok, jnp.tile(cls_tok[:, None], (1, patch_tok.shape[1], 1))], axis=-1
            )
            y = nn.Dense(c.embed_dim, name=f"readout_{i}")(readout)
            y = nn.gelu(y, approximate=False)
            y = y.reshape(b, ph, pw, c.embed_dim)
            y = nn.Conv(c.post_channels[i], (1, 1), name=f"projects_{i}")(y)
            if i == 0:
                y = nn.ConvTranspose(c.post_channels[0], (4, 4), strides=(4, 4),
                                     transpose_kernel=True, name="resize_layers_0")(y)
            elif i == 1:
                y = nn.ConvTranspose(c.post_channels[1], (2, 2), strides=(2, 2),
                                     transpose_kernel=True, name="resize_layers_1")(y)
            elif i == 3:
                y = nn.Conv(c.post_channels[3], (3, 3), strides=(2, 2), padding=1,
                            name="resize_layers_3")(y)
            feats.append(y)

        rn = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn")(f)
            for i, f in enumerate(feats)
        ]
        p4 = FeatureFusionBlock(c.features, name="refinenet4")(rn[3], size=rn[2].shape[1:3])
        p3 = FeatureFusionBlock(c.features, name="refinenet3")(p4, rn[2], size=rn[1].shape[1:3])
        p2 = FeatureFusionBlock(c.features, name="refinenet2")(p3, rn[1], size=rn[0].shape[1:3])
        p1 = FeatureFusionBlock(c.features, name="refinenet1")(p2, rn[0])

        out = nn.Conv(c.features // 2, (3, 3), padding=1, name="head_conv1")(p1)
        out = _resize(out, out.shape[1] * 2, out.shape[2] * 2)
        out = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="head_conv3")(out)
        out = nn.relu(out)
        return _resize(out, h, w)[..., 0]
