"""CLIP vision tower (ViT-B/32) in flax.linen.

Backs the CLIP-similarity metric (image_fidelity.py:183-206 uses ViT-B/32
image embeddings' cosine) and the CLIP-feature FID variant in
evaluation/fid.py.  Pre-LN ViT with class token, quick_gelu, final LN and a
linear projection to the shared space.  Parameter names mirror HF
CLIPVisionModel for conversion.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.models.clip_text import CLIPEncoderLayer

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                                layers=2, heads=2, projection_dim=16)


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, project: bool = True) -> jnp.ndarray:
        """(B, S, S, 3) CLIP-normalized pixels -> (B, projection_dim)
        image embeddings (or (B, hidden) pooled pre-projection if not
        project)."""
        c = self.cfg
        kw = dict(dtype=c.dtype)
        b = pixels.shape[0]
        grid = c.image_size // c.patch_size
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    name="patch_embedding", **kw)(pixels.astype(c.dtype))
        x = x.reshape(b, grid * grid, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (grid * grid + 1, c.hidden_size), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(c.dtype), x], axis=1)
        x = x + pos[None].astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm", **kw)(x)
        zero_mask = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
        for i in range(c.layers):
            x = CLIPEncoderLayer(c.hidden_size, c.heads, name=f"layers_{i}", **kw)(x, zero_mask)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm", **kw)(x[:, 0])
        if not project:
            return pooled.astype(jnp.float32)
        out = nn.Dense(c.projection_dim, use_bias=False, name="visual_projection", **kw)(pooled)
        return out.astype(jnp.float32)


def preprocess_clip_image(image: np.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8/float image -> CLIP-normalized (1, size, size, 3)."""
    from geodiffuser_tpu.ops import image as image_ops

    img = np.asarray(image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    x = image_ops.resize_bilinear_hwc(jnp.asarray(img), size, size)
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return x[None]
