"""Depth-Anything (DINOv2 + DPT head) in flax.linen.

Native implementation of the reference's default depth predictor
(depth_anything/dpt.py: DPT_DINOv2 — projections + resize layers over the
last four DINOv2 taps, RefineNet fusion, two-conv output head) used via
get_monocular_depth_anything (depth_predictor.py:325-370).

NHWC; parameter names mirror the torch module tree for conversion.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.models.dinov2 import DinoConfig, DinoViT


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear align_corners=True resize of (B, H, W, C)."""
    b, ih, iw, c = x.shape
    # align_corners=True: sample positions i*(ih-1)/(h-1)
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, iw - 1)
    y1 = jnp.clip(y0 + 1, 0, ih - 1)
    x1 = jnp.clip(x0 + 1, 0, iw - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype)
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1", **kw)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2", **kw)(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """DPT RefineNet fusion (depth_anything/blocks.py:95-150): optional skip
    through a residual unit, refine, bilinear(align_corners=True) upsample,
    1x1 out conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, size: Tuple[int, int] | None = None):
        kw = dict(dtype=self.dtype)
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1", **kw)(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2", **kw)(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = _resize(x, *size)
        return nn.Conv(self.features, (1, 1), name="out_conv", **kw)(x)


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    encoder: str = "vitl"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)

    def dino(self) -> DinoConfig:
        return {
            "vitl": DinoConfig.vit_large(),
            "vitb": DinoConfig.vit_base(),
            "vits": DinoConfig.vit_small(),
            "tiny": DinoConfig.tiny(),
        }[self.encoder]

    @staticmethod
    def tiny() -> "DepthAnythingConfig":
        return DepthAnythingConfig(encoder="tiny", features=16, out_channels=(8, 16, 32, 32))


class DPTHead(nn.Module):
    cfg: DepthAnythingConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: List[Tuple[jnp.ndarray, jnp.ndarray]], ph: int, pw: int):
        c = self.cfg
        kw = dict(dtype=self.dtype)
        feats = []
        for i, (tokens, _cls) in enumerate(taps):
            b, l, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d)
            x = nn.Conv(c.out_channels[i], (1, 1), name=f"projects_{i}", **kw)(x)
            if i == 0:
                # transpose_kernel=True matches torch ConvTranspose2d with a
                # (kh, kw, out, in) kernel (see weights.convert_depth_anything)
                x = nn.ConvTranspose(
                    c.out_channels[0], (4, 4), strides=(4, 4), transpose_kernel=True,
                    name="resize_layers_0", **kw
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    c.out_channels[1], (2, 2), strides=(2, 2), transpose_kernel=True,
                    name="resize_layers_1", **kw
                )(x)
            elif i == 3:
                x = nn.Conv(
                    c.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                    name="resize_layers_3", **kw,
                )(x)
            feats.append(x)

        rn = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn", **kw)(f)
            for i, f in enumerate(feats)
        ]
        p4 = FeatureFusionBlock(c.features, name="refinenet4", **kw)(
            rn[3], size=rn[2].shape[1:3]
        )
        p3 = FeatureFusionBlock(c.features, name="refinenet3", **kw)(
            p4, rn[2], size=rn[1].shape[1:3]
        )
        p2 = FeatureFusionBlock(c.features, name="refinenet2", **kw)(
            p3, rn[1], size=rn[0].shape[1:3]
        )
        p1 = FeatureFusionBlock(c.features, name="refinenet1", **kw)(p2, rn[0])

        out = nn.Conv(c.features // 2, (3, 3), padding=1, name="output_conv1", **kw)(p1)
        patch = 14 if c.encoder != "tiny" else 4
        out = _resize(out, ph * patch, pw * patch)
        out = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0", **kw)(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2", **kw)(out)
        return nn.relu(out)


class DepthAnything(nn.Module):
    """(B, H, W, 3) ImageNet-normalized image -> (B, H, W) relative depth
    (larger = closer, as the raw model emits; inversion happens in
    utils/depth.py per depth_predictor.py:364-369)."""

    cfg: DepthAnythingConfig = DepthAnythingConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dc = self.cfg.dino()
        b, h, w, _ = x.shape
        ph, pw = h // dc.patch_size, w // dc.patch_size
        taps = DinoViT(dc, name="pretrained")(x, n_last=4)
        depth = DPTHead(self.cfg, name="depth_head")(taps, ph, pw)
        depth = _resize(depth, h, w)
        return nn.relu(depth[..., 0])
