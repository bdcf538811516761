"""MiDaS DPT-Large monocular depth in flax.linen.

Rebuilds the `dpt_large` option of the reference's depth predictor
(get_monocular_depth, depth_predictor.py:105-274; model code vendored under
GeoDiffuser/dpt/).  Architecture: ViT-L/16 backbone (384^2, learned pos
embed, class token), feature taps at blocks (5, 11, 17, 23) with 'project'
readout (concat cls -> linear+gelu), reassemble to four scales, RefineNet
fusion, monocular depth head.

Reuses the RefineNet fusion blocks from models/depth_anything.py (the DPT
family shares them).  All five reference model_types are covered in this
module: `dpt_large` (ViT-L/16, `DPTLarge`), `dpt_hybrid` (+`_kitti`/`_nyu`
metric variants; ResNetV2-50 StdConv/GN pre-act stem + ViT-B/16,
`DPTHybrid`) and `midas_v21` (ResNeXt101 32x8d, frozen BN, `MidasNetV21`),
each with a checkpoint converter (`convert_dpt_large` / `convert_dpt_hybrid`
/ `convert_midas_v21`).

Note: the vendored reference implementation requires timm (not present in
this build image), so unlike SAM/Depth-Anything no runtime parity oracle is
available; the converter is validated structurally.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from geodiffuser_tpu.models.depth_anything import (
    FeatureFusionBlock, ResidualConvUnit, _resize,
)


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


# ---------------------------------------------------------------------------
# dpt_hybrid: ViT-B/16 over a ResNetV2-50 stem (timm vit_base_resnet50_384)
# Reference: GeoDiffuser/dpt/models.py:26-66 (backbone "vitb_rn50_384",
# hooks [0, 1, 8, 11]) and dpt/vit.py:316-489 (_make_vit_b_rn50_backbone:
# resnet stage taps pass through untouched; ViT taps get 'project' readout
# + 1x1 conv, tap4 an extra stride-2 conv; features (256, 512, 768, 768)).
# ---------------------------------------------------------------------------


def std_conv(x, kernel, bias, strides, padding):
    """Weight-standardized conv (timm StdConv2d, eps 1e-6): kernels are
    normalized over (kh, kw, cin) per output channel at apply time."""
    mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
    var = kernel.var(axis=(0, 1, 2), keepdims=True)
    kernel = (kernel - mean) / jnp.sqrt(var + 1e-6)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if bias is None else out + bias


class StdConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        pad = [(self.padding, self.padding)] * 2
        return std_conv(x, k, None, self.strides, pad)


class PreActBottleneck(nn.Module):
    """timm ResNetV2 pre-activation bottleneck: GN+ReLU -> 1x1 -> GN+ReLU ->
    3x3(stride) -> GN+ReLU -> 1x1, shortcut 1x1 std-conv on the pre-activated
    input when shape changes."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 4
        # 32 groups as in timm; clamped so tiny test configs stay valid
        gn = lambda ch, name: nn.GroupNorm(
            num_groups=math.gcd(32, ch), epsilon=1e-5, name=name
        )
        pre = gn(x.shape[-1], "norm1")(x)
        pre = nn.relu(pre)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = StdConv(self.out_channels, (1, 1), (self.stride,) * 2,
                               name="downsample_conv")(pre)
        else:
            shortcut = x
        h = StdConv(mid, (1, 1), name="conv1")(pre)
        h = gn(mid, "norm2")(h)
        h = nn.relu(h)
        h = StdConv(mid, (3, 3), (self.stride,) * 2, padding=1, name="conv2")(h)
        h = gn(mid, "norm3")(h)
        h = nn.relu(h)
        h = StdConv(self.out_channels, (1, 1), name="conv3")(h)
        return shortcut + h


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    pos_grid: int = 24                     # 384 / 16
    hooks: Tuple[int, ...] = (8, 11)       # ViT taps (dpt/models.py:44)
    stage_blocks: Tuple[int, ...] = (3, 4, 9)
    stage_channels: Tuple[int, ...] = (256, 512, 1024)
    post_channels: Tuple[int, ...] = (256, 512, 768, 768)
    features: int = 256
    # metric variants (dpt_hybrid_kitti / _nyu, depth_predictor.py:141-168)
    scale: float = 1.0
    shift: float = 0.0
    invert: bool = False

    @staticmethod
    def tiny() -> "DPTHybridConfig":
        return DPTHybridConfig(embed_dim=32, depth=2, num_heads=2, pos_grid=4,
                               hooks=(0, 1), stage_blocks=(1, 1, 1),
                               stage_channels=(8, 16, 32),
                               post_channels=(8, 16, 32, 32), features=16)


class DPTHybrid(nn.Module):
    """(B, H, W, 3) [-1,1]-normalized image -> (B, H, W) inverse depth.

    Taps 1/2 come straight from resnet stages 0/1 (dpt/vit.py:370-376,
    act_postprocess1/2 = Identity :438-443); taps 3/4 from ViT blocks
    hooks[0]/hooks[1] with 'project' readout (:446-489)."""

    cfg: DPTHybridConfig = DPTHybridConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, h, w, _ = x.shape

        # --- ResNetV2 stem (timm: StdConv 7x7/2 'same' + pool 3x3/2)
        y = StdConv(64, (7, 7), (2, 2), padding=3, name="stem_conv")(x)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        taps: List[jnp.ndarray] = []
        for s, (n_blocks, ch) in enumerate(zip(c.stage_blocks, c.stage_channels)):
            for j in range(n_blocks):
                stride = 2 if (j == 0 and s > 0) else 1
                y = PreActBottleneck(ch, stride, name=f"stages_{s}_blocks_{j}")(y)
            if s < 2:
                taps.append(y)      # resnet taps: stages 0 and 1
        y = nn.GroupNorm(num_groups=math.gcd(32, y.shape[-1]), epsilon=1e-5, name="stem_norm")(y)
        y = nn.relu(y)

        # --- ViT-B/16 on the stride-16 feature map (patch_embed.proj 1x1)
        ph, pw = y.shape[1], y.shape[2]
        y = nn.Conv(c.embed_dim, (1, 1), name="patch_embed_proj")(y)
        y = y.reshape(b, ph * pw, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.pos_grid * c.pos_grid + 1, c.embed_dim), jnp.float32)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (c.pos_grid, c.pos_grid):
            grid = pos_patch.reshape(1, c.pos_grid, c.pos_grid, c.embed_dim)
            grid = jax.image.resize(grid, (1, ph, pw, c.embed_dim), method="linear")
            pos_patch = grid.reshape(1, ph * pw, c.embed_dim)
        y = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), y], axis=1)
        y = y + jnp.concatenate([pos_cls, pos_patch], axis=1)

        vcfg = DPTConfig(embed_dim=c.embed_dim, depth=c.depth, num_heads=c.num_heads)
        vit_taps: List[jnp.ndarray] = []
        for i in range(c.depth):
            y = ViTBlock(vcfg, name=f"blocks_{i}")(y)
            if i in c.hooks:
                vit_taps.append(y)

        for i, tap in enumerate(vit_taps):
            patch_tok, cls_tok = tap[:, 1:], tap[:, 0]
            readout = jnp.concatenate(
                [patch_tok, jnp.tile(cls_tok[:, None], (1, patch_tok.shape[1], 1))], axis=-1
            )
            z = nn.Dense(c.embed_dim, name=f"readout_{i + 2}")(readout)
            z = nn.gelu(z, approximate=False)
            z = z.reshape(b, ph, pw, c.embed_dim)
            z = nn.Conv(c.post_channels[i + 2], (1, 1), name=f"projects_{i + 2}")(z)
            if i == 1:
                z = nn.Conv(c.post_channels[3], (3, 3), strides=(2, 2), padding=1,
                            name="resize_layers_3")(z)
            taps.append(z)

        rn = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn")(f)
            for i, f in enumerate(taps)
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
        inv_depth = _resize(out, h, w)[..., 0]
        if c.invert:
            # metric variants return 1/(scale*d + shift) (dpt/models.py:116-121)
            d = c.scale * inv_depth + c.shift
            return 1.0 / jnp.maximum(d, 1e-8)
        return inv_depth


# ---------------------------------------------------------------------------
# midas_v21: MidasNet over ResNeXt101_32x8d (midas_repo/midas_net.py:12-80,
# backbone resnext101_wsl; frozen inference BatchNorm).
# ---------------------------------------------------------------------------


class FrozenBatchNorm(nn.Module):
    """Inference-only BatchNorm: y = (x - mean)/sqrt(var + eps)*scale + bias."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, shape, jnp.float32)
        var = self.param("var", nn.initializers.ones, shape, jnp.float32)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class ResNeXtBottleneck(nn.Module):
    """torchvision Bottleneck with groups=32, width_per_group=8 (post-act)."""

    planes: int                  # torchvision 'planes'; out = planes * 4
    stride: int = 1
    groups: int = 32
    base_width: int = 8

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.base_width / 64.0) * self.groups
        out_ch = self.planes * 4
        h = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(width, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(width, (3, 3), strides=(self.stride,) * 2, padding=1,
                    feature_group_count=self.groups, use_bias=False, name="conv2")(h)
        h = FrozenBatchNorm(width, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="downsample_conv")(x)
            x = FrozenBatchNorm(out_ch, name="downsample_bn")(x)
        return nn.relu(x + h)


@dataclasses.dataclass(frozen=True)
class MidasV21Config:
    layers: Tuple[int, ...] = (3, 4, 23, 3)     # ResNeXt101
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    features: int = 256
    stem_channels: int = 64

    @staticmethod
    def tiny() -> "MidasV21Config":
        # planes >= 8 keeps the resnext width rule int(p*8/64)*32 nonzero
        return MidasV21Config(layers=(1, 1, 1, 1), planes=(8, 16, 32, 64),
                              features=16, stem_channels=8)


class MidasFusionBlock(nn.Module):
    """The ORIGINAL MiDaS FeatureFusionBlock (midas_repo/blocks.py): two
    residual conv units, fixed x2 bilinear(align_corners=True) upsample, and
    — unlike the DPT '_custom' variant — no 1x1 out conv."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        return _resize(x, x.shape[1] * 2, x.shape[2] * 2)


class MidasNetV21(nn.Module):
    """(B, H, W, 3) ImageNet-normalized image -> (B, H, W) inverse depth."""

    cfg: MidasV21Config = MidasV21Config()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, h, w, _ = x.shape
        y = nn.Conv(c.stem_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(c.stem_channels, name="bn1")(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        taps: List[jnp.ndarray] = []
        for s, (n_blocks, planes) in enumerate(zip(c.layers, c.planes)):
            for j in range(n_blocks):
                stride = 2 if (j == 0 and s > 0) else 1
                y = ResNeXtBottleneck(planes, stride, name=f"layer{s + 1}_{j}")(y)
            taps.append(y)

        rn = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn")(f)
            for i, f in enumerate(taps)
        ]
        p4 = MidasFusionBlock(c.features, name="refinenet4")(rn[3])
        p3 = MidasFusionBlock(c.features, name="refinenet3")(p4, rn[2])
        p2 = MidasFusionBlock(c.features, name="refinenet2")(p3, rn[1])
        p1 = MidasFusionBlock(c.features, name="refinenet1")(p2, rn[0])

        out = nn.Conv(128, (3, 3), padding=1, name="head_conv1")(p1)
        # MiDaS v21 head upsample is align_corners=False (blocks.py Interpolate
        # default), unlike the DPT head
        out = jax.image.resize(
            out, (b, out.shape[1] * 2, out.shape[2] * 2, 128), method="bilinear"
        )
        out = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="head_conv3")(out)
        out = nn.relu(out)
        return jax.image.resize(out, (b, h, w, 1), method="bilinear")[..., 0]


# ---------------------------------------------------------------------------
# Checkpoint converters (torch state_dict -> flax params).  Layouts follow
# dpt/models.py DPTDepthModel (dpt_hybrid*) and midas_repo/midas_net.py
# MidasNet (midas_v21); validated with synthetic checkpoints in
# tests/test_models.py (real weights need network egress).
# ---------------------------------------------------------------------------


def _t_conv(w):
    return jnp.asarray(w).transpose(2, 3, 1, 0)


def _t_dense(w):
    return jnp.asarray(w).T


def _t_norm(state, prefix):
    return {"scale": jnp.asarray(state[prefix + ".weight"]),
            "bias": jnp.asarray(state[prefix + ".bias"])}


def _t_bn(state, prefix):
    return {
        "scale": jnp.asarray(state[prefix + ".weight"]),
        "bias": jnp.asarray(state[prefix + ".bias"]),
        "mean": jnp.asarray(state[prefix + ".running_mean"]),
        "var": jnp.asarray(state[prefix + ".running_var"]),
    }


def _convert_scratch(state, out, n_taps=4, out_conv=True):
    """scratch.* (shared by every DPT/MiDaS variant) -> fusion/head params."""
    for i in range(1, n_taps + 1):
        out[f"layer{i}_rn"] = {"kernel": _t_conv(state[f"scratch.layer{i}_rn.weight"])}
    for k in range(1, 5):
        ref = {}
        for unit in (1, 2):
            if k == 4 and unit == 1:
                # torch constructs refinenet4.resConfUnit1 but never calls it
                # (refinenet4 gets a single input); real checkpoints carry
                # the params, our module doesn't materialize them
                continue
            pt = f"scratch.refinenet{k}.resConfUnit{unit}"
            if f"{pt}.conv1.weight" not in state:
                continue
            ref[f"resConfUnit{unit}"] = {
                "conv1": {"kernel": _t_conv(state[f"{pt}.conv1.weight"]),
                          "bias": jnp.asarray(state[f"{pt}.conv1.bias"])},
                "conv2": {"kernel": _t_conv(state[f"{pt}.conv2.weight"]),
                          "bias": jnp.asarray(state[f"{pt}.conv2.bias"])},
            }
        if out_conv:
            ref["out_conv"] = {
                "kernel": _t_conv(state[f"scratch.refinenet{k}.out_conv.weight"]),
                "bias": jnp.asarray(state[f"scratch.refinenet{k}.out_conv.bias"]),
            }
        out[f"refinenet{k}"] = ref
    for name, idx in (("head_conv1", 0), ("head_conv2", 2), ("head_conv3", 4)):
        out[name] = {
            "kernel": _t_conv(state[f"scratch.output_conv.{idx}.weight"]),
            "bias": jnp.asarray(state[f"scratch.output_conv.{idx}.bias"]),
        }


def _convert_vit_block(state, prefix):
    return {
        "norm1": _t_norm(state, prefix + ".norm1"),
        "attn_qkv": {"kernel": _t_dense(state[prefix + ".attn.qkv.weight"]),
                     "bias": jnp.asarray(state[prefix + ".attn.qkv.bias"])},
        "attn_proj": {"kernel": _t_dense(state[prefix + ".attn.proj.weight"]),
                      "bias": jnp.asarray(state[prefix + ".attn.proj.bias"])},
        "norm2": _t_norm(state, prefix + ".norm2"),
        "mlp_fc1": {"kernel": _t_dense(state[prefix + ".mlp.fc1.weight"]),
                    "bias": jnp.asarray(state[prefix + ".mlp.fc1.bias"])},
        "mlp_fc2": {"kernel": _t_dense(state[prefix + ".mlp.fc2.weight"]),
                    "bias": jnp.asarray(state[prefix + ".mlp.fc2.bias"])},
    }


def convert_dpt_large(state, cfg: DPTConfig = DPTConfig()) -> dict:
    """DPTDepthModel(backbone='vitl16_384') state_dict (the released
    dpt_large-midas checkpoint, dpt/vit.py:515 + models.py) -> DPTLarge
    params.

    Unconsumed-on-purpose: `pretrained.model.norm.*` / `.head.*` (the timm
    ViT's final norm + classifier — DPT taps block outputs via hooks and
    never runs them, dpt/vit.py:68-117) and `scratch.refinenet4.resConfUnit1.*`
    (constructed but never called: refinenet4 gets a single input)."""
    pm = "pretrained.model"
    out = {
        "patch_embed_proj": {
            "kernel": _t_conv(state[f"{pm}.patch_embed.proj.weight"]),
            "bias": jnp.asarray(state[f"{pm}.patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(state[f"{pm}.cls_token"]),
        "pos_embed": jnp.asarray(state[f"{pm}.pos_embed"]),
    }
    for i in range(cfg.depth):
        out[f"blocks_{i}"] = _convert_vit_block(state, f"{pm}.blocks.{i}")
    for tap in range(4):
        post = f"pretrained.act_postprocess{tap + 1}"
        out[f"readout_{tap}"] = {
            "kernel": _t_dense(state[f"{post}.0.project.0.weight"]),
            "bias": jnp.asarray(state[f"{post}.0.project.0.bias"]),
        }
        out[f"projects_{tap}"] = {
            "kernel": _t_conv(state[f"{post}.3.weight"]),
            "bias": jnp.asarray(state[f"{post}.3.bias"]),
        }
    for tap in (0, 1):
        # torch ConvTranspose2d (in, out, kh, kw) -> flax
        # ConvTranspose(transpose_kernel=True) (kh, kw, out, in)
        out[f"resize_layers_{tap}"] = {
            "kernel": jnp.asarray(
                state[f"pretrained.act_postprocess{tap + 1}.4.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": jnp.asarray(state[f"pretrained.act_postprocess{tap + 1}.4.bias"]),
        }
    out["resize_layers_3"] = {
        "kernel": _t_conv(state["pretrained.act_postprocess4.4.weight"]),
        "bias": jnp.asarray(state["pretrained.act_postprocess4.4.bias"]),
    }
    _convert_scratch(state, out)
    return {"params": out}


def convert_dpt_hybrid(state, cfg: DPTHybridConfig = DPTHybridConfig()) -> dict:
    """DPTDepthModel(backbone='vitb_rn50_384') state_dict -> DPTHybrid params."""
    bb = "pretrained.model.patch_embed.backbone"
    out = {
        "stem_conv": {"kernel": _t_conv(state[f"{bb}.stem.conv.weight"])},
        "stem_norm": _t_norm(state, f"{bb}.norm"),
        "patch_embed_proj": {
            "kernel": _t_conv(state["pretrained.model.patch_embed.proj.weight"]),
            "bias": jnp.asarray(state["pretrained.model.patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(state["pretrained.model.cls_token"]),
        "pos_embed": jnp.asarray(state["pretrained.model.pos_embed"]),
    }
    for s, n_blocks in enumerate(cfg.stage_blocks):
        for j in range(n_blocks):
            pt = f"{bb}.stages.{s}.blocks.{j}"
            blk = {
                "norm1": _t_norm(state, pt + ".norm1"),
                "conv1": {"kernel": _t_conv(state[pt + ".conv1.weight"])},
                "norm2": _t_norm(state, pt + ".norm2"),
                "conv2": {"kernel": _t_conv(state[pt + ".conv2.weight"])},
                "norm3": _t_norm(state, pt + ".norm3"),
                "conv3": {"kernel": _t_conv(state[pt + ".conv3.weight"])},
            }
            if pt + ".downsample.conv.weight" in state:
                blk["downsample_conv"] = {
                    "kernel": _t_conv(state[pt + ".downsample.conv.weight"])
                }
            out[f"stages_{s}_blocks_{j}"] = blk
    for i in range(cfg.depth):
        out[f"blocks_{i}"] = _convert_vit_block(state, f"pretrained.model.blocks.{i}")
    for tap, post in ((2, "act_postprocess3"), (3, "act_postprocess4")):
        out[f"readout_{tap}"] = {
            "kernel": _t_dense(state[f"pretrained.{post}.0.project.0.weight"]),
            "bias": jnp.asarray(state[f"pretrained.{post}.0.project.0.bias"]),
        }
        out[f"projects_{tap}"] = {
            "kernel": _t_conv(state[f"pretrained.{post}.3.weight"]),
            "bias": jnp.asarray(state[f"pretrained.{post}.3.bias"]),
        }
    out["resize_layers_3"] = {
        "kernel": _t_conv(state["pretrained.act_postprocess4.4.weight"]),
        "bias": jnp.asarray(state["pretrained.act_postprocess4.4.bias"]),
    }
    _convert_scratch(state, out)
    return {"params": out}


def convert_midas_v21(state, cfg: MidasV21Config = MidasV21Config()) -> dict:
    """MidasNet (resnext101_wsl) state_dict -> MidasNetV21 params.

    The torch tree wraps stem+layer1 in one Sequential
    (dpt/blocks.py:120-130): pretrained.layer1.{0,1}=conv1/bn1,
    .4.{j}=resnet.layer1 blocks; layers 2-4 map directly."""
    out = {
        "conv1": {"kernel": _t_conv(state["pretrained.layer1.0.weight"])},
        "bn1": _t_bn(state, "pretrained.layer1.1"),
    }

    def block(pt):
        blk = {}
        for c in (1, 2, 3):
            blk[f"conv{c}"] = {"kernel": _t_conv(state[f"{pt}.conv{c}.weight"])}
            blk[f"bn{c}"] = _t_bn(state, f"{pt}.bn{c}")
        if f"{pt}.downsample.0.weight" in state:
            blk["downsample_conv"] = {"kernel": _t_conv(state[f"{pt}.downsample.0.weight"])}
            blk["downsample_bn"] = _t_bn(state, f"{pt}.downsample.1")
        return blk

    for s, n_blocks in enumerate(cfg.layers):
        for j in range(n_blocks):
            pt = (f"pretrained.layer1.4.{j}" if s == 0
                  else f"pretrained.layer{s + 1}.{j}")
            out[f"layer{s + 1}_{j}"] = block(pt)
    _convert_scratch(state, out, out_conv=False)
    return {"params": out}
