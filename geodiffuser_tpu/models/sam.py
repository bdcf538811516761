"""Segment-Anything (SAM) in flax.linen (NHWC).

Native implementation of the architecture the reference vendors at
GeoDiffuser/segment_anything (used for point-prompted object masks via
get_mask_prediction, depth_predictor.py:53-102):

  * ImageEncoderViT — patch-16 ViT with windowed attention (window 14),
    decomposed relative position embeddings, 4 global-attention blocks, and
    a conv neck to 256 channels;
  * PromptEncoder — random-Fourier positional encoding, learned point-type
    embeddings;
  * MaskDecoder — TwoWayTransformer over (iou + 4 mask) tokens and image
    embeddings, output upscaling, per-token hypernetwork MLPs, IoU head.

Parameter names mirror the torch module tree for checkpoint conversion
(models/weights.py: convert_sam).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    out_chans: int = 256
    decoder_dim: int = 256
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask: int = 3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def vit_h() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_l() -> "SamConfig":
        return SamConfig(embed_dim=1024, depth=24, num_heads=16,
                         global_attn_indexes=(5, 11, 17, 23))

    @staticmethod
    def vit_b() -> "SamConfig":
        return SamConfig(embed_dim=768, depth=12, num_heads=12,
                         global_attn_indexes=(2, 5, 8, 11))

    @staticmethod
    def tiny() -> "SamConfig":
        return SamConfig(
            img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=4, out_chans=16,
            decoder_dim=16, decoder_heads=2, decoder_mlp_dim=32,
        )


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC maps (SAM's LayerNorm2d)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


def _rel_pos_bias(q: jnp.ndarray, rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                  qh: int, qw: int, kh: int, kw: int) -> jnp.ndarray:
    """Decomposed relative position bias (SAM image_encoder add_decomposed_rel_pos).

    q: (B, qh*qw, head_dim) per-head queries; rel_h/rel_w: resized tables
    (2*size-1, head_dim).  Returns (B, qh*qw, kh*kw).
    """
    def get(table, q_size, k_size):
        coords_q = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
        coords_k = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
        rel = coords_q - coords_k + (k_size - 1) * max(q_size / k_size, 1.0)
        return table[rel.astype(jnp.int32)]  # (q, k, dim)

    rh = get(rel_h, qh, kh)
    rw = get(rel_w, qw, kw)
    b = q.shape[0]
    r_q = q.reshape(b, qh, qw, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    bias = bias_h[:, :, :, :, None] + bias_w[:, :, None, :]
    # shapes: bias_h (b,qh,qw,kh) -> (b,qh,qw,kh,1); bias_w (b,qh,qw,kw) -> (b,qh,qw,1,kw)
    return bias.reshape(b, qh * qw, kh * kw)


class WindowedAttention(nn.Module):
    cfg: SamConfig
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, h, w, d = x.shape
        nh = c.num_heads
        hd = d // nh
        qkv = nn.Dense(3 * d, name="qkv", dtype=c.dtype)(x.reshape(b, h * w, d))
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]             # (b, nh, hw, hd)
        q = q.reshape(b * nh, h * w, hd)
        k = k.reshape(b * nh, h * w, hd)
        v = v.reshape(b * nh, h * w, hd)
        logits = jnp.einsum("bid,bjd->bij", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            size_h, size_w = self.input_size
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * size_h - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * size_w - 1, hd), jnp.float32)
            logits = logits + _rel_pos_bias(q * (hd ** -0.5) * (hd ** 0.5), rel_h, rel_w, h, w, h, w)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bij,bjd->bid", probs.astype(v.dtype), v)
        out = out.reshape(b, nh, h * w, hd).transpose(0, 2, 1, 3).reshape(b, h, w, d)
        return nn.Dense(d, name="proj", dtype=c.dtype)(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _window_unpartition(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamEncoderBlock(nn.Module):
    cfg: SamConfig
    window_size: int  # 0 => global

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        grid = c.img_size // c.patch_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=c.dtype)(x)
        if self.window_size > 0:
            wins, pad_hw = _window_partition(x, self.window_size)
            wins = WindowedAttention(
                c, input_size=(self.window_size, self.window_size), name="attn"
            )(wins)
            x = _window_unpartition(wins, self.window_size, pad_hw, x.shape[1:3])
        else:
            x = WindowedAttention(c, input_size=(grid, grid), name="attn")(x)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=c.dtype)(x)
        h = nn.Dense(c.embed_dim * 4, name="mlp_lin1", dtype=c.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, name="mlp_lin2", dtype=c.dtype)(h)
        return x + h


class ImageEncoderViT(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, img, img, 3) preprocessed pixels -> (B, grid, grid, out_chans)."""
        c = self.cfg
        grid = c.img_size // c.patch_size
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), name="patch_embed_proj",
                    dtype=c.dtype)(x.astype(c.dtype))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, c.embed_dim), jnp.float32)
        x = x + pos.astype(c.dtype)
        for i in range(c.depth):
            ws = 0 if i in c.global_attn_indexes else c.window_size
            x = SamEncoderBlock(c, window_size=ws, name=f"blocks_{i}")(x)
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck_0", dtype=c.dtype)(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(c.out_chans, (3, 3), padding=1, use_bias=False, name="neck_2", dtype=c.dtype)(x)
        x = LayerNorm2d(name="neck_3")(x)
        return x


class PromptEncoder(nn.Module):
    cfg: SamConfig

    def setup(self):
        c = self.cfg
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, c.decoder_dim // 2), jnp.float32
        )
        # 0: neg point, 1: pos point, 2/3: box corners
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (c.decoder_dim,), jnp.float32)
            for i in range(4)
        ]
        self.not_a_point = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (c.decoder_dim,), jnp.float32
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (c.decoder_dim,), jnp.float32
        )

    def _pe(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords in [0, 1] (..., 2) -> (..., decoder_dim) Fourier features
        (PositionEmbeddingRandom._pe_encoding)."""
        c = 2.0 * coords - 1.0
        c = c @ self.pe_gaussian
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self, grid: int) -> jnp.ndarray:
        """(grid, grid, dim) positional grid for the image embedding."""
        y = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
        x = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
        yy, xx = jnp.meshgrid(y, x, indexing="ij")
        return self._pe(jnp.stack([xx, yy], axis=-1))

    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray):
        """points: (B, N, 2) in [0, img_size]; labels: (B, N) in {-1, 0, 1}
        (-1 = padding).  Returns sparse embeddings (B, N+1, dim) (a padding
        point is appended, as SAM does when no box is given)."""
        c = self.cfg
        b, n, _ = points.shape
        pad_pt = jnp.zeros((b, 1, 2), points.dtype)
        pad_lb = -jnp.ones((b, 1), labels.dtype)
        points = jnp.concatenate([points + 0.5, pad_pt], axis=1) / c.img_size
        labels = jnp.concatenate([labels, pad_lb], axis=1)
        pe = self._pe(points)
        emb = jnp.where(
            (labels == -1)[..., None], self.not_a_point[None, None] + jnp.zeros_like(pe), pe
        )
        emb = jnp.where((labels == -1)[..., None], self.not_a_point[None, None], emb + 0.0)
        emb = jnp.where((labels == 0)[..., None], emb + self.point_embeddings[0][None, None], emb)
        emb = jnp.where((labels == 1)[..., None], emb + self.point_embeddings[1][None, None], emb)
        return emb


class _DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.heads
        qp = nn.Dense(d, name="q_proj", dtype=self.dtype)(q)
        kp = nn.Dense(d, name="k_proj", dtype=self.dtype)(k)
        vp = nn.Dense(d, name="v_proj", dtype=self.dtype)(v)
        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qp = qp.reshape(b, lq, self.heads, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, lk, self.heads, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, lk, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhid,bhjd->bhij", qp, kp) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", probs, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(self.dim, name="out_proj", dtype=self.dtype)(out)


class TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        kw = dict(dtype=c.dtype)
        if self.skip_first_pe:
            # first block: queries are REPLACED by the self-attention output
            # (no residual, no pe) — segment_anything TwoWayAttentionBlock
            queries = _DecoderAttention(
                c.decoder_dim, c.decoder_heads, name="self_attn", **kw
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = _DecoderAttention(
                c.decoder_dim, c.decoder_heads, name="self_attn", **kw
            )(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(name="norm1", **kw)(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = _DecoderAttention(
            c.decoder_dim, c.decoder_heads, downsample=2, name="cross_attn_token_to_image", **kw
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2", **kw)(queries + attn_out)

        h = nn.Dense(c.decoder_mlp_dim, name="mlp_lin1", **kw)(queries)
        h = nn.relu(h)
        h = nn.Dense(c.decoder_dim, name="mlp_lin2", **kw)(h)
        queries = nn.LayerNorm(name="norm3", **kw)(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = _DecoderAttention(
            c.decoder_dim, c.decoder_heads, downsample=2, name="cross_attn_image_to_token", **kw
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4", **kw)(keys + attn_out)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompts):
        """image_embedding: (B, g, g, dim); image_pe: (g, g, dim);
        sparse_prompts: (B, N, dim).
        Returns (masks (B, 4, 4g, 4g), iou_pred (B, 4))."""
        c = self.cfg
        kw = dict(dtype=c.dtype)
        b, g, _, dim = image_embedding.shape
        n_mask_tokens = c.num_multimask + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, dim), jnp.float32)
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask_tokens, dim), jnp.float32
        )
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.tile(out_tokens[None], (b, 1, 1)), sparse_prompts], axis=1
        )

        keys = image_embedding.reshape(b, g * g, dim)
        key_pe = image_pe.reshape(1, g * g, dim)
        queries = tokens
        for i in range(2):
            queries, keys = TwoWayBlock(
                c, skip_first_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        attn_out = _DecoderAttention(
            c.decoder_dim, c.decoder_heads, downsample=2, name="final_attn_token_to_image", **kw
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn", **kw)(queries + attn_out)

        iou_out = queries[:, 0]
        mask_toks = queries[:, 1 : 1 + n_mask_tokens]

        img = keys.reshape(b, g, g, dim)
        up = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2), transpose_kernel=True,
                              name="upscale_0", **kw)(img)
        up = LayerNorm2d(name="upscale_1")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(dim // 8, (2, 2), strides=(2, 2), transpose_kernel=True,
                              name="upscale_3", **kw)(up)
        up = nn.gelu(up, approximate=False)

        hyper = []
        for i in range(n_mask_tokens):
            h = mask_toks[:, i]
            h = nn.Dense(dim, name=f"hyper_{i}_lin0", **kw)(h)
            h = nn.relu(h)
            h = nn.Dense(dim, name=f"hyper_{i}_lin1", **kw)(h)
            h = nn.relu(h)
            h = nn.Dense(dim // 8, name=f"hyper_{i}_lin2", **kw)(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)  # (B, 4, dim/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)

        h = nn.Dense(dim, name="iou_lin0", **kw)(iou_out)
        h = nn.relu(h)
        h = nn.Dense(dim, name="iou_lin1", **kw)(h)
        h = nn.relu(h)
        iou_pred = nn.Dense(n_mask_tokens, name="iou_lin2", **kw)(h)
        return masks, iou_pred


class Sam(nn.Module):
    cfg: SamConfig = SamConfig()

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.cfg, name="mask_decoder")

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.image_encoder(x)

    def predict_masks(self, image_embedding, points, labels):
        grid = self.cfg.img_size // self.cfg.patch_size
        sparse = self.prompt_encoder(points, labels)
        pe = self.prompt_encoder.dense_pe(grid)
        # no mask prompt: the dense embedding is no_mask_embed broadcast over
        # the grid and added to the image embedding (SAM mask_decoder src)
        dense = self.prompt_encoder.no_mask_embed[None, None, None, :]
        return self.mask_decoder(image_embedding + dense, pe, sparse)

    def __call__(self, x, points, labels):
        emb = self.encode_image(x)
        return self.predict_masks(emb, points, labels)
