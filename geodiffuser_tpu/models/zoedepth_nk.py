"""ZoeDepth-NK: BEiT-384 MiDaS core + two-head latitude-routed metric depth.

Rebuilds the reference's shipped metric-depth checkpoint architecture
(ZoeD-M12-NK: zoedepth/models/zoedepth_nk/zoedepth_nk_v1.py, loaded by
get_monocular_ZoeDepth, depth_predictor.py:277-319) so the released
checkpoint converts 1:1:

  * BEiT-L/16 backbone (midas_repo/backbones/beit.py): per-block relative
    position bias tables (bilinearly resized for non-training window sizes,
    replicating the reference's width/height reshape quirk), layer-scale
    gamma_1/gamma_2, learned q/v bias with a zero k bias, no absolute
    position embedding;
  * the MiDaS DPT scratch (project readout, reassemble, RefineNet fusion)
    with the MidasCore hook set ('out_conv', 'l4_rn', 'r4'..'r1' —
    zoedepth/models/base_models/midas.py:192-213);
  * a patch-transformer domain router (patch_transformer.py:29-91: 4-layer
    post-norm torch TransformerEncoder over 1x1-patch embeddings with a
    zero-padded class token and concatenated sin/cos positional encoding)
    voting nyu-vs-kitti per batch (zoedepth_nk_v1.py:188-199);
  * per-domain seed bin regressors, attractor stacks and conditional
    log-binomial output heads (config_zoedepth_nk.json: softplus centers,
    n_attractors (16,8,4,1), 64 bins, nyu max 10m / kitti max 80m).

TPU notes: the domain routing is data-dependent in torch (.item()); under
jit we compute both (cheap) metric heads and select with jnp.where on the
traced vote — one compiled program serves both domains.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.models.depth_anything import FeatureFusionBlock, _resize
from geodiffuser_tpu.models.zoedepth import (
    AttractorLayerUnnormed,
    ConditionalLogBinomial,
    Projector,
    SeedBinRegressorUnnormed,
)


@dataclasses.dataclass(frozen=True)
class BEiTConfig:
    """beit_large_patch16_384 geometry (timm), MiDaS dpt_beit_large_384
    hook set (midas_repo/backbones/beit.py:174-182)."""

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    train_window: Tuple[int, int] = (24, 24)   # 384 / 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    post_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256

    @staticmethod
    def tiny() -> "BEiTConfig":
        return BEiTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=2,
                          train_window=(8, 8), hooks=(0, 1, 2, 3),
                          post_channels=(8, 16, 32, 32), features=16)


def gen_relative_position_index(window: Tuple[int, int]) -> np.ndarray:
    """timm.models.beit.gen_relative_position_index — host-side/static.

    Returns (wh*ww+1, wh*ww+1) int32 indices into the bias table; the last
    three table rows are cls-to-token / token-to-cls / cls-to-cls.
    """
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)                                  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]                     # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)                 # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx.astype(np.int32)


class BEiTAttention(nn.Module):
    cfg: BEiTConfig
    window: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.embed_dim
        hd = d // c.num_heads
        b, l, _ = x.shape
        th, tw = c.train_window
        num_rel_train = (2 * th - 1) * (2 * tw - 1) + 3

        qkv_w = self.param("qkv_kernel", nn.initializers.normal(0.02), (d, 3 * d), jnp.float32)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,), jnp.float32)
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,), jnp.float32)
        table = self.param("relative_position_bias_table", nn.initializers.zeros,
                           (num_rel_train, c.num_heads), jnp.float32)

        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = x @ qkv_w + bias
        qkv = qkv.reshape(b, l, 3, c.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # relative position bias for the actual window; resized from the
        # training table when sizes differ (beit.py:29-62 — note the
        # reference reshapes (width, height) but interpolates to
        # (height, width); replicated for checkpoint fidelity)
        wh, ww = self.window
        if (wh, ww) != (th, tw):
            sub = table[: num_rel_train - 3]
            grid = sub.reshape(1, 2 * tw - 1, 2 * th - 1, c.num_heads)
            grid = jax.image.resize(
                grid, (1, 2 * wh - 1, 2 * ww - 1, c.num_heads), method="linear"
            )
            sub = grid.reshape((2 * wh - 1) * (2 * ww - 1), c.num_heads)
            table_eff = jnp.concatenate([sub, table[num_rel_train - 3:]], axis=0)
        else:
            table_eff = table
        idx = jnp.asarray(gen_relative_position_index((wh, ww)))
        rel_bias = table_eff[idx.reshape(-1)].reshape(
            wh * ww + 1, wh * ww + 1, c.num_heads
        ).transpose(2, 0, 1)                                      # (H, N, N)

        logits = jnp.einsum("bhid,bhjd->bhij", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        logits = logits + rel_bias[None]
        p = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
        att = att.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="proj")(att)


class BEiTBlock(nn.Module):
    cfg: BEiTConfig
    window: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g1 = self.param("gamma_1", nn.initializers.constant(0.1), (c.embed_dim,), jnp.float32)
        g2 = self.param("gamma_2", nn.initializers.constant(0.1), (c.embed_dim,), jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + g1 * BEiTAttention(c, self.window, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(c.embed_dim * c.mlp_ratio, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, name="mlp_fc2")(h)
        return x + g2 * h


class BEiTCore(nn.Module):
    """BEiT backbone + MiDaS DPT scratch, exposing the MidasCore taps:
    (rel_depth, out_conv 32ch, l4_rn, [r4, r3, r2, r1])."""

    cfg: BEiTConfig = BEiTConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // c.patch_size, w // c.patch_size

        y = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), name="patch_embed_proj")(x)
        y = y.reshape(b, ph * pw, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32)
        # BEiT has no absolute position embedding (pos_embed is None in
        # timm's beit_large_patch16_384); position enters via the per-block
        # relative bias.
        y = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), y], axis=1)

        taps: List[jnp.ndarray] = []
        for i in range(c.depth):
            y = BEiTBlock(c, (ph, pw), name=f"blocks_{i}")(y)
            if i in c.hooks:
                taps.append(y)

        feats = []
        for i, t in enumerate(taps):
            patch_tok, cls_tok = t[:, 1:], t[:, 0]
            r = jnp.concatenate(
                [patch_tok, jnp.tile(cls_tok[:, None], (1, patch_tok.shape[1], 1))], axis=-1
            )
            z = nn.Dense(c.embed_dim, name=f"readout_{i}")(r)
            z = nn.gelu(z, approximate=False)
            z = z.reshape(b, ph, pw, c.embed_dim)
            z = nn.Conv(c.post_channels[i], (1, 1), name=f"projects_{i}")(z)
            if i == 0:
                z = nn.ConvTranspose(c.post_channels[0], (4, 4), strides=(4, 4),
                                     transpose_kernel=True, name="resize_layers_0")(z)
            elif i == 1:
                z = nn.ConvTranspose(c.post_channels[1], (2, 2), strides=(2, 2),
                                     transpose_kernel=True, name="resize_layers_1")(z)
            elif i == 3:
                z = nn.Conv(c.post_channels[3], (3, 3), strides=(2, 2), padding=1,
                            name="resize_layers_3")(z)
            feats.append(z)

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
        feat32 = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(out)
        feat32 = nn.relu(feat32)
        rel = nn.Conv(1, (1, 1), name="head_conv3")(feat32)
        rel = nn.relu(rel)[..., 0]
        return rel, feat32, rn[3], [p4, p3, p2, p1]


def sinusoidal_encoding_1d(seq_len: int, dim: int) -> np.ndarray:
    """patch_transformer.py:52-69: concatenated (not interleaved) sin/cos."""
    pos = np.arange(seq_len, dtype=np.float32)[:, None]
    idx = np.arange(0, dim, 2, dtype=np.float32)[None, :]
    div = np.exp(idx * (-math.log(10000.0) / dim))
    enc = pos * div
    return np.concatenate([np.sin(enc), np.cos(enc)], axis=1).astype(np.float32)


class TorchTransformerEncoderLayer(nn.Module):
    """Post-norm torch nn.TransformerEncoderLayer (relu FF, eps 1e-5)."""

    dim: int = 128
    heads: int = 4
    ff: int = 1024

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        in_w = self.param("in_proj_weight", nn.initializers.normal(0.02),
                          (3 * d, d), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        qkv = x @ in_w.T + in_b
        qkv = qkv.reshape(b, s, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhid,bhjd->bhij", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
        att = att.transpose(0, 2, 1, 3).reshape(b, s, d)
        att = nn.Dense(d, name="out_proj")(att)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + att)
        h = nn.Dense(self.ff, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(d, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class PatchTransformerEncoder(nn.Module):
    """zoedepth layers/patch_transformer.py with patch_size=1 and a class
    token (the NK router configuration, zoedepth_nk_v1.py:101-103)."""

    embedding_dim: int = 128
    num_layers: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, x):                       # (B, H, W, C)
        b = x.shape[0]
        e = nn.Conv(self.embedding_dim, (1, 1), name="embedding_convPxP")(x)
        e = e.reshape(b, -1, self.embedding_dim)
        # class token = zero padding at the start of the sequence
        e = jnp.concatenate([jnp.zeros_like(e[:, :1]), e], axis=1)
        s = e.shape[1]
        e = e + jnp.asarray(sinusoidal_encoding_1d(s, self.embedding_dim))[None]
        for i in range(self.num_layers):
            e = TorchTransformerEncoderLayer(
                self.embedding_dim, self.heads, name=f"layers_{i}"
            )(e)
        return e                                  # (B, S, E); [:, 0] = class


@dataclasses.dataclass(frozen=True)
class BinConf:
    name: str
    n_bins: int
    min_depth: float
    max_depth: float


@dataclasses.dataclass(frozen=True)
class ZoeDepthNKConfig:
    """config_zoedepth_nk.json values."""

    core: BEiTConfig = BEiTConfig()
    bin_conf: Tuple[BinConf, ...] = (
        BinConf("nyu", 64, 1e-3, 10.0),
        BinConf("kitti", 64, 1e-3, 80.0),
    )
    bin_embedding_dim: int = 128
    n_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0

    @staticmethod
    def tiny() -> "ZoeDepthNKConfig":
        return ZoeDepthNKConfig(
            core=BEiTConfig.tiny(),
            bin_conf=(BinConf("nyu", 8, 1e-3, 10.0), BinConf("kitti", 8, 1e-3, 80.0)),
            bin_embedding_dim=16, n_attractors=(4, 2, 2, 1),
        )


class ZoeDepthNK(nn.Module):
    """(B, H, W, 3) normalized image -> (B, H, W) metric depth.

    Mirrors ZoeDepthNK.forward (zoedepth_nk_v1.py:160-243); both domain
    heads are evaluated and the router vote selects via jnp.where (the heads
    are tiny next to the BEiT core, and one compiled program serves both)."""

    cfg: ZoeDepthNKConfig = ZoeDepthNKConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_domain_logits: bool = False):
        c = self.cfg
        rel, feat32, btlnck, x_blocks = BEiTCore(c.core, name="core")(x)

        z = nn.Conv(btlnck.shape[-1], (1, 1), name="conv2")(btlnck)

        # latitude router: class-token embedding -> domain logits; vote is
        # summed over the batch (zoedepth_nk_v1.py:188-195)
        emb = PatchTransformerEncoder(128, name="patch_transformer")(z)[:, 0]
        h = nn.Dense(128, name="mlp_classifier_0")(emb)
        h = nn.relu(h)
        domain_logits = nn.Dense(2, name="mlp_classifier_2")(h)   # (B, 2)
        vote = jnp.argmax(jnp.sum(domain_logits, axis=0), axis=-1)  # () traced

        prev_emb0 = Projector(c.bin_embedding_dim, name="seed_projector")(z)
        embs = [
            Projector(c.bin_embedding_dim, name=f"projectors_{i}")(xb)
            for i, xb in enumerate(x_blocks)
        ]

        def head(conf: BinConf):
            _, b_prev = SeedBinRegressorUnnormed(
                conf.n_bins, name=f"seed_bin_regressors_{conf.name}"
            )(z)
            b_centers, prev_emb = b_prev, prev_emb0
            for i, emb_i in enumerate(embs):
                b_new, b_centers = AttractorLayerUnnormed(
                    conf.n_bins, n_attractors=c.n_attractors[i],
                    alpha=c.attractor_alpha, gamma=c.attractor_gamma,
                    kind=c.attractor_kind, attractor_type=c.attractor_type,
                    name=f"attractors_{conf.name}_{i}",
                )(emb_i, b_prev if i == 0 else b_new, prev_emb)
                prev_emb = emb_i
            # NK conditions the log-binomial on the 32-ch head activation
            # alone (zoedepth_nk_v1.py:223-231; no rel-depth concat, unlike
            # the single-head v1)
            emb_up = _resize(prev_emb, feat32.shape[1], feat32.shape[2])
            probs = ConditionalLogBinomial(
                conf.n_bins, bottleneck_factor=4,
                min_temp=c.min_temp, max_temp=c.max_temp,
                name=f"conditional_log_binomial_{conf.name}",
            )(feat32, emb_up)
            b_up = _resize(b_centers, probs.shape[1], probs.shape[2])
            return jnp.sum(probs * b_up, axis=-1)

        d_nyu = head(c.bin_conf[0])
        d_kitti = head(c.bin_conf[1])
        depth = jnp.where(vote == 0, d_nyu, d_kitti)
        depth = _resize(depth[..., None], x.shape[1], x.shape[2])[..., 0]
        if return_domain_logits:
            return depth, domain_logits
        return depth


# ---------------------------------------------------------------------------
# Checkpoint conversion (ZoeD_M12_NK.pt torch layout -> this module's tree)
# ---------------------------------------------------------------------------

def _lin(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _conv(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _convT(sd, key):
    # flax ConvTranspose(transpose_kernel=True) consumes (kh, kw, out, in)
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{key}.bias"]}


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _net2(sd, key):
    """torch Sequential(conv1x1, act, conv1x1[, act]) -> Projector/Seed tree."""
    return {"net_0": _conv(sd, f"{key}.0"), "net_2": _conv(sd, f"{key}.2")}


def _fusion(sd, key, has_skip=True):
    """midas_repo FeatureFusionBlock_custom -> our FeatureFusionBlock tree.
    refinenet4 constructs resConfUnit1 but never calls it (single input,
    blocks.py:403/419); our module only materializes used params."""
    units = (1, 2) if has_skip else (2,)
    out = {
        f"resConfUnit{j}": {
            f"conv{k}": _conv(sd, f"{key}.resConfUnit{j}.conv{k}") for k in (1, 2)
        }
        for j in units
    }
    out["out_conv"] = _conv(sd, f"{key}.out_conv")
    return out


def convert_zoedepth_nk(sd: Dict[str, np.ndarray], cfg: ZoeDepthNKConfig = ZoeDepthNKConfig()) -> dict:
    """Convert a ZoeD_M12_NK state dict (checkpoint["model"], numpy arrays)
    to this module's parameter tree."""
    p: dict = {}
    pre = "core.core.pretrained.model"
    core: dict = {
        "patch_embed_proj": _conv(sd, f"{pre}.patch_embed.proj"),
        "cls_token": sd[f"{pre}.cls_token"],
    }
    for i in range(cfg.core.depth):
        b = f"{pre}.blocks.{i}"
        core[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "gamma_1": sd[f"{b}.gamma_1"],
            "gamma_2": sd[f"{b}.gamma_2"],
            "mlp_fc1": _lin(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _lin(sd, f"{b}.mlp.fc2"),
            "attn": {
                "qkv_kernel": sd[f"{b}.attn.qkv.weight"].T,
                "q_bias": sd[f"{b}.attn.q_bias"],
                "v_bias": sd[f"{b}.attn.v_bias"],
                "relative_position_bias_table": sd[f"{b}.attn.relative_position_bias_table"],
                "proj": _lin(sd, f"{b}.attn.proj"),
            },
        }
    # act_postprocess1..4: Sequential(ProjectReadout(project=Sequential(
    # Linear, GELU)), Transpose, Unflatten, Conv 1x1, resize)
    pp = "core.core.pretrained"
    for i in range(4):
        ap = f"{pp}.act_postprocess{i+1}"
        core[f"readout_{i}"] = _lin(sd, f"{ap}.0.project.0")
        core[f"projects_{i}"] = _conv(sd, f"{ap}.3")
        if i in (0, 1):
            core[f"resize_layers_{i}"] = _convT(sd, f"{ap}.4")
        elif i == 3:
            core[f"resize_layers_{i}"] = _conv(sd, f"{ap}.4")
    sc = "core.core.scratch"
    for i in range(4):
        core[f"layer{i+1}_rn"] = _conv(sd, f"{sc}.layer{i+1}_rn", bias=False)
        core[f"refinenet{i+1}"] = _fusion(sd, f"{sc}.refinenet{i+1}", has_skip=(i != 3))
    core["head_conv1"] = _conv(sd, f"{sc}.output_conv.0")
    core["head_conv2"] = _conv(sd, f"{sc}.output_conv.2")
    core["head_conv3"] = _conv(sd, f"{sc}.output_conv.4")
    p["core"] = core

    p["conv2"] = _conv(sd, "conv2")
    pt: dict = {"embedding_convPxP": _conv(sd, "patch_transformer.embedding_convPxP")}
    for i in range(4):
        t = f"patch_transformer.transformer_encoder.layers.{i}"
        pt[f"layers_{i}"] = {
            "in_proj_weight": sd[f"{t}.self_attn.in_proj_weight"],
            "in_proj_bias": sd[f"{t}.self_attn.in_proj_bias"],
            "out_proj": _lin(sd, f"{t}.self_attn.out_proj"),
            "linear1": _lin(sd, f"{t}.linear1"),
            "linear2": _lin(sd, f"{t}.linear2"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
    p["patch_transformer"] = pt
    p["mlp_classifier_0"] = _lin(sd, "mlp_classifier.0")
    p["mlp_classifier_2"] = _lin(sd, "mlp_classifier.2")

    p["seed_projector"] = _net2(sd, "seed_projector._net")
    for i in range(4):
        p[f"projectors_{i}"] = _net2(sd, f"projectors.{i}._net")
    for conf in cfg.bin_conf:
        nm = conf.name
        p[f"seed_bin_regressors_{nm}"] = _net2(sd, f"seed_bin_regressors.{nm}._net")
        for i in range(4):
            p[f"attractors_{nm}_{i}"] = _net2(sd, f"attractors.{nm}.{i}._net")
        p[f"conditional_log_binomial_{nm}"] = {
            "mlp_0": _conv(sd, f"conditional_log_binomial.{nm}.mlp.0"),
            "mlp_2": _conv(sd, f"conditional_log_binomial.{nm}.mlp.2"),
        }
    return {"params": p}
