"""Model architecture tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.models.clip_text import CLIPTextEncoder
from geodiffuser_tpu.models.tokenizer import HashTokenizer, load_tokenizer
from geodiffuser_tpu.models.unet import UNet2DCondition
from geodiffuser_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny()


def test_unet_shapes_and_attention_count(cfg):
    unet = UNet2DCondition(cfg)
    sample = jnp.zeros((2, 32, 32, 4))
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.int32(1), ctx)
    out = unet.apply(params, sample, jnp.int32(1), ctx)
    assert out.shape == (2, 32, 32, 4)
    assert bool(jnp.isfinite(out).all())
    # transformer-block count follows the SD-1.x layout: for the full config
    # this is 16 blocks -> 32 attention layers, the reference's registered
    # processor count (attention_processors.py:26-53)
    n = len(cfg.block_out_channels)
    lpb = cfg.layers_per_block
    expected_attn = 2 * ((n - 1) * lpb + 1 + (n - 1) * (lpb + 1))
    flat = jax.tree_util.tree_leaves_with_path(params)
    attn_q = {jax.tree_util.keystr(k) for k, _ in flat if "to_q" in jax.tree_util.keystr(k)}
    assert len(attn_q) == expected_attn, (len(attn_q), expected_attn)
    full = ModelConfig()
    assert 2 * (3 * full.layers_per_block + 1 + 3 * (full.layers_per_block + 1)) == 32


def test_unet_sd15_param_count():
    """Full-size config must match SD-1.x UNet parameter count (859.5M)."""
    cfg = ModelConfig()
    unet = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, 768))
    params = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), sample, jnp.int32(1), ctx)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 859_520_964, n


def test_unet_sd21_geometry():
    """SD-2.x support (per-block head counts + linear transformer
    projections, VERDICT r2 next-#5): a tiny SD-2.1-style UNet runs and its
    projection params are Dense (2-D kernels); the full ModelConfig.sd21()
    geometry matches the published SD-2.1 UNet parameter count exactly."""
    tiny = ModelConfig.tiny_sd21()
    unet = UNet2DCondition(tiny)
    sample = jnp.zeros((1, 32, 32, 4))
    ctx = jnp.zeros((1, 77, tiny.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.int32(1), ctx)
    out = unet.apply(params, sample, jnp.int32(1), ctx)
    assert out.shape == (1, 32, 32, 4)
    assert bool(jnp.isfinite(out).all())
    proj = params["params"]["down_blocks_0_attentions_0"]["proj_in"]["kernel"]
    assert proj.ndim == 2  # Dense, not 1x1 conv

    full = ModelConfig.sd21()
    m = UNet2DCondition(full)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.int32(1), jnp.zeros((1, 77, 1024)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    assert n == 865_910_724, n

    # SD-2.1 text tower: 23-layer (penultimate) OpenCLIP ViT-H, 1024-wide
    from geodiffuser_tpu.models.clip_text import CLIPTextEncoder

    te = CLIPTextEncoder(full)
    tshapes = jax.eval_shape(
        lambda: te.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    )
    tn = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tshapes))
    assert tn == 340_387_840, tn


def test_vae_shapes(cfg):
    vae = AutoencoderKL(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), img)
    lat = vae.apply(params, img, method=vae.encode)
    assert lat.shape == (1, 8, 8, cfg.vae_latent_channels)
    dec = vae.apply(params, lat, method=vae.decode)
    assert dec.shape == (1, 64, 64, 3)


def test_vae_sd_param_count():
    cfg = ModelConfig()
    vae = AutoencoderKL(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), img))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 83_653_863, n  # diffusers AutoencoderKL for SD (incl. quant convs)


def test_clip_causality(cfg):
    te = CLIPTextEncoder(cfg)
    ids = jnp.ones((1, 77), jnp.int32)
    params = te.init(jax.random.PRNGKey(0), ids)
    out1 = te.apply(params, ids)
    ids2 = ids.at[0, 50].set(7)
    out2 = te.apply(params, ids2)
    # causal: positions before 50 unaffected, position >= 50 affected
    np.testing.assert_allclose(np.asarray(out1[0, :50]), np.asarray(out2[0, :50]), atol=1e-5)
    assert float(jnp.abs(out1[0, 50:] - out2[0, 50:]).max()) > 1e-4


def test_clip_param_count():
    cfg = ModelConfig()
    te = CLIPTextEncoder(cfg)
    ids = jnp.ones((1, 77), jnp.int32)
    params = jax.eval_shape(lambda: te.init(jax.random.PRNGKey(0), ids))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # CLIP ViT-L/14 text tower without the projection head: 123.06M
    assert n == 123_060_480, n


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=1000)
    a = tok(["a red cat", "a red cat"])
    assert a.shape == (2, 77)
    np.testing.assert_array_equal(a[0], a[1])
    b = tok(["a blue cat"])
    assert (a[0] != b[0]).any()
    assert load_tokenizer(None, 1000).vocab_size == 1000
