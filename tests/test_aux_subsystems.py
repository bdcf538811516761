"""Attention capture, visualization, and checkpointing tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.utils import attention_vis as av


import pytest

pytestmark = pytest.mark.fast


def test_attention_capture_and_aggregation():
    from geodiffuser_tpu.models.unet import UNet2DCondition

    cfg = ModelConfig.tiny()
    unet = UNet2DCondition(cfg)
    sample = jnp.zeros((2, 32, 32, 4))
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.int32(1), ctx)
    out, aux = unet.apply(
        params, sample, jnp.int32(500), ctx, mutable=["attn_store"]
    )
    rec = av.AttentionRecorder()
    rec.update(aux["attn_store"])
    rec.update(aux["attn_store"])
    maps = rec.averaged()
    assert maps, "no attention maps captured"
    # all captured maps are <= 16^2 tokens (reference memory guard)
    for m in maps.values():
        assert m.shape[-2] <= 256
    agg = av.aggregate_cross_attention(maps, res=16)
    assert agg.shape == (16, 16, 77)
    tok = av.aggregate_cross_attention(maps, res=16, token=3)
    heat = av.colorize(tok, size=64)
    assert heat.shape == (64, 64, 3) and heat.dtype == np.uint8


def test_overlay_and_grid():
    img = np.zeros((32, 32, 3), np.uint8)
    m1 = np.zeros((32, 32)); m1[:16] = 1
    m2 = np.zeros((32, 32)); m2[:, :16] = 1
    out = av.overlay_masks(img, [m1, m2])
    assert out.shape == (32, 32, 3)
    assert (out[:16, 16:] != 0).any() and (out[16:, 16:] == 0).all()
    grid = av.view_images([img, out, img])
    assert grid.ndim == 3


def test_param_checkpoint_roundtrip(tmp_path):
    from geodiffuser_tpu.utils import checkpoint as ck

    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones((4,), jnp.bfloat16)}}
    path = str(tmp_path / "ckpt")
    ck.save_params(path, params)
    restored = ck.load_params(path, like=params)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(params["a"]))
    assert restored["nested"]["b"].dtype == jnp.bfloat16


def test_sweep_manifest(tmp_path):
    from geodiffuser_tpu.utils.checkpoint import SweepManifest

    p = str(tmp_path / "manifest.json")
    m = SweepManifest(p)
    assert not m.is_done("x")
    m.mark("x", 1.5)
    m2 = SweepManifest(p)
    assert m2.is_done("x") and m2.done["x"] == 1.5
