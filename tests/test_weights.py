"""Checkpoint conversion tests.

The CLIP text tower gets a TRUE numerical-parity test against
torch/transformers (random-init torch model -> convert -> compare outputs).
UNet/VAE converters are exercised against synthetic state dicts in the exact
diffusers key layout (structural + shape coverage; diffusers itself is not
installed in this environment).
"""

import numpy as np
import pytest

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.models import weights as W


def test_clip_text_numerical_parity_vs_transformers():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models.clip_text import CLIPTextEncoder

    hf_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    ours_cfg = ModelConfig(
        text_vocab_size=1000, text_hidden_size=64, text_layers=2, text_heads=4,
        dtype=jnp.float32,
    )
    ours = CLIPTextEncoder(ours_cfg)
    ids = np.array([[1, 5, 9, 2, 0, 7] + [3] * 71], np.int32)
    params0 = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    converted = W.convert_clip_text(state)
    W._check_same_structure(params0, converted, "clip")

    out_ours = np.asarray(ours.apply(converted, jnp.asarray(ids)))
    with torch.no_grad():
        out_hf = hf(torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(out_ours, out_hf, atol=2e-4, rtol=1e-3)


def _synthetic_state_from_tree(tree, to_torch_key):
    """Build a diffusers-layout state dict from our param tree (inverse
    mapping), with torch-convention shapes."""
    import jax

    state = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        keys = [getattr(p, "key", str(p)) for p in path]
        tkey, tval = to_torch_key(keys, np.asarray(leaf))
        state[tkey] = tval
    return state


def _unet_to_torch_key(keys, val):
    # keys like ['params', 'down_blocks_0_attentions_0', 'transformer_blocks_0',
    #            'attn1', 'to_q', 'kernel']
    keys = keys[1:]
    mod = keys[0]
    mod = (
        mod.replace("down_blocks_", "down_blocks.")
        .replace("up_blocks_", "up_blocks.")
        .replace("mid_block_resnets_", "mid_block.resnets.")
        .replace("mid_block_attentions_", "mid_block.attentions.")
    )
    import re

    mod = re.sub(r"\.(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)", r".\1.\2.\3", mod)
    rest = [k.replace("transformer_blocks_", "transformer_blocks.")
             .replace("to_out_0", "to_out.0")
             .replace("net_0", "net.0").replace("net_2", "net.2")
            for k in keys[1:-1]]
    leaf = keys[-1]
    if leaf == "kernel":
        if val.ndim == 4:
            return ".".join([mod] + rest + ["weight"]), val.transpose(3, 2, 0, 1)
        return ".".join([mod] + rest + ["weight"]), val.T
    if leaf == "scale":
        return ".".join([mod] + rest + ["weight"]), val
    return ".".join([mod] + rest + ["bias"]), val


def test_unet_converter_roundtrip():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models.unet import UNet2DCondition

    cfg = ModelConfig.tiny()
    unet = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.int32(1), ctx)

    state = _synthetic_state_from_tree(params, _unet_to_torch_key)
    converted = W.convert_unet(state)
    W._check_same_structure(params, converted, "unet")
    # values roundtrip exactly
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: np.asarray(b), params, converted)
    )
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)


def _vae_to_torch_key(keys, val):
    keys = keys[1:]
    parts = []
    for k in keys[:-1]:
        import re

        k = re.sub(r"^(down|up)_blocks_(\d+)_(resnets|downsamplers|upsamplers)_(\d+)$",
                   r"\1_blocks.\2.\3.\4", k)
        k = k.replace("mid_block_resnets_", "mid_block.resnets.")
        k = k.replace("mid_block_attentions_", "mid_block.attentions.")
        k = k.replace("to_out_0", "to_out.0")
        parts.append(k)
    leaf = keys[-1]
    if leaf == "kernel":
        if val.ndim == 4:
            return ".".join(parts + ["weight"]), val.transpose(3, 2, 0, 1)
        return ".".join(parts + ["weight"]), val.T
    if leaf == "scale":
        return ".".join(parts + ["weight"]), val
    return ".".join(parts + ["bias"]), val


def test_vae_converter_roundtrip():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models.vae import AutoencoderKL

    cfg = ModelConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = _synthetic_state_from_tree(params, _vae_to_torch_key)
    converted = W.convert_vae(state)
    W._check_same_structure(params, converted, "vae")


def test_structure_check_catches_mismatch():
    with pytest.raises(ValueError):
        W._check_same_structure(
            {"params": {"a": np.zeros((2, 2))}},
            {"params": {"b": np.zeros((2, 2))}},
            "x",
        )


def test_clip_vision_numerical_parity_vs_transformers():
    import torch
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder

    hf_cfg = HFCfg(
        image_size=32, patch_size=8, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    ours = CLIPVisionEncoder(CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, layers=2, heads=4, projection_dim=16,
    ))
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    params0 = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    conv = W.convert_clip_vision(state)
    W._check_same_structure(params0, conv, "clip_vision")
    out_ours = np.asarray(ours.apply(conv, jnp.asarray(x)))
    with torch.no_grad():
        out_ref = hf(torch.tensor(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    np.testing.assert_allclose(out_ours, out_ref, atol=3e-4, rtol=1e-3)
