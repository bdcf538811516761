"""Generate checkpoint name/shape manifests (geodiffuser_tpu/models/manifests/).

A manifest pins the exact key->shape layout of a released checkpoint so the
first real-weight run is a formality instead of a risk (VERDICT r2 next-#4):
tests/test_checkpoint_manifests.py builds manifest-shaped synthetic state
dicts and fails on any converter/key drift.

Provenance per manifest (recorded in the JSON):
  * true-torch: the actual torch model class instantiated (vendored
    reference code / transformers) and its state_dict() harvested — exact.
  * reverse-mapped: built by inverting our converter's mapping over a
    full-geometry flax init; validated against the published parameter
    count of the released artifact (recorded as `param_count_expected`).

`unconsumed` lists keys present in the released file that the converter
deliberately ignores (buffers, constructed-but-unused modules).

Run from the repo root:  python scripts/gen_manifests.py
"""

import json
import math
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "geodiffuser_tpu", "models", "manifests")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def write(name, artifact, provenance, keys, unconsumed=(), expected_params=None):
    total = sum(math.prod(s) if s else 1 for s in keys.values())
    payload = {
        "artifact": artifact,
        "provenance": provenance,
        "param_count": int(total),
        "unconsumed": sorted(unconsumed),
        "keys": {k: list(map(int, keys[k])) for k in sorted(keys)},
    }
    if expected_params is not None:
        payload["param_count_expected"] = int(expected_params)
        assert total == expected_params, (name, total, expected_params)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name + ".json"), "w") as f:
        json.dump(payload, f, indent=0)
    print(f"{name}: {len(keys)} keys, {total:,} params")


def _stub_torchvision():
    mods = {}
    for n in ("torchvision", "torchvision.transforms",
              "torchvision.transforms.functional", "torchvision.ops",
              "torchvision.ops.boxes"):
        mods[n] = types.ModuleType(n)
        mods[n].__path__ = []
    f = mods["torchvision.transforms.functional"]
    f.resize = f.to_pil_image = lambda *a, **k: None
    b = mods["torchvision.ops.boxes"]
    b.batched_nms = b.box_area = lambda *a, **k: None
    sys.modules.update(mods)


def gen_sam():
    import torch

    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    from GeoDiffuser.segment_anything import sam_model_registry

    with torch.device("meta"):
        sam = sam_model_registry["vit_h"](checkpoint=None)
    keys = {k: list(v.shape) for k, v in sam.state_dict().items()}
    unconsumed = [k for k in keys if k.startswith("prompt_encoder.mask_downscaling")]
    write("sam_vit_h", "sam_vit_h_4b8939.pth (facebookresearch/segment-anything)",
          "true-torch (vendored GeoDiffuser/segment_anything, meta device)",
          keys, unconsumed)


def gen_clip():
    import torch
    from transformers import (CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
                              CLIPVisionModel)

    tcfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    with torch.device("meta"):
        tm = CLIPTextModel(tcfg)
    keys = {k: list(v.shape) for k, v in tm.state_dict().items()}
    # the released SD-1.4 text_encoder (older transformers) carries the
    # position_ids buffer; convert_clip_text skips it
    keys["text_model.embeddings.position_ids"] = [1, 77]
    write("sd14_text_encoder",
          "CompVis/stable-diffusion-v1-4 text_encoder (CLIP ViT-L/14 text tower)",
          "true-torch (transformers CLIPTextModel, meta device)",
          keys, ["text_model.embeddings.position_ids"],
          expected_params=123060480 + 77)

    vcfg = CLIPVisionConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=224, patch_size=32,
        hidden_act="quick_gelu",
    )
    with torch.device("meta"):
        vm = CLIPVisionModel(vcfg)
    keys = {k: list(v.shape) for k, v in vm.state_dict().items()}
    keys["vision_model.embeddings.position_ids"] = [1, 50]
    keys["visual_projection.weight"] = [512, 768]
    write("clip_vision_vitb32",
          "openai/clip-vit-base-patch32 vision tower + projection "
          "(the reference metric's CLIP, image_fidelity.py:183-206)",
          "true-torch (transformers CLIPVisionModel, meta device; projection "
          "appended per CLIPVisionModelWithProjection)",
          keys, ["vision_model.embeddings.position_ids"])


def gen_depth_anything():
    # torch.hub needs the hub dir layout; symlink through /tmp
    import subprocess

    hub = "/tmp/gdhub/GeoDiffuser"
    os.makedirs(hub, exist_ok=True)
    link = os.path.join(hub, "Depth-Anything")
    if not os.path.exists(link):
        os.symlink("/root/reference/GeoDiffuser/Depth-Anything", link)
    cwd = os.getcwd()
    os.chdir("/tmp/gdhub")
    try:
        sys.path.insert(0, "/root/reference/GeoDiffuser")
        from depth_anything.dpt import DPT_DINOv2

        m = DPT_DINOv2(encoder="vitl", features=256,
                       out_channels=[256, 512, 1024, 1024], localhub=True)
        keys = {k: list(v.shape) for k, v in m.state_dict().items()}
    finally:
        os.chdir(cwd)
    unconsumed = [k for k in keys
                  if k.endswith("mask_token")
                  or "refinenet4.resConfUnit1" in k]
    write("depth_anything_vitl14",
          "LiheYoung/depth_anything_vitl14 (DINOv2-L + DPT head)",
          "true-torch (vendored depth_anything/dpt.py + local torchhub DINOv2)",
          keys, unconsumed, expected_params=335315649)


def _zeros_tree(eval_tree):
    import jax

    return jax.tree.map(lambda s: np.zeros(s.shape, np.float16), eval_tree)


def gen_sd_unet_vae():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.config import ModelConfig
    from geodiffuser_tpu.models.unet import UNet2DCondition
    from geodiffuser_tpu.models.vae import AutoencoderKL
    from test_weights import _unet_to_torch_key, _vae_to_torch_key

    cfg = ModelConfig()
    unet = UNet2DCondition(cfg)
    tree = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.int32(1),
                            jnp.zeros((1, 77, cfg.cross_attention_dim))),
        jax.random.PRNGKey(0),
    )
    keys = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        ks = [getattr(p, "key", str(p)) for p in path]
        tkey, tval = _unet_to_torch_key(ks, np.zeros(leaf.shape, np.float16))
        keys[tkey] = list(tval.shape)
    write("sd14_unet",
          "CompVis/stable-diffusion-v1-4 unet/diffusion_pytorch_model "
          "(diffusers UNet2DConditionModel layout)",
          "reverse-mapped from our converter; param count equals the "
          "published SD-1.4 UNet total exactly",
          keys, expected_params=859520964)

    vae = AutoencoderKL(cfg)
    vtree = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 32, 32, 3))), jax.random.PRNGKey(0)
    )
    vkeys = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(vtree):
        ks = [getattr(p, "key", str(p)) for p in path]
        tkey, tval = _vae_to_torch_key(ks, np.zeros(leaf.shape, np.float16))
        vkeys[tkey] = list(tval.shape)
    write("sd_vae",
          "CompVis/stable-diffusion-v1-4 vae + stabilityai/sd-vae-ft-mse "
          "(identical diffusers AutoencoderKL layout, diffusion.py:126-128)",
          "reverse-mapped from our converter; param count equals the "
          "published SD VAE total exactly",
          vkeys, expected_params=83653863)


def gen_sd21():
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    from geodiffuser_tpu.config import ModelConfig
    from geodiffuser_tpu.models.unet import UNet2DCondition
    from test_weights import _unet_to_torch_key

    cfg = ModelConfig.sd21()
    unet = UNet2DCondition(cfg)
    tree = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.int32(1),
                            jnp.zeros((1, 77, cfg.cross_attention_dim))),
        jax.random.PRNGKey(0),
    )
    keys = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        ks = [getattr(p, "key", str(p)) for p in path]
        tkey, tval = _unet_to_torch_key(ks, np.zeros(leaf.shape, np.float16))
        keys[tkey] = list(tval.shape)
    write("sd21_unet",
          "stabilityai/stable-diffusion-2-1 unet (the DIFT featurizer's "
          "model, evaluation/dift_sd.py:16)",
          "reverse-mapped from our converter; param count equals the "
          "published SD-2.1 UNet total exactly",
          keys, expected_params=865910724)

    tcfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=23, num_attention_heads=16,
        max_position_embeddings=77, hidden_act="gelu",
    )
    with torch.device("meta"):
        tm = CLIPTextModel(tcfg)
    tkeys = {k: list(v.shape) for k, v in tm.state_dict().items()}
    tkeys["text_model.embeddings.position_ids"] = [1, 77]
    write("sd21_text_encoder",
          "stabilityai/stable-diffusion-2-1 text_encoder (23-layer OpenCLIP "
          "ViT-H text tower in HF CLIPTextModel layout)",
          "true-torch (transformers CLIPTextModel, meta device)",
          tkeys, ["text_model.embeddings.position_ids"],
          expected_params=340387840 + 77)


def gen_zoedepth_nk():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import zoedepth_nk as znk
    from test_zoedepth_nk import _invert_params_to_torch_sd

    cfg = znk.ZoeDepthNKConfig()
    model = znk.ZoeDepthNK(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 384, 384, 3))), jax.random.PRNGKey(0)
    )
    params = _zeros_tree(tree)["params"]
    sd = _invert_params_to_torch_sd(params, cfg)
    keys = {k: list(np.shape(v)) for k, v in sd.items()}
    # buffers/modules expected in the released file, ignored by the
    # (pull-style) converter
    ws = cfg.core.train_window[0]  # BEiT rel-pos window (patches per side)
    unconsumed = []
    for i in range(cfg.core.depth):
        unconsumed.append(
            f"core.core.pretrained.model.blocks.{i}.attn.relative_position_index")
        keys[unconsumed[-1]] = [ws * ws + 1, ws * ws + 1]
    for k, s in (("norm.weight", [cfg.core.embed_dim]),
                 ("norm.bias", [cfg.core.embed_dim])):
        kk = f"core.core.pretrained.model.{k}"
        unconsumed.append(kk)
        keys[kk] = s
    for k4 in ("conv1", "conv2"):
        for leaf, s in (("weight", [256, 256, 3, 3]), ("bias", [256])):
            kk = f"core.core.scratch.refinenet4.resConfUnit1.{k4}.{leaf}"
            unconsumed.append(kk)
            keys[kk] = s
    write("zoedepth_nk",
          "ZoeD_M12_NK.pt (isl-org/ZoeDepth release, depth_predictor.py:296)",
          "reverse-mapped from convert_zoedepth_nk at full BEiT-L geometry",
          keys, unconsumed)


def gen_dpt_large():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import midas_dpt as md

    cfg = md.DPTConfig()
    model = md.DPTLarge(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 384, 384, 3))), jax.random.PRNGKey(0)
    )
    p = _zeros_tree(tree)["params"]
    sd = {}
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)
    pm = "pretrained.model"
    sd[f"{pm}.patch_embed.proj.weight"] = c4(p["patch_embed_proj"]["kernel"])
    sd[f"{pm}.patch_embed.proj.bias"] = p["patch_embed_proj"]["bias"]
    sd[f"{pm}.cls_token"] = p["cls_token"]
    sd[f"{pm}.pos_embed"] = p["pos_embed"]
    for i in range(cfg.depth):
        blk = p[f"blocks_{i}"]
        pt = f"{pm}.blocks.{i}"
        for nrm in ("norm1", "norm2"):
            sd[f"{pt}.{nrm}.weight"] = blk[nrm]["scale"]
            sd[f"{pt}.{nrm}.bias"] = blk[nrm]["bias"]
        for ours, theirs in (("attn_qkv", "attn.qkv"), ("attn_proj", "attn.proj"),
                             ("mlp_fc1", "mlp.fc1"), ("mlp_fc2", "mlp.fc2")):
            sd[f"{pt}.{theirs}.weight"] = np.asarray(blk[ours]["kernel"]).T
            sd[f"{pt}.{theirs}.bias"] = blk[ours]["bias"]
    for tap in range(4):
        post = f"pretrained.act_postprocess{tap + 1}"
        sd[f"{post}.0.project.0.weight"] = np.asarray(p[f"readout_{tap}"]["kernel"]).T
        sd[f"{post}.0.project.0.bias"] = p[f"readout_{tap}"]["bias"]
        sd[f"{post}.3.weight"] = c4(p[f"projects_{tap}"]["kernel"])
        sd[f"{post}.3.bias"] = p[f"projects_{tap}"]["bias"]
    for tap in (0, 1):
        sd[f"pretrained.act_postprocess{tap + 1}.4.weight"] = np.asarray(
            p[f"resize_layers_{tap}"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"pretrained.act_postprocess{tap + 1}.4.bias"] = p[f"resize_layers_{tap}"]["bias"]
    sd["pretrained.act_postprocess4.4.weight"] = c4(p["resize_layers_3"]["kernel"])
    sd["pretrained.act_postprocess4.4.bias"] = p["resize_layers_3"]["bias"]
    from test_midas_backends import _add_scratch

    _add_scratch(sd, p, out_conv=True)
    keys = {k: list(np.shape(v)) for k, v in sd.items()}
    unconsumed = []
    extra = {
        f"{pm}.norm.weight": [cfg.embed_dim], f"{pm}.norm.bias": [cfg.embed_dim],
        f"{pm}.head.weight": [1000, cfg.embed_dim], f"{pm}.head.bias": [1000],
    }
    for k4 in ("conv1", "conv2"):
        extra[f"scratch.refinenet4.resConfUnit1.{k4}.weight"] = [
            cfg.features, cfg.features, 3, 3]
        extra[f"scratch.refinenet4.resConfUnit1.{k4}.bias"] = [cfg.features]
    keys.update(extra)
    unconsumed += list(extra)
    write("dpt_large",
          "dpt_large-midas-2f21e586.pt (intel-isl/DPT release; the "
          "dpt_large model_type, depth_predictor.py:105-274)",
          "reverse-mapped from convert_dpt_large at full ViT-L/16 geometry",
          keys, unconsumed)


def gen_dpt_hybrid():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import midas_dpt as md
    from test_midas_backends import _synthetic_dpt_hybrid_state

    cfg = md.DPTHybridConfig()
    model = md.DPTHybrid(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 384, 384, 3))), jax.random.PRNGKey(0)
    )
    params = {"params": _zeros_tree(tree)["params"]}
    sd = _synthetic_dpt_hybrid_state(params, cfg)
    keys = {k: list(np.shape(v)) for k, v in sd.items()}
    unconsumed = []
    pm = "pretrained.model"
    extra = {
        f"{pm}.norm.weight": [cfg.embed_dim], f"{pm}.norm.bias": [cfg.embed_dim],
        f"{pm}.head.weight": [1000, cfg.embed_dim], f"{pm}.head.bias": [1000],
    }
    for k4 in ("conv1", "conv2"):
        extra[f"scratch.refinenet4.resConfUnit1.{k4}.weight"] = [256, 256, 3, 3]
        extra[f"scratch.refinenet4.resConfUnit1.{k4}.bias"] = [256]
    keys.update(extra)
    unconsumed += list(extra)
    write("dpt_hybrid",
          "dpt_hybrid-midas-501f0c75.pt (intel-isl/DPT release; also the "
          "kitti/nyu metric variants' layout)",
          "reverse-mapped from convert_dpt_hybrid at full "
          "R50+ViT-B/16 geometry",
          keys, unconsumed)


def gen_midas_v21():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import midas_dpt as md
    from test_midas_backends import _add_scratch

    cfg = md.MidasV21Config()
    model = md.MidasNetV21(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 384, 384, 3))), jax.random.PRNGKey(0)
    )
    p = _zeros_tree(tree)["params"]
    sd = {}
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)

    def add_bn(prefix, q):
        sd[prefix + ".weight"] = q["scale"]
        sd[prefix + ".bias"] = q["bias"]
        sd[prefix + ".running_mean"] = q["mean"]
        sd[prefix + ".running_var"] = q["var"]

    sd["pretrained.layer1.0.weight"] = c4(p["conv1"]["kernel"])
    add_bn("pretrained.layer1.1", p["bn1"])
    for s, n_blocks in enumerate(cfg.layers):
        for j in range(n_blocks):
            blk = p[f"layer{s + 1}_{j}"]
            pt = (f"pretrained.layer1.4.{j}" if s == 0
                  else f"pretrained.layer{s + 1}.{j}")
            for c in (1, 2, 3):
                sd[f"{pt}.conv{c}.weight"] = c4(blk[f"conv{c}"]["kernel"])
                add_bn(f"{pt}.bn{c}", blk[f"bn{c}"])
            if "downsample_conv" in blk:
                sd[f"{pt}.downsample.0.weight"] = c4(blk["downsample_conv"]["kernel"])
                add_bn(f"{pt}.downsample.1", blk["downsample_bn"])
    _add_scratch(sd, p, out_conv=False)
    keys = {k: list(np.shape(v)) for k, v in sd.items()}
    # BN num_batches_tracked buffers ride along in the released file
    unconsumed = []
    for k in list(keys):
        if k.endswith(".running_mean"):
            nb = k[: -len(".running_mean")] + ".num_batches_tracked"
            keys[nb] = []
            unconsumed.append(nb)
    for k4 in ("conv1", "conv2"):
        for leaf, s in (("weight", [cfg.features, cfg.features, 3, 3]),
                        ("bias", [cfg.features])):
            kk = f"scratch.refinenet4.resConfUnit1.{k4}.{leaf}"
            keys[kk] = s
            unconsumed.append(kk)
    write("midas_v21",
          "midas_v21-f6b98070.pt (intel-isl/MiDaS release; midas_v21 "
          "model_type)",
          "reverse-mapped from convert_midas_v21 at full ResNeXt101 geometry",
          keys, unconsumed)


if __name__ == "__main__":
    gen_sd_unet_vae()
    gen_sd21()
    gen_clip()
    gen_sam()
    gen_depth_anything()
    gen_zoedepth_nk()
    gen_dpt_large()
    gen_dpt_hybrid()
    gen_midas_v21()
