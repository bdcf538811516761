"""Diffusers/HF checkpoint -> flax param-tree conversion.

Loads a local Stable-Diffusion checkpoint in the diffusers directory layout
(the format the reference pulls from the hub: `StableDiffusionPipeline.
from_pretrained`, diffusion.py:107; VAE swap :126-128; custom UNet
:133-137):

    <dir>/unet/diffusion_pytorch_model.safetensors
    <dir>/vae/diffusion_pytorch_model.safetensors
    <dir>/text_encoder/model.safetensors
    <dir>/tokenizer/{vocab.json, merges.txt}

Conversion rules (torch -> flax):
    Linear  weight (out, in)        -> kernel (in, out)         [transpose]
    Conv    weight (out, in, kh, kw)-> kernel (kh, kw, in, out) [perm 2,3,1,0]
    Norm    weight/bias             -> scale/bias
    Embedding weight                -> embedding

The environment this framework was built in has no network egress, so the
full converters are exercised against synthetic checkpoints with the exact
diffusers key layout, plus a true numerical-parity test for the CLIP text
tower against torch/transformers (tests/test_weights.py).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _assign(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# --------------------------------------------------------------------- UNet

_UNET_MODULE_RE = [
    # down_blocks.0.resnets.1 / attentions.1 / downsamplers.0
    (re.compile(r"^(down_blocks)\.(\d+)\.(resnets|attentions|downsamplers)\.(\d+)\.(.*)$"),
     lambda m: (f"{m.group(1)}_{m.group(2)}_{m.group(3)}_{m.group(4)}", m.group(5))),
    (re.compile(r"^(up_blocks)\.(\d+)\.(resnets|attentions|upsamplers)\.(\d+)\.(.*)$"),
     lambda m: (f"{m.group(1)}_{m.group(2)}_{m.group(3)}_{m.group(4)}", m.group(5))),
    (re.compile(r"^mid_block\.(resnets|attentions)\.(\d+)\.(.*)$"),
     lambda m: (f"mid_block_{m.group(1)}_{m.group(2)}", m.group(3))),
    (re.compile(r"^(time_embedding|conv_in|conv_out|conv_norm_out)\.(.*)$"),
     lambda m: (m.group(1), m.group(2))),
]


def _split_unet_key(key: str) -> Tuple[str, str]:
    for rx, fn in _UNET_MODULE_RE:
        m = rx.match(key)
        if m:
            return fn(m)
    raise KeyError(f"unrecognized UNet key: {key}")


def _inner_path(rest: str) -> Tuple[str, ...]:
    """Convert the within-module remainder to our flax path components."""
    rest = rest.replace("transformer_blocks.", "transformer_blocks_")
    rest = rest.replace("to_out.0", "to_out_0")
    rest = rest.replace("ff.net.0", "ff.net_0")
    rest = rest.replace("ff.net.2", "ff.net_2")
    return tuple(rest.split("."))


_PARAM_MAP = {"weight": "kernel", "bias": "bias"}
_NORM_HINTS = ("norm", "layer_norm", "group_norm", "final_layer_norm")


def _is_norm(path: Tuple[str, ...]) -> bool:
    name = path[-2] if len(path) >= 2 else ""
    return any(h in name for h in _NORM_HINTS)


def _convert_tensor(path: Tuple[str, ...], t: np.ndarray) -> Tuple[Tuple[str, ...], np.ndarray]:
    leaf = path[-1]
    if _is_norm(path):
        new_leaf = "scale" if leaf == "weight" else "bias"
        return path[:-1] + (new_leaf,), t
    if leaf == "weight":
        if t.ndim == 4:
            return path[:-1] + ("kernel",), _conv(t)
        if t.ndim == 2:
            return path[:-1] + ("kernel",), _linear(t)
        return path[:-1] + ("scale",), t  # 1-D norm without hint
    return path, t


def convert_unet(state: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, t in state.items():
        module, rest = _split_unet_key(key)
        path = (module,) + _inner_path(rest)
        path, t = _convert_tensor(path, t)
        _assign(tree, path, t)
    return {"params": tree}


# ---------------------------------------------------------------------- VAE

def convert_vae(state: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, t in state.items():
        key = key.replace("mid_block.resnets.", "mid_block_resnets_")
        key = key.replace("mid_block.attentions.", "mid_block_attentions_")
        key = re.sub(r"(down|up)_blocks\.(\d+)\.(resnets|downsamplers|upsamplers)\.(\d+)\.",
                     r"\1_blocks_\2_\3_\4.", key)
        key = key.replace("to_out.0", "to_out_0")
        parts = tuple(key.split("."))
        # encoder./decoder. prefixes become top-level module names
        path, t = _convert_tensor(parts, t)
        _assign(tree, path, t)
    return {"params": tree}


# ------------------------------------------------------------------ CLIP text

def convert_clip_text(state: Dict[str, np.ndarray]) -> dict:
    """HF CLIPTextModel state_dict -> our CLIPTextEncoder tree."""
    tree: dict = {}
    for key, t in state.items():
        key = key.replace("text_model.", "")
        if key == "embeddings.token_embedding.weight":
            _assign(tree, ("token_embedding", "embedding"), t)
            continue
        if key == "embeddings.position_embedding.weight":
            _assign(tree, ("position_embedding",), t)
            continue
        if key == "embeddings.position_ids":
            continue
        m = re.match(r"^encoder\.layers\.(\d+)\.(.*)$", key)
        if m:
            rest = m.group(2)
            rest = rest.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
            path = (f"layers_{m.group(1)}",) + tuple(rest.split("."))
            path, t = _convert_tensor(path, t)
            _assign(tree, path, t)
            continue
        if key.startswith("final_layer_norm."):
            path = ("final_layer_norm", "scale" if key.endswith("weight") else "bias")
            _assign(tree, path, t)
            continue
        raise KeyError(f"unrecognized CLIP key: {key}")
    return {"params": tree}


# ------------------------------------------------------------ CLIP vision

def convert_clip_vision(state: Dict[str, np.ndarray]) -> dict:
    """HF CLIPVisionModel(WithProjection) state_dict -> our tree."""
    tree: dict = {}
    for key, t in state.items():
        key = key.replace("vision_model.", "")
        if key == "embeddings.class_embedding":
            _assign(tree, ("class_embedding",), t)
            continue
        if key == "embeddings.patch_embedding.weight":
            _assign(tree, ("patch_embedding", "kernel"), _conv(t))
            continue
        if key == "embeddings.position_embedding.weight":
            _assign(tree, ("position_embedding",), t)
            continue
        if key == "embeddings.position_ids":
            continue
        if key.startswith("pre_layrnorm."):
            _assign(tree, ("pre_layrnorm", "scale" if key.endswith("weight") else "bias"), t)
            continue
        if key.startswith("post_layernorm."):
            _assign(tree, ("post_layernorm", "scale" if key.endswith("weight") else "bias"), t)
            continue
        if key == "visual_projection.weight":
            _assign(tree, ("visual_projection", "kernel"), _linear(t))
            continue
        m = re.match(r"^encoder\.layers\.(\d+)\.(.*)$", key)
        if m:
            rest = m.group(2).replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
            path = (f"layers_{m.group(1)}",) + tuple(rest.split("."))
            path, t = _convert_tensor(path, t)
            _assign(tree, path, t)
            continue
        raise KeyError(f"unrecognized CLIP vision key: {key}")
    return {"params": tree}


# --------------------------------------------------------- Depth-Anything

def convert_depth_anything(state: Dict[str, np.ndarray]) -> dict:
    """torch DPT_DINOv2 state_dict (depth_anything/dpt.py) -> our
    DepthAnything tree."""
    tree: dict = {}
    for key, t in state.items():
        if key.endswith("mask_token") or "num_batches" in key:
            continue
        if key == "pretrained.cls_token":
            _assign(tree, ("pretrained", "cls_token"), t)
            continue
        if key == "pretrained.pos_embed":
            _assign(tree, ("pretrained", "pos_embed"), t)
            continue
        if key.startswith("pretrained.patch_embed.proj."):
            leaf = key.rsplit(".", 1)[1]
            val = _conv(t) if leaf == "weight" else t
            _assign(tree, ("pretrained", "patch_embed_proj", "kernel" if leaf == "weight" else "bias"), val)
            continue
        m = re.match(r"^pretrained\.blocks\.(\d+)\.(.*)$", key)
        if m:
            rest = m.group(2)
            rest = (rest.replace("attn.qkv", "attn_qkv").replace("attn.proj", "attn_proj")
                        .replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
                        .replace("ls1.gamma", "ls1_gamma").replace("ls2.gamma", "ls2_gamma"))
            path = ("pretrained", f"blocks_{m.group(1)}") + tuple(rest.split("."))
            if path[-1] in ("ls1_gamma", "ls2_gamma"):
                _assign(tree, path, t)
            else:
                path, t = _convert_tensor(path, t)
                _assign(tree, path, t)
            continue
        if key.startswith("pretrained.norm."):
            _assign(tree, ("pretrained", "norm", "scale" if key.endswith("weight") else "bias"), t)
            continue
        m = re.match(r"^depth_head\.(.*)$", key)
        if m:
            rest = m.group(1)
            rest = rest.replace("scratch.", "")
            if rest.startswith("refinenet4.resConfUnit1."):
                # torch constructs resConfUnit1 in refinenet4 but never calls
                # it (refinenet4 gets a single input, dpt.py:127); our module
                # only materializes used params.
                continue
            rest = re.sub(r"^projects\.(\d+)", r"projects_\1", rest)
            rest = re.sub(r"^resize_layers\.(\d+)", r"resize_layers_\1", rest)
            rest = re.sub(r"^refinenet(\d)", r"refinenet\1", rest)
            rest = rest.replace("output_conv2.0", "output_conv2_0")
            rest = rest.replace("output_conv2.2", "output_conv2_2")
            path = ("depth_head",) + tuple(rest.split("."))
            leaf = path[-1]
            if leaf == "weight":
                if "resize_layers_0" in path or "resize_layers_1" in path:
                    # torch ConvTranspose2d (in, out, kh, kw) -> flax
                    # ConvTranspose(transpose_kernel=True) (kh, kw, out, in)
                    t = np.ascontiguousarray(t.transpose(2, 3, 1, 0))
                    path = path[:-1] + ("kernel",)
                elif t.ndim == 4:
                    t = _conv(t)
                    path = path[:-1] + ("kernel",)
                else:
                    path = path[:-1] + ("kernel",)
                    t = _linear(t)
            _assign(tree, path, t)
            continue
        raise KeyError(f"unrecognized Depth-Anything key: {key}")
    return {"params": tree}


# ----------------------------------------------------------------------- SAM

def convert_sam(state: Dict[str, np.ndarray]) -> dict:
    """torch segment_anything Sam state_dict -> our Sam tree.

    mask_downscaling (mask-prompt path) params are skipped: the GeoDiffuser
    pipeline only uses point prompts (depth_predictor.py:53-102).
    """
    tree: dict = {}
    for key, t in state.items():
        if key.startswith("prompt_encoder.mask_downscaling"):
            continue
        # ---- image encoder
        m = re.match(r"^image_encoder\.(.*)$", key)
        if m:
            rest = m.group(1)
            if rest == "pos_embed":
                _assign(tree, ("image_encoder", "pos_embed"), t)
                continue
            if rest.startswith("patch_embed.proj."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                val = _conv(t) if leaf == "kernel" else t
                _assign(tree, ("image_encoder", "patch_embed_proj", leaf), val)
                continue
            mb = re.match(r"^blocks\.(\d+)\.(.*)$", rest)
            if mb:
                r = mb.group(2)
                blk = ("image_encoder", f"blocks_{mb.group(1)}")
                if r in ("attn.rel_pos_h", "attn.rel_pos_w"):
                    _assign(tree, blk + ("attn", r.split(".")[1]), t)
                    continue
                r = r.replace("mlp.lin1", "mlp_lin1").replace("mlp.lin2", "mlp_lin2")
                path = blk + tuple(r.split("."))
                path, t = _convert_tensor(path, t)
                _assign(tree, path, t)
                continue
            mn = re.match(r"^neck\.(\d+)\.(.*)$", rest)
            if mn:
                idx, leaf = mn.group(1), mn.group(2)
                if idx in ("0", "2"):
                    val = _conv(t) if leaf == "weight" else t
                    _assign(tree, ("image_encoder", f"neck_{idx}", "kernel" if leaf == "weight" else "bias"), val)
                else:  # LayerNorm2d keeps torch names weight/bias
                    _assign(tree, ("image_encoder", f"neck_{idx}", leaf), t)
                continue
            raise KeyError(f"unrecognized SAM image_encoder key: {key}")
        # ---- prompt encoder
        m = re.match(r"^prompt_encoder\.(.*)$", key)
        if m:
            rest = m.group(1)
            if rest == "pe_layer.positional_encoding_gaussian_matrix":
                _assign(tree, ("prompt_encoder", "pe_gaussian"), t)
                continue
            me = re.match(r"^point_embeddings\.(\d+)\.weight$", rest)
            if me:
                _assign(tree, ("prompt_encoder", f"point_embed_{me.group(1)}"), t[0])
                continue
            if rest == "not_a_point_embed.weight":
                _assign(tree, ("prompt_encoder", "not_a_point_embed"), t[0])
                continue
            if rest == "no_mask_embed.weight":
                _assign(tree, ("prompt_encoder", "no_mask_embed"), t[0])
                continue
            raise KeyError(f"unrecognized SAM prompt_encoder key: {key}")
        # ---- mask decoder
        m = re.match(r"^mask_decoder\.(.*)$", key)
        if m:
            rest = m.group(1)
            if rest == "iou_token.weight":
                _assign(tree, ("mask_decoder", "iou_token"), t)
                continue
            if rest == "mask_tokens.weight":
                _assign(tree, ("mask_decoder", "mask_tokens"), t)
                continue
            mt = re.match(r"^transformer\.(.*)$", rest)
            if mt:
                r = mt.group(1)
                r = re.sub(r"^layers\.(\d+)\.", r"layers_\1.", r)
                r = r.replace("mlp.lin1", "mlp_lin1").replace("mlp.lin2", "mlp_lin2")
                path = ("mask_decoder",) + tuple(r.split("."))
                path, t = _convert_tensor(path, t)
                _assign(tree, path, t)
                continue
            mu = re.match(r"^output_upscaling\.(\d+)\.(.*)$", rest)
            if mu:
                idx, leaf = mu.group(1), mu.group(2)
                if idx in ("0", "3"):
                    if leaf == "weight":
                        # ConvTranspose2d (in, out, kh, kw) -> (kh, kw, out, in)
                        val = np.ascontiguousarray(t.transpose(2, 3, 1, 0))
                        _assign(tree, ("mask_decoder", f"upscale_{idx}", "kernel"), val)
                    else:
                        _assign(tree, ("mask_decoder", f"upscale_{idx}", "bias"), t)
                else:  # LayerNorm2d
                    _assign(tree, ("mask_decoder", f"upscale_{idx}", leaf), t)
                continue
            mh = re.match(r"^output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)\.(.*)$", rest)
            if mh:
                i, j, leaf = mh.group(1), mh.group(2), mh.group(3)
                path = ("mask_decoder", f"hyper_{i}_lin{j}",
                        "kernel" if leaf == "weight" else "bias")
                _assign(tree, path, _linear(t) if leaf == "weight" else t)
                continue
            mi = re.match(r"^iou_prediction_head\.layers\.(\d+)\.(.*)$", rest)
            if mi:
                j, leaf = mi.group(1), mi.group(2)
                path = ("mask_decoder", f"iou_lin{j}", "kernel" if leaf == "weight" else "bias")
                _assign(tree, path, _linear(t) if leaf == "weight" else t)
                continue
            raise KeyError(f"unrecognized SAM mask_decoder key: {key}")
        raise KeyError(f"unrecognized SAM key: {key}")
    return {"params": tree}


# ------------------------------------------------------------------- loader

def _check_same_structure(ours, theirs, name: str):
    import jax

    a = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(ours)}
    b = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(theirs)}
    missing = sorted(set(a) - set(b))
    extra = sorted(set(b) - set(a))
    mismatched = sorted(k for k in set(a) & set(b) if a[k] != b[k])
    if missing or extra or mismatched:
        raise ValueError(
            f"{name} checkpoint mismatch:\n missing={missing[:8]}\n extra={extra[:8]}\n"
            f" shape-mismatch={[(k, a[k], b[k]) for k in mismatched[:8]]}"
        )


def _load_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict from .safetensors or .bin/.pth."""
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items()}


def load_vae_override(vae_dir: str, init_vae_params: dict, config) -> dict:
    """Load a standalone swap VAE (the reference swaps the SD VAE for
    `stabilityai/sd-vae-ft-mse`, diffusion.py:126-128).  `vae_dir` is a
    diffusers AutoencoderKL directory (`diffusion_pytorch_model.safetensors`
    at its root or under `vae/`)."""
    import jax

    for rel in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
                "vae/diffusion_pytorch_model.safetensors", "vae/diffusion_pytorch_model.bin"):
        path = os.path.join(vae_dir, rel)
        if os.path.exists(path):
            break
    else:
        raise FileNotFoundError(f"no VAE weights under {vae_dir}")
    converted = convert_vae(_load_state(path))
    _check_same_structure(init_vae_params, converted, "vae-override")
    return jax.tree.map(
        lambda a, b: jnp.asarray(b, a.dtype), init_vae_params, converted
    )


def load_sd_checkpoint(checkpoint_dir: str, init_params: dict, config) -> dict:
    """Replace random-init params with converted checkpoint weights,
    validating exact structural agreement."""
    import jax

    out = dict(init_params)
    cvt = {
        "unet": ("unet/diffusion_pytorch_model.safetensors", convert_unet),
        "vae": ("vae/diffusion_pytorch_model.safetensors", convert_vae),
        "text": ("text_encoder/model.safetensors", convert_clip_text),
    }
    for name, (rel, fn) in cvt.items():
        path = os.path.join(checkpoint_dir, rel)
        if not os.path.exists(path):
            alt = path.replace(".safetensors", ".bin")
            if os.path.exists(alt):
                import torch

                state = {k: v.numpy() for k, v in torch.load(alt, map_location="cpu").items()}
            else:
                raise FileNotFoundError(f"missing {path}")
        else:
            state = _load_safetensors(path)
        converted = fn(state)
        _check_same_structure(init_params[name], converted, name)
        dtype = config.param_dtype
        out[name] = jax.tree.map(
            lambda a, b: jnp.asarray(b, a.dtype), init_params[name], converted
        )
    return out
