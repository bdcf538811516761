"""ZoeDepth-NK: router parity vs vendored torch, forward sanity, converter."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geodiffuser_tpu.models import zoedepth_nk as znk

REF_LAYERS = "/root/reference/GeoDiffuser/zoedepth/models/layers"


def _load_ref_patch_transformer():
    path = os.path.join(REF_LAYERS, "patch_transformer.py")
    if not os.path.exists(path):
        pytest.skip("reference zoedepth layers not available")
    spec = importlib.util.spec_from_file_location("ref_pt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_patch_transformer_parity():
    """Flax router encoder vs the vendored torch PatchTransformerEncoder
    (patch_transformer.py:29-91), including the zero class token and the
    concatenated sin/cos positional encoding."""
    import torch

    mod = _load_ref_patch_transformer()
    torch.manual_seed(0)
    c_in, e_dim = 12, 16
    ref = mod.PatchTransformerEncoder(c_in, 1, e_dim, use_class_token=True).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"embedding_convPxP": {
        "kernel": sd["embedding_convPxP.weight"].transpose(2, 3, 1, 0),
        "bias": sd["embedding_convPxP.bias"],
    }}
    for i in range(4):
        t = f"transformer_encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "in_proj_weight": sd[f"{t}.self_attn.in_proj_weight"],
            "in_proj_bias": sd[f"{t}.self_attn.in_proj_bias"],
            "out_proj": {"kernel": sd[f"{t}.self_attn.out_proj.weight"].T,
                         "bias": sd[f"{t}.self_attn.out_proj.bias"]},
            "linear1": {"kernel": sd[f"{t}.linear1.weight"].T, "bias": sd[f"{t}.linear1.bias"]},
            "linear2": {"kernel": sd[f"{t}.linear2.weight"].T, "bias": sd[f"{t}.linear2.bias"]},
            "norm1": {"scale": sd[f"{t}.norm1.weight"], "bias": sd[f"{t}.norm1.bias"]},
            "norm2": {"scale": sd[f"{t}.norm2.weight"], "bias": sd[f"{t}.norm2.bias"]},
        }

    x = np.random.RandomState(1).rand(2, 5, 6, c_in).astype(np.float32)
    ours = znk.PatchTransformerEncoder(e_dim).apply(
        {"params": params}, jnp.asarray(x)
    )
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2)))  # (S, N, E)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(1, 0, 2), atol=2e-5, rtol=1e-4
    )


def test_rel_pos_index_invariants():
    idx = znk.gen_relative_position_index((4, 5))
    n = 20
    num_rel = (2 * 4 - 1) * (2 * 5 - 1) + 3
    assert idx.shape == (n + 1, n + 1)
    # cls relations use the 3 trailing table rows
    assert (idx[0, 1:] == num_rel - 3).all()
    assert (idx[1:, 0] == num_rel - 2).all()
    assert idx[0, 0] == num_rel - 1
    # symmetry of relative offsets: idx[i,j] pairs with idx[j,i]
    center = idx[1, 1]
    assert (np.diag(idx)[1:] == center).all()
    assert idx[1:, 1:].max() < num_rel - 3


def _invert_params_to_torch_sd(tree, cfg):
    """Build a synthetic torch-layout state dict from a flax init tree by
    inverting convert_zoedepth_nk's mapping rules (shape-exact)."""
    sd = {}

    def lin(key, p):
        sd[f"{key}.weight"] = np.asarray(p["kernel"]).T
        sd[f"{key}.bias"] = np.asarray(p["bias"])

    def conv(key, p):
        sd[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in p:
            sd[f"{key}.bias"] = np.asarray(p["bias"])

    def convT(key, p):
        sd[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{key}.bias"] = np.asarray(p["bias"])

    def ln(key, p):
        sd[f"{key}.weight"] = np.asarray(p["scale"])
        sd[f"{key}.bias"] = np.asarray(p["bias"])

    def net2(key, p):
        conv(f"{key}.0", p["net_0"])
        conv(f"{key}.2", p["net_2"])

    core = tree["core"]
    pre = "core.core.pretrained.model"
    conv(f"{pre}.patch_embed.proj", core["patch_embed_proj"])
    sd[f"{pre}.cls_token"] = np.asarray(core["cls_token"])
    for i in range(cfg.core.depth):
        b = f"{pre}.blocks.{i}"
        blk = core[f"blocks_{i}"]
        ln(f"{b}.norm1", blk["norm1"])
        ln(f"{b}.norm2", blk["norm2"])
        sd[f"{b}.gamma_1"] = np.asarray(blk["gamma_1"])
        sd[f"{b}.gamma_2"] = np.asarray(blk["gamma_2"])
        lin(f"{b}.mlp.fc1", blk["mlp_fc1"])
        lin(f"{b}.mlp.fc2", blk["mlp_fc2"])
        a = blk["attn"]
        sd[f"{b}.attn.qkv.weight"] = np.asarray(a["qkv_kernel"]).T
        sd[f"{b}.attn.q_bias"] = np.asarray(a["q_bias"])
        sd[f"{b}.attn.v_bias"] = np.asarray(a["v_bias"])
        sd[f"{b}.attn.relative_position_bias_table"] = np.asarray(
            a["relative_position_bias_table"])
        lin(f"{b}.attn.proj", a["proj"])
    pp = "core.core.pretrained"
    for i in range(4):
        ap = f"{pp}.act_postprocess{i+1}"
        lin(f"{ap}.0.project.0", core[f"readout_{i}"])
        conv(f"{ap}.3", core[f"projects_{i}"])
        if i in (0, 1):
            convT(f"{ap}.4", core[f"resize_layers_{i}"])
        elif i == 3:
            conv(f"{ap}.4", core[f"resize_layers_{i}"])
    sc = "core.core.scratch"
    for i in range(4):
        conv(f"{sc}.layer{i+1}_rn", core[f"layer{i+1}_rn"])
        fb = core[f"refinenet{i+1}"]
        for j in (1, 2):
            key = f"resConfUnit{j}"
            if key in fb:
                for k in (1, 2):
                    conv(f"{sc}.refinenet{i+1}.{key}.conv{k}", fb[key][f"conv{k}"])
        conv(f"{sc}.refinenet{i+1}.out_conv", fb["out_conv"])
    conv(f"{sc}.output_conv.0", core["head_conv1"])
    conv(f"{sc}.output_conv.2", core["head_conv2"])
    conv(f"{sc}.output_conv.4", core["head_conv3"])

    conv("conv2", tree["conv2"])
    pt = tree["patch_transformer"]
    conv("patch_transformer.embedding_convPxP", pt["embedding_convPxP"])
    for i in range(4):
        t = f"patch_transformer.transformer_encoder.layers.{i}"
        lay = pt[f"layers_{i}"]
        sd[f"{t}.self_attn.in_proj_weight"] = np.asarray(lay["in_proj_weight"])
        sd[f"{t}.self_attn.in_proj_bias"] = np.asarray(lay["in_proj_bias"])
        lin(f"{t}.self_attn.out_proj", lay["out_proj"])
        lin(f"{t}.linear1", lay["linear1"])
        lin(f"{t}.linear2", lay["linear2"])
        ln(f"{t}.norm1", lay["norm1"])
        ln(f"{t}.norm2", lay["norm2"])
    lin("mlp_classifier.0", tree["mlp_classifier_0"])
    lin("mlp_classifier.2", tree["mlp_classifier_2"])
    net2("seed_projector._net", tree["seed_projector"])
    for i in range(4):
        net2(f"projectors.{i}._net", tree[f"projectors_{i}"])
    for conf in cfg.bin_conf:
        nm = conf.name
        net2(f"seed_bin_regressors.{nm}._net", tree[f"seed_bin_regressors_{nm}"])
        for i in range(4):
            net2(f"attractors.{nm}.{i}._net", tree[f"attractors_{nm}_{i}"])
        conv(f"conditional_log_binomial.{nm}.mlp.0",
             tree[f"conditional_log_binomial_{nm}"]["mlp_0"])
        conv(f"conditional_log_binomial.{nm}.mlp.2",
             tree[f"conditional_log_binomial_{nm}"]["mlp_2"])
    return sd


def test_nk_forward_and_converter_roundtrip():
    """Tiny NK end-to-end: init -> invert to torch layout -> convert back ->
    identical tree; forward produces finite metric depth; kitti head flips
    the output when the router is forced."""
    cfg = znk.ZoeDepthNKConfig.tiny()
    model = znk.ZoeDepthNK(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    sd = _invert_params_to_torch_sd(params["params"], cfg)
    restored = znk.convert_zoedepth_nk(sd, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )

    depth, logits = model.apply(restored, x, return_domain_logits=True)
    assert depth.shape == (1, 32, 32)
    assert np.isfinite(np.asarray(depth)).all()
    assert (np.asarray(depth) >= 0).all()
    assert logits.shape == (1, 2)


def test_nk_window_resize_path():
    """Non-training window: the rel-pos table is resized, forward stays
    finite (the 384-trained table serves a 512-wide inference window)."""
    cfg = znk.ZoeDepthNKConfig.tiny()
    model = znk.ZoeDepthNK(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)  # window (8,12) != (8,8)
    params = model.init(jax.random.PRNGKey(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (1, 32, 48)
    assert np.isfinite(np.asarray(depth)).all()
