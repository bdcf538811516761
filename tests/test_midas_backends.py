"""dpt_hybrid + midas_v21 depth backends: torch-parity oracles for the new
primitives (StdConv/pre-act bottleneck, ResNeXt bottleneck + frozen BN),
tiny-config forwards, converter structural round-trips, registry coverage.

Reference: GeoDiffuser/dpt/models.py (DPTDepthModel backbone vitb_rn50_384),
midas_repo/midas_net.py (MidasNet over resnext101_wsl),
depth_predictor.py:105-274 (the five model_type options)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from geodiffuser_tpu.models import midas_dpt as md


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def conv_w(p):
    return t(p["kernel"]).permute(3, 2, 0, 1)


@pytest.mark.fast
def test_std_conv_torch_parity():
    """timm StdConv2d: per-out-channel weight standardization, eps 1e-6."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    mod = md.StdConv(6, (3, 3), padding=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    w = conv_w(params["params"])
    w = (w - w.mean(dim=[1, 2, 3], keepdim=True)) / torch.sqrt(
        w.var(dim=[1, 2, 3], unbiased=False, keepdim=True) + 1e-6
    )
    theirs = F.conv2d(t(x).permute(0, 3, 1, 2), w, padding=1).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=3e-5, rtol=1e-4)


@pytest.mark.fast
def test_preact_bottleneck_torch_parity():
    """timm ResNetV2 PreActBottleneck with stride-2 downsample."""
    rng = np.random.RandomState(1)
    cin, cout = 32, 64
    x = rng.randn(1, 8, 8, cin).astype(np.float32)
    mod = md.PreActBottleneck(cout, stride=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    mid = cout // 4

    def stdc(h, q, stride=1, padding=0):
        w = conv_w(q)
        w = (w - w.mean(dim=[1, 2, 3], keepdim=True)) / torch.sqrt(
            w.var(dim=[1, 2, 3], unbiased=False, keepdim=True) + 1e-6
        )
        return F.conv2d(h, w, stride=stride, padding=padding)

    gn = lambda h, q, g: F.group_norm(h, g, t(q["scale"]), t(q["bias"]), 1e-5)
    xt = t(x).permute(0, 3, 1, 2)
    pre = F.relu(gn(xt, p["norm1"], 32))
    shortcut = stdc(pre, p["downsample_conv"], stride=2)
    h = stdc(pre, p["conv1"])
    h = F.relu(gn(h, p["norm2"], np.gcd(32, mid)))
    h = stdc(h, p["conv2"], stride=2, padding=1)
    h = F.relu(gn(h, p["norm3"], np.gcd(32, mid)))
    h = stdc(h, p["conv3"])
    theirs = (shortcut + h).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


@pytest.mark.fast
def test_resnext_bottleneck_torch_parity():
    """torchvision Bottleneck(groups=32, width_per_group=8) at eval time
    (frozen BatchNorm)."""
    rng = np.random.RandomState(2)
    planes = 64            # width = 256, out = 256
    cin = 128
    x = rng.randn(1, 8, 8, cin).astype(np.float32)
    mod = md.ResNeXtBottleneck(planes, stride=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree.map(lambda a: np.asarray(a), params["params"])
    # non-trivial BN statistics
    for name in ("bn1", "bn2", "bn3", "downsample_bn"):
        n = p[name]["mean"].shape[0]
        p[name]["mean"] = rng.randn(n).astype(np.float32) * 0.1
        p[name]["var"] = (1.0 + rng.rand(n)).astype(np.float32)
        p[name]["scale"] = (0.5 + rng.rand(n)).astype(np.float32)
        p[name]["bias"] = rng.randn(n).astype(np.float32) * 0.1
    ours = np.asarray(mod.apply({"params": jax.tree.map(jnp.asarray, p)}, jnp.asarray(x)))

    def bn(h, q):
        return F.batch_norm(
            h, t(q["mean"]), t(q["var"]), t(q["scale"]), t(q["bias"]),
            training=False, eps=1e-5,
        )

    width = int(planes * 8 / 64) * 32
    xt = t(x).permute(0, 3, 1, 2)
    h = F.relu(bn(F.conv2d(xt, conv_w(p["conv1"])), p["bn1"]))
    h = F.relu(bn(F.conv2d(h, conv_w(p["conv2"]), stride=2, padding=1, groups=32), p["bn2"]))
    h = bn(F.conv2d(h, conv_w(p["conv3"])), p["bn3"])
    sc = bn(F.conv2d(xt, conv_w(p["downsample_conv"]), stride=2), p["downsample_bn"])
    theirs = F.relu(sc + h).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


# full tier: ~77 s of 5-backend tiny forwards (fast-tier budget, r5 #7)
def test_tiny_forwards():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    hyb = md.DPTHybrid(md.DPTHybridConfig.tiny())
    out = hyb.apply(hyb.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 64, 64) and bool(jnp.isfinite(out).all())

    v21 = md.MidasNetV21(md.MidasV21Config.tiny())
    out2 = v21.apply(v21.init(jax.random.PRNGKey(0), x), x)
    assert out2.shape == (1, 64, 64) and bool(jnp.isfinite(out2).all())


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _synthetic_dpt_hybrid_state(params, cfg):
    """Build the torch checkpoint layout from flax init params (inverse of
    the converter's transposes) — validates every key name + axis rule."""
    p = params["params"]
    sd = {}
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)
    bb = "pretrained.model.patch_embed.backbone"
    sd[f"{bb}.stem.conv.weight"] = c4(p["stem_conv"]["kernel"])
    sd[f"{bb}.norm.weight"] = np.asarray(p["stem_norm"]["scale"])
    sd[f"{bb}.norm.bias"] = np.asarray(p["stem_norm"]["bias"])
    sd["pretrained.model.patch_embed.proj.weight"] = c4(p["patch_embed_proj"]["kernel"])
    sd["pretrained.model.patch_embed.proj.bias"] = np.asarray(p["patch_embed_proj"]["bias"])
    sd["pretrained.model.cls_token"] = np.asarray(p["cls_token"])
    sd["pretrained.model.pos_embed"] = np.asarray(p["pos_embed"])
    for s, n_blocks in enumerate(cfg.stage_blocks):
        for j in range(n_blocks):
            blk = p[f"stages_{s}_blocks_{j}"]
            pt = f"{bb}.stages.{s}.blocks.{j}"
            for nrm in ("norm1", "norm2", "norm3"):
                sd[f"{pt}.{nrm}.weight"] = np.asarray(blk[nrm]["scale"])
                sd[f"{pt}.{nrm}.bias"] = np.asarray(blk[nrm]["bias"])
            for cv in ("conv1", "conv2", "conv3"):
                sd[f"{pt}.{cv}.weight"] = c4(blk[cv]["kernel"])
            if "downsample_conv" in blk:
                sd[f"{pt}.downsample.conv.weight"] = c4(blk["downsample_conv"]["kernel"])
    for i in range(cfg.depth):
        blk = p[f"blocks_{i}"]
        pt = f"pretrained.model.blocks.{i}"
        for nrm in ("norm1", "norm2"):
            sd[f"{pt}.{nrm}.weight"] = np.asarray(blk[nrm]["scale"])
            sd[f"{pt}.{nrm}.bias"] = np.asarray(blk[nrm]["bias"])
        for ours, theirs in (("attn_qkv", "attn.qkv"), ("attn_proj", "attn.proj"),
                             ("mlp_fc1", "mlp.fc1"), ("mlp_fc2", "mlp.fc2")):
            sd[f"{pt}.{theirs}.weight"] = np.asarray(blk[ours]["kernel"]).T
            sd[f"{pt}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])
    for tap, post in ((2, "act_postprocess3"), (3, "act_postprocess4")):
        sd[f"pretrained.{post}.0.project.0.weight"] = np.asarray(p[f"readout_{tap}"]["kernel"]).T
        sd[f"pretrained.{post}.0.project.0.bias"] = np.asarray(p[f"readout_{tap}"]["bias"])
        sd[f"pretrained.{post}.3.weight"] = c4(p[f"projects_{tap}"]["kernel"])
        sd[f"pretrained.{post}.3.bias"] = np.asarray(p[f"projects_{tap}"]["bias"])
    sd["pretrained.act_postprocess4.4.weight"] = c4(p["resize_layers_3"]["kernel"])
    sd["pretrained.act_postprocess4.4.bias"] = np.asarray(p["resize_layers_3"]["bias"])
    _add_scratch(sd, p, out_conv=True)
    return sd


def _add_scratch(sd, p, out_conv):
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)
    for i in range(1, 5):
        sd[f"scratch.layer{i}_rn.weight"] = c4(p[f"layer{i}_rn"]["kernel"])
    for k in range(1, 5):
        ref = p[f"refinenet{k}"]
        for unit in ("resConfUnit1", "resConfUnit2"):
            if unit not in ref:
                continue
            for cv in ("conv1", "conv2"):
                sd[f"scratch.refinenet{k}.{unit}.{cv}.weight"] = c4(ref[unit][cv]["kernel"])
                sd[f"scratch.refinenet{k}.{unit}.{cv}.bias"] = np.asarray(ref[unit][cv]["bias"])
        if out_conv:
            sd[f"scratch.refinenet{k}.out_conv.weight"] = c4(ref["out_conv"]["kernel"])
            sd[f"scratch.refinenet{k}.out_conv.bias"] = np.asarray(ref["out_conv"]["bias"])
    for name, idx in (("head_conv1", 0), ("head_conv2", 2), ("head_conv3", 4)):
        sd[f"scratch.output_conv.{idx}.weight"] = c4(p[name]["kernel"])
        sd[f"scratch.output_conv.{idx}.bias"] = np.asarray(p[name]["bias"])


def test_convert_dpt_large_roundtrip():
    """convert_dpt_large: init -> invert to the released checkpoint layout
    (incl. the unconsumed norm/head/refinenet4.resConfUnit1 extras) ->
    convert back -> identical tree + finite forward."""
    cfg = md.DPTConfig.tiny()
    model = md.DPTLarge(cfg)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x)
    p = params["params"]
    sd = {}
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)
    pm = "pretrained.model"
    sd[f"{pm}.patch_embed.proj.weight"] = c4(p["patch_embed_proj"]["kernel"])
    sd[f"{pm}.patch_embed.proj.bias"] = np.asarray(p["patch_embed_proj"]["bias"])
    sd[f"{pm}.cls_token"] = np.asarray(p["cls_token"])
    sd[f"{pm}.pos_embed"] = np.asarray(p["pos_embed"])
    for i in range(cfg.depth):
        blk = p[f"blocks_{i}"]
        pt = f"{pm}.blocks.{i}"
        for nrm in ("norm1", "norm2"):
            sd[f"{pt}.{nrm}.weight"] = np.asarray(blk[nrm]["scale"])
            sd[f"{pt}.{nrm}.bias"] = np.asarray(blk[nrm]["bias"])
        for ours_k, theirs in (("attn_qkv", "attn.qkv"), ("attn_proj", "attn.proj"),
                               ("mlp_fc1", "mlp.fc1"), ("mlp_fc2", "mlp.fc2")):
            sd[f"{pt}.{theirs}.weight"] = np.asarray(blk[ours_k]["kernel"]).T
            sd[f"{pt}.{theirs}.bias"] = np.asarray(blk[ours_k]["bias"])
    for tap in range(4):
        post = f"pretrained.act_postprocess{tap + 1}"
        sd[f"{post}.0.project.0.weight"] = np.asarray(p[f"readout_{tap}"]["kernel"]).T
        sd[f"{post}.0.project.0.bias"] = np.asarray(p[f"readout_{tap}"]["bias"])
        sd[f"{post}.3.weight"] = c4(p[f"projects_{tap}"]["kernel"])
        sd[f"{post}.3.bias"] = np.asarray(p[f"projects_{tap}"]["bias"])
    for tap in (0, 1):
        sd[f"pretrained.act_postprocess{tap + 1}.4.weight"] = np.asarray(
            p[f"resize_layers_{tap}"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"pretrained.act_postprocess{tap + 1}.4.bias"] = np.asarray(
            p[f"resize_layers_{tap}"]["bias"])
    sd["pretrained.act_postprocess4.4.weight"] = c4(p["resize_layers_3"]["kernel"])
    sd["pretrained.act_postprocess4.4.bias"] = np.asarray(p["resize_layers_3"]["bias"])
    _add_scratch(sd, p, out_conv=True)
    # released-checkpoint extras the converter must tolerate
    d = cfg.embed_dim
    sd[f"{pm}.norm.weight"] = np.ones(d, np.float32)
    sd[f"{pm}.norm.bias"] = np.zeros(d, np.float32)
    sd[f"{pm}.head.weight"] = np.zeros((1000, d), np.float32)
    sd[f"{pm}.head.bias"] = np.zeros(1000, np.float32)
    f = cfg.features
    for k4 in ("conv1", "conv2"):
        sd[f"scratch.refinenet4.resConfUnit1.{k4}.weight"] = np.zeros((f, f, 3, 3), np.float32)
        sd[f"scratch.refinenet4.resConfUnit1.{k4}.bias"] = np.zeros(f, np.float32)

    conv = md.convert_dpt_large(sd, cfg)
    ours, theirs = _flatten(params["params"]), _flatten(conv["params"])
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-6, err_msg=k)
    out = model.apply(conv, x)
    assert bool(jnp.isfinite(out).all())


def test_convert_dpt_hybrid_roundtrip():
    cfg = md.DPTHybridConfig.tiny()
    model = md.DPTHybrid(cfg)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    sd = _synthetic_dpt_hybrid_state(params, cfg)
    conv = md.convert_dpt_hybrid(sd, cfg)

    ours, theirs = _flatten(params["params"]), _flatten(conv["params"])
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-6, err_msg=k)
    out = model.apply(conv, x)
    assert bool(jnp.isfinite(out).all())


def test_convert_midas_v21_roundtrip():
    cfg = md.MidasV21Config.tiny()
    model = md.MidasNetV21(cfg)
    x = jnp.asarray(np.random.RandomState(4).rand(1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x)
    p = params["params"]
    sd = {}
    c4 = lambda a: np.asarray(a).transpose(3, 2, 0, 1)

    def add_bn(prefix, q):
        sd[prefix + ".weight"] = np.asarray(q["scale"])
        sd[prefix + ".bias"] = np.asarray(q["bias"])
        sd[prefix + ".running_mean"] = np.asarray(q["mean"])
        sd[prefix + ".running_var"] = np.asarray(q["var"])

    sd["pretrained.layer1.0.weight"] = c4(p["conv1"]["kernel"])
    add_bn("pretrained.layer1.1", p["bn1"])
    for s, n_blocks in enumerate(cfg.layers):
        for j in range(n_blocks):
            blk = p[f"layer{s + 1}_{j}"]
            pt = f"pretrained.layer1.4.{j}" if s == 0 else f"pretrained.layer{s + 1}.{j}"
            for c in (1, 2, 3):
                sd[f"{pt}.conv{c}.weight"] = c4(blk[f"conv{c}"]["kernel"])
                add_bn(f"{pt}.bn{c}", blk[f"bn{c}"])
            if "downsample_conv" in blk:
                sd[f"{pt}.downsample.0.weight"] = c4(blk["downsample_conv"]["kernel"])
                add_bn(f"{pt}.downsample.1", blk["downsample_bn"])
    _add_scratch(sd, p, out_conv=False)
    conv = md.convert_midas_v21(sd, cfg)

    ours, theirs = _flatten(p), _flatten(conv["params"])
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-6, err_msg=k)
    out = model.apply(conv, x)
    assert bool(jnp.isfinite(out).all())


def test_depth_registry_covers_reference_options():
    """depth_predictor.py:105-274 exposes dpt_large | dpt_hybrid |
    dpt_hybrid_kitti | dpt_hybrid_nyu | midas_v21 (plus zoedepth,
    depth_anything, constant)."""
    from geodiffuser_tpu.utils import depth as du

    img = (np.random.RandomState(5).rand(32, 32, 3) * 255).astype(np.uint8)
    pred = du.get_depth_predictor("midas_v21", config=md.MidasV21Config.tiny(), size=64)
    d = pred(img)
    assert d.shape == (32, 32) and np.isfinite(d).all()

    pred = du.get_depth_predictor(
        "dpt_hybrid", config=md.DPTHybridConfig.tiny(), size=64
    )
    d = pred(img)
    assert d.shape == (32, 32) and np.isfinite(d).all()

    # metric variants: inverted output must be positive metric depth
    cfg_kitti = md.DPTHybridConfig.tiny()
    cfg_kitti = type(cfg_kitti)(**{**cfg_kitti.__dict__, "scale": 0.00006016,
                                   "shift": 0.00579, "invert": True})
    pred = du.get_depth_predictor("dpt_hybrid_kitti", config=cfg_kitti, size=64)
    d = pred(img)
    assert (d > 0).all()
