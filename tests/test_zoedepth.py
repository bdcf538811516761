"""ZoeDepth metric-bins head parity vs the vendored torch layers.

The vendored layer files (zoedepth/models/layers/*.py) are pure torch and
loaded directly by path (the full ZoeDepth model needs a timm BEiT backbone
that is not importable here; see models/zoedepth.py scope notes).
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_LAYERS = "/root/reference/GeoDiffuser/zoedepth/models/layers"


def _load(name):
    path = os.path.join(REF_LAYERS, name + ".py")
    if not os.path.exists(path):
        pytest.skip("reference zoedepth layers not available")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _conv1x1_params(seq):
    """torch nn.Sequential(conv1x1, act, conv1x1, act?) -> our flax tree."""
    out = {}
    idx = [i for i, m in enumerate(seq) if hasattr(m, "weight")]
    for j, i in enumerate(idx):
        w = seq[i].weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"net_{i}"] = {"kernel": w, "bias": seq[i].bias.detach().numpy()}
    return out


def test_seed_bin_regressor_parity():
    import torch

    lb = _load("localbins_layers")
    torch.manual_seed(0)
    ref = lb.SeedBinRegressorUnnormed(12, n_bins=8, mlp_dim=16).eval()

    from geodiffuser_tpu.models.zoedepth import SeedBinRegressorUnnormed

    ours = SeedBinRegressorUnnormed(n_bins=8, mlp_dim=16)
    x = np.random.RandomState(1).rand(1, 5, 6, 12).astype(np.float32)
    params = {"params": _conv1x1_params(ref._net)}
    b_ours, _ = ours.apply(params, jnp.asarray(x))
    with torch.no_grad():
        b_ref, _ = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(b_ours), b_ref.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_attractor_layer_parity():
    import torch

    at = _load("attractor")
    torch.manual_seed(0)
    ref = at.AttractorLayerUnnormed(
        10, n_bins=8, n_attractors=4, mlp_dim=16, alpha=1000, gamma=2,
        kind="mean", attractor_type="inv",
    ).eval()

    from geodiffuser_tpu.models.zoedepth import AttractorLayerUnnormed

    ours = AttractorLayerUnnormed(
        n_bins=8, n_attractors=4, mlp_dim=16, alpha=1000, gamma=2,
        kind="mean", attractor_type="inv",
    )
    rng = np.random.RandomState(2)
    x = rng.rand(1, 6, 6, 10).astype(np.float32)
    b_prev = rng.rand(1, 3, 3, 8).astype(np.float32)
    prev_emb = rng.rand(1, 3, 3, 10).astype(np.float32)
    params = {"params": _conv1x1_params(ref._net)}
    b_ours, _ = ours.apply(
        params, jnp.asarray(x), jnp.asarray(b_prev), jnp.asarray(prev_emb)
    )
    with torch.no_grad():
        b_ref, _ = ref(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(b_prev.transpose(0, 3, 1, 2)),
            torch.tensor(prev_emb.transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        np.asarray(b_ours), b_ref.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_conditional_log_binomial_parity():
    import torch

    dl = _load("dist_layers")
    torch.manual_seed(0)
    ref = dl.ConditionalLogBinomial(
        6, 10, n_classes=8, min_temp=0.0212, max_temp=50.0
    ).eval()

    from geodiffuser_tpu.models.zoedepth import ConditionalLogBinomial

    ours = ConditionalLogBinomial(n_classes=8, min_temp=0.0212, max_temp=50.0)
    rng = np.random.RandomState(3)
    x = rng.rand(1, 4, 4, 6).astype(np.float32)
    cond = rng.rand(1, 4, 4, 10).astype(np.float32)
    tree = {}
    idx = [i for i, m in enumerate(ref.mlp) if hasattr(m, "weight")]
    for i in idx:
        w = ref.mlp[i].weight.detach().numpy().transpose(2, 3, 1, 0)
        tree[f"mlp_{i}"] = {"kernel": w, "bias": ref.mlp[i].bias.detach().numpy()}
    probs_ours = ours.apply({"params": tree}, jnp.asarray(x), jnp.asarray(cond))
    with torch.no_grad():
        probs_ref = ref(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(cond.transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        np.asarray(probs_ours), probs_ref.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_zoedepth_full_model_runs():
    from geodiffuser_tpu.models.zoedepth import ZoeDepth, ZoeDepthConfig

    m = ZoeDepth(ZoeDepthConfig.tiny())
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    p = m.init(jax.random.PRNGKey(0), x)
    d = m.apply(p, x)
    assert d.shape == (1, 64, 64)
    assert bool(jnp.isfinite(d).all())
    cfg = ZoeDepthConfig.tiny()
    assert float(d.min()) >= 0.0  # metric depths are expectations over bins


def test_zoedepth_predictor_jitted_finite():
    """Regression: an in-graph constant-folded log-binomial produced NaN in
    the K-1 bin column under jit (host-side constants now)."""
    from geodiffuser_tpu.models.zoedepth import ZoeDepthConfig
    from geodiffuser_tpu.utils.depth import get_depth_predictor

    pred = get_depth_predictor("zoedepth", config=ZoeDepthConfig.tiny(), size=64)
    d = pred((np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8))
    assert d.shape == (50, 70)
    assert np.isfinite(d).all()
