"""Depth-Anything parity test against the vendored torch reference.

The reference repo at /root/reference vendors the original torch
implementation (depth_anything/dpt.py + DINOv2 torchhub).  We instantiate it
random-init, convert the state_dict, and compare outputs — a true
architecture + converter validation without copying any code.  Skips
cleanly when the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def torch_model():
    if not os.path.isdir(os.path.join(REF, "GeoDiffuser", "depth_anything")):
        pytest.skip("reference tree not available")
    import torch

    cwd = os.getcwd()
    os.chdir(REF)
    sys.path.insert(0, REF)
    try:
        from GeoDiffuser.depth_anything.dpt import DPT_DINOv2

        torch.manual_seed(0)
        m = DPT_DINOv2(
            encoder="vits", features=64, out_channels=[48, 96, 192, 384], localhub=True
        ).eval()
    finally:
        os.chdir(cwd)
    return m


def test_depth_anything_parity_vits(torch_model):
    import torch

    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import weights as W
    from geodiffuser_tpu.models.depth_anything import DepthAnything, DepthAnythingConfig

    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    cfg = DepthAnythingConfig(encoder="vits", features=64, out_channels=(48, 96, 192, 384))
    ours = DepthAnything(cfg)
    # Native pretraining grid (518 -> 37x37): the standard Depth-Anything
    # preprocessing resizes inputs here (depth_predictor.py:333-341), so this
    # is the deployed path.  Non-native grids interpolate position embeddings
    # with jax cubic (vs torch bicubic-no-antialias) — a documented, small
    # divergence off the standard path.
    size = 14 * 37
    rng = np.random.RandomState(1)
    x = rng.rand(1, size, size, 3).astype(np.float32)

    params0 = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))))
    converted = W.convert_depth_anything(state)
    W._check_same_structure(params0, converted, "depth_anything")

    out_ours = np.asarray(ours.apply(converted, jnp.asarray(x)))
    with torch.no_grad():
        out_ref = torch_model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    denom = np.abs(out_ref).max() + 1e-6
    rel = np.abs(out_ours - out_ref).max() / denom
    assert rel < 2e-3, rel
