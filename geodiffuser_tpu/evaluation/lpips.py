"""LPIPS (AlexNet backbone) in flax.linen.

The reference computes LPIPS(net='alex') at 224^2 (image_fidelity.py:183-206)
via the `lpips` package.  Native implementation: AlexNet conv features at 5
taps, unit-normalize per channel, 1x1 linear heads, spatial mean, sum over
taps.  Weight conversion from the standard torchvision AlexNet state_dict +
lpips linear-head checkpoint; weight-gated in this offline environment.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by LPIPS' scaling layer
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features, taps after each ReLU stage."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2, name="conv0", **kw)(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv3", **kw)(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv6", **kw)(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv8", **kw)(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv10", **kw)(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a, b: (B, H, W, 3) in [-1, 1].  Returns (B,) distances."""
        a = (a - LPIPS_SHIFT) / LPIPS_SCALE
        b = (b - LPIPS_SHIFT) / LPIPS_SCALE
        net = AlexNetFeatures(name="net", dtype=self.dtype)
        fa = net(a)
        fb = net(b)
        total = jnp.zeros((a.shape[0],), jnp.float32)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}", dtype=self.dtype)(d)
            total = total + jnp.mean(w[..., 0], axis=(1, 2))
        return total


def convert_lpips(alex_state: Dict[str, np.ndarray], lin_state: Dict[str, np.ndarray]) -> dict:
    """torchvision alexnet.features + lpips linear heads -> our tree.

    alex_state keys: features.{0,3,6,8,10}.{weight,bias}
    lin_state keys:  lin{0-4}.model.1.weight
    """
    from geodiffuser_tpu.models.weights import _assign, _conv

    tree: dict = {"net": {}}
    for idx in (0, 3, 6, 8, 10):
        _assign(tree, ("net", f"conv{idx}", "kernel"), _conv(alex_state[f"features.{idx}.weight"]))
        _assign(tree, ("net", f"conv{idx}", "bias"), alex_state[f"features.{idx}.bias"])
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin_state:
            key = f"lins.{i}.model.1.weight"
        _assign(tree, (f"lin{i}", "kernel"), _conv(lin_state[key]))
    return {"params": tree}


class LPIPSMetric:
    """Callable LPIPS with weight gating (evaluation/metrics.py uses this)."""

    def __init__(self, params=None, alex_path: Optional[str] = None,
                 lin_path: Optional[str] = None):
        self.model = LPIPS()
        if params is None:
            if alex_path and lin_path:
                import torch

                alex = {k: v.numpy() for k, v in torch.load(alex_path, map_location="cpu").items()}
                lin = {k: v.numpy() for k, v in torch.load(lin_path, map_location="cpu").items()}
                params = convert_lpips(alex, lin)
            else:
                raise RuntimeError(
                    "LPIPS needs pretrained AlexNet + linear-head weights; pass "
                    "alex_path/lin_path or params (offline build has none)."
                )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, a: np.ndarray, b: np.ndarray, size: int = 224) -> float:
        from geodiffuser_tpu.ops import image as image_ops

        def prep(x):
            x = np.asarray(x, np.float32)
            if x.max() > 1.5:
                x = x / 255.0
            x = image_ops.resize_bilinear_hwc(jnp.asarray(x), size, size)
            return (x * 2.0 - 1.0)[None]

        return float(self._apply(self.params, prep(a), prep(b))[0])
