"""Depth prediction wrappers and post-processing rules.

Rebuilds depth_predictor.py's wrapper layer (the models themselves are
native JAX: models/depth_anything.py) and ui_utils' depth conditioning
helpers.  All post rules are tiny pure functions:

  * relative->edit depth: d = d.max() - d, then push back
    d += d.max() * translate_factor (depth_predictor.py:364-369; default
    translate_factor slider 0.7 in the UI, 0.1 in the wrapper)
  * constant depth 0.5 for 2D edits / the inpaint tab (depth_predictor.py:321)
  * median/gaussian depth correction (depth_predictor.py:41-50)
  * disparity->depth, depth scaling, background NN fill (ui_utils.py:383-401,
    729-815)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.ops import image as image_ops

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def constant_depth(height: int, width: int) -> np.ndarray:
    """0.5 everywhere (get_constant_depth, depth_predictor.py:321-322); the
    transform-field builder special-cases this (vis_utils.py:410-411)."""
    return np.full((height, width), 0.5, np.float32)


def postprocess_relative_depth(depth: np.ndarray, translate_factor: float = 0.1) -> np.ndarray:
    """Invert (model emits larger=closer) and push the scene away from the
    camera to reduce rotation smearing (depth_predictor.py:364-369)."""
    d = np.asarray(depth, np.float32)
    d = d.max() - d
    return d + d.max() * translate_factor


def depth_corrector(depth: np.ndarray, filter_type: str = "gaussian") -> np.ndarray:
    """Median/Gaussian cleanup (depth_predictor.py:41-50)."""
    from scipy.ndimage import gaussian_filter, median_filter

    if filter_type == "median":
        return median_filter(np.asarray(depth), size=3)
    return gaussian_filter(np.asarray(depth), sigma=0.75)


def disparity_to_depth(disparity: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """(ui_utils.py:812-815)"""
    return 1.0 / (np.asarray(disparity, np.float64) + eps)


def depth_scaler(depth: np.ndarray) -> np.ndarray:
    """Normalize to [0, 1] (ui_utils.py:729-740)."""
    d = np.asarray(depth, np.float64)
    return ((d - d.min()) / (d.max() - d.min() + 1e-8)).astype(np.float32)


def fill_background_depth(depth: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Fill non-mask pixels with the nearest masked pixel's depth
    (fill_background_depth, vis_utils.py:383-401; KDTree NN fill)."""
    from scipy.spatial import cKDTree

    d = np.asarray(depth).copy()
    good = np.asarray(mask) >= 0.5
    if good.all() or not good.any():
        return d
    ys, xs = np.mgrid[0 : d.shape[0], 0 : d.shape[1]]
    good_pts = np.stack([ys[good], xs[good]], -1)
    bad_pts = np.stack([ys[~good], xs[~good]], -1)
    _, idx = cKDTree(good_pts).query(bad_pts)
    d[~good] = d[good][idx]
    return d


def depth_smoothing_tv(depth: jnp.ndarray, steps: int = 10, lr: float = 0.1) -> jnp.ndarray:
    """Differentiable TV smoothing of a depth map by gradient descent
    (depth_smoothing, ui_utils.py:769-809) — jitted scan."""

    def tv(d):
        dh = jnp.abs(d[1:, :] - d[:-1, :]).mean()
        dw = jnp.abs(d[:, 1:] - d[:, :-1]).mean()
        return dh + dw

    grad = jax.grad(tv)

    def body(d, _):
        return d - lr * grad(d), None

    out, _ = jax.lax.scan(body, jnp.asarray(depth, jnp.float32), None, length=steps)
    return out


def bilateral_depth_filter(
    depth: np.ndarray, image: np.ndarray, sigma_space: float = 3.0, sigma_color: float = 0.1,
    radius: int = 5,
) -> np.ndarray:
    """Joint bilateral filter guided by the RGB image
    (depth_bilateral_filter, ui_utils.py:184-206)."""
    d = jnp.asarray(depth, jnp.float32)
    g = jnp.asarray(image, jnp.float32)
    if g.ndim == 3:
        g = g.mean(-1)
    if g.max() > 1.5:
        g = g / 255.0
    h, w = d.shape
    out_num = jnp.zeros_like(d)
    out_den = jnp.zeros_like(d)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sd = jnp.roll(jnp.roll(d, dy, 0), dx, 1)
            sg = jnp.roll(jnp.roll(g, dy, 0), dx, 1)
            ws = np.exp(-(dy * dy + dx * dx) / (2 * sigma_space ** 2))
            wc = jnp.exp(-((sg - g) ** 2) / (2 * sigma_color ** 2))
            wgt = ws * wc
            out_num = out_num + wgt * sd
            out_den = out_den + wgt
    return np.asarray(out_num / (out_den + 1e-8))


class DepthAnythingPredictor:
    """Batched JAX Depth-Anything inference with the reference's
    preprocessing (resize lower-bound to 518 multiple-of-14, ImageNet
    normalization; depth_predictor.py:331-341) and postprocessing."""

    def __init__(self, params=None, encoder: str = "vitl", checkpoint_path: Optional[str] = None):
        import jax.numpy as jnp  # noqa: F811

        from geodiffuser_tpu.models.depth_anything import DepthAnything, DepthAnythingConfig

        per_encoder = {
            "vitl": DepthAnythingConfig(encoder="vitl"),
            "vitb": DepthAnythingConfig(encoder="vitb", out_channels=(96, 192, 384, 768), features=128),
            "vits": DepthAnythingConfig(encoder="vits", out_channels=(48, 96, 192, 384), features=64),
            "tiny": DepthAnythingConfig.tiny(),
        }
        self.cfg = per_encoder[encoder]
        self.model = DepthAnything(self.cfg)
        if params is None:
            if checkpoint_path:
                from geodiffuser_tpu.models import weights as weights_lib

                state = weights_lib._load_safetensors(checkpoint_path)
                params = weights_lib.convert_depth_anything(state)
            else:
                params = self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 14 * 4, 14 * 4, 3))
                )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def _preprocess_size(self, h: int, w: int, lower_bound: int = 518, multiple: int = 14):
        scale = max(lower_bound / h, lower_bound / w)
        nh = int(round(h * scale / multiple) * multiple)
        nw = int(round(w * scale / multiple) * multiple)
        return max(nh, multiple), max(nw, multiple)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.1) -> np.ndarray:
        """(H, W, 3) uint8/float -> (H, W) edit-ready depth."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        patch = self.cfg.dino().patch_size
        lower = 518 if patch == 14 else 16 * patch
        nh, nw = self._preprocess_size(h, w, lower_bound=lower, multiple=patch)
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), nh, nw)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        d = self._apply(self.params, x[None])[0]
        d = image_ops.resize_bilinear(d, h, w)
        return postprocess_relative_depth(np.asarray(d), translate_factor)


class MidasDPTPredictor:
    """dpt_large path of get_monocular_depth (depth_predictor.py:105-274):
    384-resize + ImageNet normalization, inverse-depth output, then the same
    invert/push-back postprocess."""

    def __init__(self, params=None, config=None, size: int = 384):
        from geodiffuser_tpu.models.midas_dpt import DPTConfig, DPTLarge

        self.cfg = config or DPTConfig()
        self.size = size if config is None else 16 * self.cfg.pos_grid // 2
        self.model = DPTLarge(self.cfg)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, self.cfg.patch_size * 4, self.cfg.patch_size * 4, 3)),
            )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.0) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        p = self.cfg.patch_size
        s = max(self.size // p, 2) * p
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), s, s)
        # DPT models normalize with mean=std=0.5 (depth_predictor.py:128),
        # NOT the ImageNet stats (those are midas_v21's, :173-175)
        x = (x - 0.5) / 0.5
        d = self._apply(self.params, x[None])[0]
        d = image_ops.resize_bilinear(d, h, w)
        # MiDaS emits inverse depth (larger = closer); same postprocess
        return postprocess_relative_depth(np.asarray(d), translate_factor)


class DPTHybridPredictor:
    """dpt_hybrid / dpt_hybrid_kitti / dpt_hybrid_nyu paths of
    get_monocular_depth (depth_predictor.py:130-168): 0.5/0.5 normalization,
    ViT-B over a ResNetV2-50 stem; the kitti/nyu variants invert to metric
    depth with their published scale/shift and multiply by 256/1000."""

    VARIANTS = {
        "dpt_hybrid": dict(scale=1.0, shift=0.0, invert=False, out_scale=1.0),
        # depth_predictor.py:141-147 / :154-160, output scaling :244-248
        "dpt_hybrid_kitti": dict(scale=0.00006016, shift=0.00579, invert=True,
                                 out_scale=256.0),
        "dpt_hybrid_nyu": dict(scale=0.000305, shift=0.1378, invert=True,
                               out_scale=1000.0),
    }

    def __init__(self, params=None, config=None, variant: str = "dpt_hybrid",
                 size: int = 384):
        from geodiffuser_tpu.models.midas_dpt import DPTHybrid, DPTHybridConfig

        v = self.VARIANTS[variant]
        self.cfg = config or DPTHybridConfig(
            scale=v["scale"], shift=v["shift"], invert=v["invert"]
        )
        self.out_scale = v["out_scale"]
        self.invert = self.cfg.invert
        self.size = size if config is None else 16 * self.cfg.pos_grid // 2
        self.model = DPTHybrid(self.cfg)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.0) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        s = max(self.size // 16, 2) * 16
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), s, s)
        x = (x - 0.5) / 0.5
        d = self._apply(self.params, x[None])[0]
        d = np.asarray(image_ops.resize_bilinear(d, h, w)) * self.out_scale
        if self.invert:
            # metric variants already return depth: push-back only
            if translate_factor:
                d = d + d.max() * translate_factor
            return d
        return postprocess_relative_depth(d, translate_factor)


class MidasV21Predictor:
    """midas_v21 path of get_monocular_depth (depth_predictor.py:169-175):
    ImageNet normalization, ResNeXt101 MidasNet, inverse-depth output."""

    def __init__(self, params=None, config=None, size: int = 384):
        from geodiffuser_tpu.models.midas_dpt import MidasNetV21, MidasV21Config

        self.cfg = config or MidasV21Config()
        self.size = size
        self.model = MidasNetV21(self.cfg)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.0) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        s = max(self.size // 32, 2) * 32
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), s, s)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        d = self._apply(self.params, x[None])[0]
        d = np.asarray(image_ops.resize_bilinear(d, h, w))
        return postprocess_relative_depth(d, translate_factor)


class ZoeDepthPredictor:
    """Metric-depth backend (get_monocular_ZoeDepth, depth_predictor.py:277-319)
    over the native metric-bins ZoeDepth (models/zoedepth.py).

    Returns metric depth directly (no inversion — ZoeDepth output is already
    depth, not disparity; the reference likewise returns it raw)."""

    def __init__(self, params=None, config=None, size: int = 384):
        from geodiffuser_tpu.models.zoedepth import ZoeDepth, ZoeDepthConfig

        self.cfg = config or ZoeDepthConfig()
        self.size = size
        self.model = ZoeDepth(self.cfg)
        if params is None:
            p = self.cfg.core.patch_size
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, p * 4, p * 4, 3))
            )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.0) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        p = self.cfg.core.patch_size
        s = max(self.size // p, 2) * p
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), s, s)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        d = self._apply(self.params, x[None])[0]
        d = np.asarray(image_ops.resize_bilinear(d, h, w))
        if translate_factor:
            d = d + d.max() * translate_factor
        return d


class ZoeDepthNKPredictor:
    """The shipped ZoeD-M12-NK metric-depth checkpoint architecture
    (BEiT-384 core + two-head latitude router, models/zoedepth_nk.py;
    reference depth_predictor.py:277-319 with zoedepth_nk config).

    Pass `state_dict` (the torch checkpoint's ["model"] as numpy arrays) to
    load the released weights via convert_zoedepth_nk."""

    def __init__(self, params=None, config=None, state_dict=None,
                 size: Tuple[int, int] = (384, 512)):
        from geodiffuser_tpu.models.zoedepth_nk import (
            ZoeDepthNK, ZoeDepthNKConfig, convert_zoedepth_nk,
        )

        self.cfg = config or ZoeDepthNKConfig()
        self.size = size
        self.model = ZoeDepthNK(self.cfg)
        if params is None:
            if state_dict is not None:
                params = convert_zoedepth_nk(state_dict, self.cfg)
            else:
                p = self.cfg.core.patch_size
                params = self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, p * 4, p * 4, 3))
                )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, translate_factor: float = 0.0) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        p = self.cfg.core.patch_size
        sh = max(self.size[0] // p, 2) * p
        sw = max(self.size[1] // p, 2) * p
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img), sh, sw)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        d = self._apply(self.params, x[None])[0]
        d = np.asarray(image_ops.resize_bilinear(d, h, w))
        if translate_factor:
            d = d + d.max() * translate_factor
        return d


def get_depth_predictor(name: str = "depth_anything", **kw):
    """Depth-model registry (the reference's model dropdown,
    ui_utils.py:380-411: depth_anything | dpt_large | zoedepth | constant)."""
    if name == "depth_anything":
        return DepthAnythingPredictor(**kw)
    if name in ("dpt_large", "midas"):
        return MidasDPTPredictor(**kw)
    if name in ("dpt_hybrid", "dpt_hybrid_kitti", "dpt_hybrid_nyu"):
        return DPTHybridPredictor(variant=name, **kw)
    if name == "midas_v21":
        return MidasV21Predictor(**kw)
    if name == "zoedepth":
        return ZoeDepthPredictor(**kw)
    if name in ("zoedepth_nk", "zoe_nk"):
        return ZoeDepthNKPredictor(**kw)
    raise ValueError(f"unknown depth model {name}")
