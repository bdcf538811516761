"""Image-space helpers (pure JAX unless noted).

Rebuilds the reference's misc tensor ops (generic_torch.py) and the
histogram-matching post-process (image_processing.py:24-97) without torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def binarize(x: jnp.ndarray, thresh: float = 0.5) -> jnp.ndarray:
    """(x > thresh) as float.  Reference: generic_torch.py:122-124."""
    return (x > thresh).astype(jnp.float32)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize without antialiasing, matching
    torchvision `Resize(antialias=False)` half-pixel sampling.

    Works on (..., H, W) arrays; spatial dims are the trailing two.
    Reference usage: reshape_attention_mask / reshape_transform_coords
    (generic_torch.py:156-207).
    """
    shape = x.shape[:-2] + (height, width)
    return jax.image.resize(x.astype(jnp.float32), shape, method="linear", antialias=False)


def resize_bilinear_hwc(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) arrays."""
    shape = x.shape[:-3] + (height, width, x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), shape, method="linear", antialias=False)


def _box_counts(mask: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Sum of a (kernel x kernel) box around each pixel of an (H, W) map."""
    k = jnp.ones((kernel, kernel, 1, 1), dtype=jnp.float32)
    x = mask.astype(jnp.float32)[None, :, :, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0, :, :, 0]


def erode(mask: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Binary erosion via box-count == k².  Reference: generic_torch.py:210-221.

    Note: matches the reference's zero padding, so the image border erodes.
    """
    counts = _box_counts(mask, kernel)
    return (counts >= float(kernel * kernel) - 0.5).astype(jnp.float32)


def dilate(mask: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Binary dilation via box-count >= 1.  Reference: generic_torch.py:223-235."""
    counts = _box_counts(mask, kernel)
    return (counts >= 0.5).astype(jnp.float32)


def closing(mask: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Morphological closing (dilate then erode); used to hole-fill splatted masks."""
    return erode(dilate(mask, kernel), kernel)


def gaussian_kernel_1d(size: int, sigma: float | None = None) -> jnp.ndarray:
    if sigma is None:
        # Reference sigma default: kernel_size//2 * 2 / 6 (generic_torch.py:33)
        sigma = (size // 2) * 2 / 6.0
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-((x / (2.0 * sigma)) ** 2)) / (sigma * np.sqrt(2 * np.pi))
    return k / k.sum()


def gaussian_smooth_2d(x: jnp.ndarray, size: int = 3, sigma: float | None = None) -> jnp.ndarray:
    """Depthwise Gaussian blur of (..., H, W) arrays (separable).

    Reference: GaussianSmoothing (generic_torch.py:13-84).  NOTE: the reference
    builds its kernel with exp(-((x-mean)/(2*sigma))**2) — i.e. a *non-standard*
    Gaussian missing the square on the denominator — and we replicate that via
    gaussian_kernel_1d to stay numerically comparable.
    """
    k1 = gaussian_kernel_1d(size, sigma)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    flat = x.reshape((-1, h, w, 1)).astype(jnp.float32)
    kh = k1.reshape(size, 1, 1, 1)
    kw = k1.reshape(1, size, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(flat, kh, (1, 1), "SAME", dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "SAME", dimension_numbers=dn)
    return out.reshape(lead + (h, w))


def max_pool_same(mask: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """(2k+1)-window max pool at stride 1 (reference smooth_mask,
    attention_sharing.py:50-65)."""
    window = 2 * k + 1
    return jax.lax.reduce_window(
        mask.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(window, window), window_strides=(1, 1), padding="SAME",
    )


def adain(feat: jnp.ndarray, feat_ref: jnp.ndarray, axis: int = -2, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance normalization (reference: generic_torch.py:237-253)."""
    mean = feat.mean(axis=axis, keepdims=True)
    std = jnp.sqrt(feat.var(axis=axis, keepdims=True) + eps)
    mean_r = feat_ref.mean(axis=axis, keepdims=True)
    std_r = jnp.sqrt(feat_ref.var(axis=axis, keepdims=True) + eps)
    return (feat - mean) / std * std_r + mean_r


def norm_tensor(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Frobenius norm (reference: generic_torch.py:87-88)."""
    return jnp.sqrt(jnp.sum(a * a) + eps)


# ---------------------------------------------------------------------------
# Host-side (numpy) post-processing — runs once per edit, off the hot path.
# ---------------------------------------------------------------------------

def _match_cumulative_cdf(
    source: np.ndarray,
    template: np.ndarray,
    mask: np.ndarray | None,
    mask_source: np.ndarray | None,
) -> np.ndarray:
    """Masked CDF histogram matching for one uint8 channel.

    Reference: image_processing.py:24-64 — quantiles computed only over the
    masked regions, the lookup applied to the full image.
    """
    if mask is None:
        mask = np.ones_like(source, dtype=np.float32)
    if mask_source is None:
        mask_source = mask
    src_vals = source[mask_source > 0.5].reshape(-1)
    tmpl_vals = template[mask > 0.5].reshape(-1)
    if src_vals.size == 0 or tmpl_vals.size == 0:
        return source.astype(np.float64)
    src_counts = np.bincount(src_vals, minlength=256)
    tmpl_counts = np.bincount(tmpl_vals, minlength=256)
    levels = np.linspace(0, 255, 256)
    src_quantiles = np.cumsum(src_counts) / src_vals.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / tmpl_vals.size
    lut = np.interp(src_quantiles, tmpl_quantiles, levels)
    return lut[source.reshape(-1)].reshape(source.shape)


def masked_histogram_matching(
    source: np.ndarray,
    template: np.ndarray,
    mask: np.ndarray | None = None,
    mask_source: np.ndarray | None = None,
) -> np.ndarray:
    """Per-channel masked histogram matching of uint8 images.

    Reference: image_processing.py:67-77.
    """
    source = np.asarray(source).astype(np.uint8)
    template = np.asarray(template).astype(np.uint8)
    out = [
        _match_cumulative_cdf(source[..., c], template[..., c], mask, mask_source)
        for c in range(source.shape[-1])
    ]
    return np.stack(out, axis=-1)
