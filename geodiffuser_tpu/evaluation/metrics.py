"""Edit-quality metrics (reference: GeoDiffuser/evaluation/image_fidelity.py).

Reference metric set (image_fidelity.py:125-206, 510-514):
  * warp error   — masked L1 between the edit and the splat-warped input
  * LPIPS (alex @224) and IF = 1 - LPIPS
  * CLIP ViT-B/32 cosine similarity
  * MD           — mean distance of DIFT-matched SIFT keypoints from their
                   expected warped locations

Offline-runnable here: warp error, PSNR/SSIM (added — cheap full-reference
metrics with no pretrained weights).  LPIPS/CLIP/MD require pretrained
towers; they are implemented against the same JAX model classes and load
weights from a local checkpoint directory when available (this build
environment has zero egress, so they raise a clear error otherwise).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.ops import splat as splat_ops


def warp_error(
    edited: np.ndarray,
    source: np.ndarray,
    t_coords: np.ndarray,
    mask_warped: np.ndarray,
    radius: float = 1.3,
    tau: float = 1.0,
) -> float:
    """Masked L1 between the edit and the forward-warped source, inside the
    warped object mask (image_fidelity.py:134).  Images in [0, 1]."""
    src = jnp.asarray(source, jnp.float32)
    warped = splat_ops.splat_image(src, jnp.asarray(t_coords, jnp.float32), radius=radius, tau=tau)
    m = jnp.asarray(mask_warped, jnp.float32)[..., None]
    num = (jnp.abs(warped - jnp.asarray(edited, jnp.float32)) * m).sum()
    return float(num / (m.sum() * edited.shape[-1] + 1e-8))


def psnr(a: np.ndarray, b: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.max() > 1.5:
        a, b = a / 255.0, b / 255.0
    if mask is not None:
        m = mask[..., None] if mask.ndim == 2 else mask
        mse = float((((a - b) ** 2) * m).sum() / (m.sum() * a.shape[-1] + 1e-12))
    else:
        mse = float(((a - b) ** 2).mean())
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def ssim(a: np.ndarray, b: np.ndarray, window: int = 7) -> float:
    """Mean structural similarity (grayscale, uniform window)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.max() > 1.5:
        a, b = a / 255.0, b / 255.0
    if a.ndim == 3:
        a = a.mean(-1)
        b = b.mean(-1)
    aj, bj = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)

    def box(x):
        k = jnp.ones((window, window, 1, 1), jnp.float32) / (window * window)
        return jax.lax.conv_general_dilated(
            x[None, :, :, None], k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0, :, :, 0]

    mu_a, mu_b = box(aj), box(bj)
    var_a = box(aj * aj) - mu_a ** 2
    var_b = box(bj * bj) - mu_b ** 2
    cov = box(aj * bj) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    )
    return float(jnp.mean(s))


def background_preservation(edited: np.ndarray, source: np.ndarray, mask_changed: np.ndarray) -> dict:
    """PSNR/SSIM of the untouched background — the offline stand-in for the
    LPIPS-based IF metric."""
    inv = 1.0 - np.asarray(mask_changed, np.float64)
    return {
        "bg_psnr": psnr(edited, source, inv),
        "bg_l1": float(
            (np.abs(edited.astype(np.float64) - source.astype(np.float64)) * inv[..., None]).sum()
            / (inv.sum() * 3 + 1e-8)
            / (255.0 if np.asarray(edited).max() > 1.5 else 1.0)
        ),
    }


# ---------------------------------------------------------------------------
# Pretrained-tower metrics (weight-gated)
# ---------------------------------------------------------------------------

class PretrainedWeightsUnavailable(RuntimeError):
    pass


def lpips(a: np.ndarray, b: np.ndarray, weights_dir: Optional[str] = None) -> float:
    """LPIPS(alex) @ 224^2 (image_fidelity.py:183-206) via the native
    evaluation/lpips.py network; needs pretrained AlexNet + linear heads."""
    import os

    from geodiffuser_tpu.evaluation.lpips import LPIPSMetric

    if not weights_dir:
        raise PretrainedWeightsUnavailable(
            "LPIPS needs pretrained AlexNet + lpips linear-head weights; pass "
            "weights_dir containing alexnet.pth and lpips_alex.pth."
        )
    metric = LPIPSMetric(
        alex_path=os.path.join(weights_dir, "alexnet.pth"),
        lin_path=os.path.join(weights_dir, "lpips_alex.pth"),
    )
    return metric(a, b)


def clip_similarity(a: np.ndarray, b: np.ndarray, weights_dir: Optional[str] = None) -> float:
    """CLIP ViT-B/32 image-embedding cosine (image_fidelity.py:183-206) via
    the native models/clip_vision.py tower; needs pretrained weights."""
    import os

    import jax

    from geodiffuser_tpu.models import weights as weights_lib
    from geodiffuser_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionEncoder, preprocess_clip_image,
    )

    if not weights_dir:
        raise PretrainedWeightsUnavailable(
            "CLIP similarity needs the pretrained ViT-B/32 image tower; pass "
            "weights_dir containing clip_vision.safetensors."
        )
    state = weights_lib._load_safetensors(os.path.join(weights_dir, "clip_vision.safetensors"))
    params = weights_lib.convert_clip_vision(state)
    model = CLIPVisionEncoder(CLIPVisionConfig())
    ea = np.asarray(model.apply(params, preprocess_clip_image(a)))[0]
    eb = np.asarray(model.apply(params, preprocess_clip_image(b)))[0]
    return float(ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-12))


def evaluate_experiment(exp, edited: np.ndarray, t_coords: np.ndarray, mask_warped: np.ndarray) -> dict:
    """Offline metric bundle for one experiment folder."""
    src = exp.input_image.astype(np.float32) / 255.0
    ed = np.asarray(edited, np.float32)
    if ed.max() > 1.5:
        ed = ed / 255.0
    mask_changed = np.clip(mask_warped + exp.input_mask, 0, 1)
    out = {
        "warp_l1": warp_error(ed, src, t_coords, mask_warped),
        "ssim": ssim(ed, src),
    }
    out.update(background_preservation(ed, src, mask_changed))
    return out
