"""Transform-field builder: image + depth + mask + 4x4 -> per-pixel targets.

Rebuilds `vis_utils.get_transform_coordinates` (vis_utils.py:404-479) — the
top preprocessing step of every edit — as a jittable function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from geodiffuser_tpu.ops import camera, splat
from geodiffuser_tpu.ops import image as image_ops


class TransformField(NamedTuple):
    coords: jnp.ndarray           # (H, W, 3) target (x_ndc, y_ndc, z)
    warped_preview: jnp.ndarray   # (H, W, C) splat-warped input image
    amodal_mask: jnp.ndarray      # (H, W) hole-free projected object mask
    valid: jnp.ndarray            # (H, W) in-frustum mask


def preprocess_depth(depth: jnp.ndarray, constant_tol: float = 1e-6) -> jnp.ndarray:
    """Depth normalization rules of get_transform_coordinates
    (vis_utils.py:409-423): constant-depth (0.5 everywhere) passes through,
    otherwise d / d.max() with far clip  d > 0.95 -> 1.0.
    """
    d = depth.astype(jnp.float32)
    is_constant = jnp.abs(jnp.sum(d) - 0.5 * d.size) < constant_tol
    dn = d / (d.max() + 1e-8)
    dn = jnp.where(dn > 0.95, 1.0, dn)
    return jnp.where(is_constant, jnp.full_like(d, 0.5), dn)


def build_transform_field(
    image: jnp.ndarray,
    depth: jnp.ndarray,
    obj_mask: jnp.ndarray,
    transform: jnp.ndarray,
    focal_length: float = 550.0,
    splat_radius: float = 1.3,
    splat_tau: float = 1.0,
    z_beta: float = 20.0,
    amodal_upsample: int = 4,
) -> TransformField:
    """Full chain of get_transform_coordinates + forward_splatting_pytorch3d_warp
    (vis_utils.py:404-479, warp_utils.py:407-492).

    Args:
        image: (H, W, C) in [0, 1].
        depth: (H, W) raw depth (already inverted/pushed back by the depth
            predictor wrapper; see utils/depth.py).
        obj_mask: (H, W) binary object mask.
        transform: (4, 4) edit transform (camera frame, recentered here).
    """
    h, w = depth.shape
    d = preprocess_depth(depth)
    # Centering mask: object pixels that are not far-clipped (vis_utils.py:423-427)
    center_mask = image_ops.binarize(obj_mask) * (d < 0.95).astype(jnp.float32)

    k = camera.camera_matrix(focal_length, h, w)
    cam = camera.pixel2cam(d, jnp.linalg.inv(k))
    t = camera.recenter_transform(jnp.asarray(transform, jnp.float32), cam, center_mask)
    coords = camera.cam2pixel(cam, t[:3, :3], t[:3, 3:4], k)

    preview = splat.splat_image(
        image.astype(jnp.float32), coords, radius=splat_radius, tau=splat_tau, z_beta=z_beta
    )
    valid = (jnp.max(jnp.abs(coords[..., :2]), axis=-1) <= 1.0).astype(jnp.float32)
    preview = preview * valid[..., None]

    amodal = splat.densified_mask_splat(
        image_ops.binarize(obj_mask), coords,
        upsample=amodal_upsample, radius=splat_radius, tau=splat_tau, z_beta=z_beta,
    )
    return TransformField(coords=coords, warped_preview=preview, amodal_mask=amodal, valid=valid)
