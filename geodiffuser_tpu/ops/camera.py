"""Pinhole camera / projective geometry (pure JAX, fp32).

Rebuilds the geometry layer of the reference (warp_utils.py:495-747,
vis_utils.py:79-88, ui_utils.py:529-555) as pure functions.  Conventions:

 * images are NHWC; pixel x is the column index, y the row index
 * camera frame: x-right, y-down, z-forward (reference `pixel2cam`,
   warp_utils.py:738-747)
 * normalized device coordinates (NDC) in [-1, 1] with align_corners=True
   semantics: x_ndc = 2*x/(W-1) - 1 (reference cam2pixel_vanilla,
   warp_utils.py:599-645)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def camera_matrix(focal: float, height: int, width: int) -> jnp.ndarray:
    """Intrinsics K with principal point at the image center.

    Reference: vis_utils.py:79-88 with c_x = W/2, c_y = H/2 (vis_utils.py:406).
    """
    return jnp.array(
        [[focal, 0.0, width / 2.0], [0.0, focal, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def rotate_axis(degrees: float, axis: int) -> np.ndarray:
    """Homogeneous 4x4 rotation about a coordinate axis (0=x, 1=y, 2=z).

    Reference: warp_utils.py:182-222.  Host-side (numpy) because transforms
    are composed before tracing.
    """
    r = np.radians(degrees)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    if axis == 0:
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    elif axis == 1:
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    elif axis == 2:
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    else:
        raise ValueError(f"axis must be 0, 1 or 2, got {axis}")
    return m


def translate_matrix(x: float, y: float, z: float) -> np.ndarray:
    """Homogeneous translation (reference: vis_utils.py:68-75)."""
    m = np.eye(4)
    m[:3, 3] = [x, y, z]
    return m


def scale_matrix(sx: float, sy: float, sz: float) -> np.ndarray:
    m = np.eye(4)
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def compose_transform(
    tx: float = 0.0,
    ty: float = 0.0,
    tz: float = 0.0,
    rx: float = 0.0,
    ry: float = 0.0,
    rz: float = 0.0,
    sx: float = 1.0,
    sy: float = 1.0,
    sz: float = 1.0,
) -> np.ndarray:
    """UI slider composition T @ S @ Rx @ Ry @ Rz (reference: ui_utils.py:529-555)."""
    m = translate_matrix(tx, ty, tz)
    m = m @ scale_matrix(sx, sy, sz)
    m = m @ rotate_axis(rx, 0)
    m = m @ rotate_axis(ry, 1)
    m = m @ rotate_axis(rz, 2)
    return m


def pixel_grid(height: int, width: int) -> jnp.ndarray:
    """Homogeneous pixel coordinates, shape (3, H*W): rows (x, y, 1).

    Reference: set_id_grid, warp_utils.py:728-736.
    """
    y = jnp.arange(height, dtype=jnp.float32)
    x = jnp.arange(width, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    ones = jnp.ones_like(xx)
    return jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)


def pixel2cam(depth: jnp.ndarray, intrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depth map to camera-frame 3D points.

    Args:
        depth: (H, W) depth map.
        intrinsics_inv: (3, 3) inverse intrinsics.
    Returns:
        (3, H, W) camera coordinates.  Reference: warp_utils.py:738-747.
    """
    h, w = depth.shape
    rays = intrinsics_inv.astype(jnp.float32) @ pixel_grid(h, w)  # (3, HW)
    return rays.reshape(3, h, w) * depth[None].astype(jnp.float32)


def recenter_transform(
    transform: jnp.ndarray, cam_coords: jnp.ndarray, obj_mask: jnp.ndarray
) -> jnp.ndarray:
    """Conjugate `transform` by the object's centroid so rotations/scales act
    about the object center.

    Reference: forward_splatting_pytorch3d_warp, warp_utils.py:421-435 —
    T_centered = Tr(+c) @ transform @ Tr(-c) with c = mean of masked points.

    Args:
        transform: (4, 4)
        cam_coords: (3, H, W)
        obj_mask: (H, W) in {0, 1}
    """
    m = (obj_mask >= 0.5).astype(jnp.float32).reshape(1, -1)
    pts = cam_coords.reshape(3, -1)
    denom = jnp.maximum(m.sum(), 1.0)
    center = (pts * m).sum(axis=-1) / denom  # (3,)
    t_neg = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-center)
    t_pos = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(center)
    return t_pos @ transform.astype(jnp.float32) @ t_neg


def cam2pixel(
    cam_coords: jnp.ndarray,
    rot: jnp.ndarray,
    tr: jnp.ndarray,
    intrinsics: jnp.ndarray,
    z_min: float = 1e-3,
) -> jnp.ndarray:
    """Transform + project camera points to NDC, keeping depth.

    Args:
        cam_coords: (3, H, W)
        rot: (3, 3) rotation/linear part.
        tr: (3, 1) translation.
        intrinsics: (3, 3)
    Returns:
        (H, W, 3): (x_ndc, y_ndc, z) with align_corners=True NDC and
        z clamped to >= z_min.  Reference: cam2pixel_vanilla with
        norm_scale=True, return_z=True (warp_utils.py:599-645).
    """
    _, h, w = cam_coords.shape
    flat = cam_coords.reshape(3, -1).astype(jnp.float32)
    p = rot.astype(jnp.float32) @ flat + tr.astype(jnp.float32).reshape(3, 1)
    p = intrinsics.astype(jnp.float32) @ p
    z = jnp.maximum(p[2], z_min)
    x_ndc = 2.0 * (p[0] / z) / (w - 1) - 1.0
    y_ndc = 2.0 * (p[1] / z) / (h - 1) - 1.0
    return jnp.stack([x_ndc, y_ndc, z], axis=-1).reshape(h, w, 3)


def transform_field(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
    obj_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel target coordinates for a 4x4 edit transform.

    The full chain of forward_splatting_pytorch3d_warp (warp_utils.py:407-444)
    minus the splatting: unproject with `depth`, recenter the transform about
    the masked object's centroid, reproject.

    Returns:
        (H, W, 3) target (x_ndc, y_ndc, z) field.
    """
    cam = pixel2cam(depth, jnp.linalg.inv(intrinsics))
    t = recenter_transform(transform, cam, obj_mask)
    return cam2pixel(cam, t[:3, :3], t[:3, 3:4], intrinsics)


def identity_field(height: int, width: int) -> jnp.ndarray:
    """The identity transform field: every pixel maps to itself at z=1."""
    y = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    x = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)


def cam2pixel_occlusion(
    cam_coords: jnp.ndarray,
    rot: jnp.ndarray,
    tr: jnp.ndarray,
    intrinsics: jnp.ndarray,
    far_clip: float = 100.0,
) -> jnp.ndarray:
    """Occlusion-aware backward-sampling field (reference `cam2pixel`,
    warp_utils.py:495-595; used by `forward_warp` :768-795).

    For every source pixel the forward NDC target and per-pixel delta are
    computed; deltas are scattered into a grid at the TARGET location with
    nearest-in-Z winning (the reference achieves this with a z-descending
    `index_put_` so later/nearer writes overwrite); the returned field is
    src_ndc - delta_grid: a grid-sample field where each target pixel pulls
    from the source pixel that lands on it, occlusions resolved by depth.

    Args:
        cam_coords: (3, H, W); rot (3, 3); tr (3, 1); intrinsics (3, 3)
    Returns:
        (H, W, 2) NDC sampling coordinates (align_corners=True convention).
    """
    _, h, w = cam_coords.shape
    flat = cam_coords.reshape(3, -1).astype(jnp.float32)
    p = rot.astype(jnp.float32) @ flat + tr.astype(jnp.float32)
    far = p[2] > far_clip                               # (HW,)
    p = intrinsics.astype(jnp.float32) @ p
    z = jnp.maximum(p[2], 1e-8)
    x_ndc = 2.0 * (p[0] / z) / (w - 1) - 1.0
    y_ndc = 2.0 * (p[1] / z) / (h - 1) - 1.0

    grid = pixel_grid(h, w)                             # (3, HW) pixel coords
    x_in = 2.0 * grid[0] / (w - 1) - 1.0
    y_in = 2.0 * grid[1] / (h - 1) - 1.0
    src = jnp.stack([x_in, y_in], axis=-1)              # (HW, 2)
    tgt = jnp.stack([x_ndc, y_ndc], axis=-1)
    tgt = jnp.where(far[:, None], src, tgt)             # far clip -> identity
    delta = tgt - src                                   # (HW, 2)

    ty = jnp.clip(jnp.round((tgt[:, 1] + 1.0) * 0.5 * (h - 1)), 0, h - 1)
    tx = jnp.clip(jnp.round((tgt[:, 0] + 1.0) * 0.5 * (w - 1)), 0, w - 1)
    t_idx = (ty * w + tx).astype(jnp.int32)

    # nearest-in-Z wins per target cell; ties broken by lowest source index
    # (torch's sequential overwrite order is itself tie-arbitrary)
    zmin = jnp.full((h * w,), jnp.inf).at[t_idx].min(z)
    is_near = z <= zmin[t_idx]
    src_idx = jnp.arange(h * w, dtype=jnp.int32)
    first = jnp.full((h * w,), 2 ** 30, jnp.int32).at[t_idx].min(
        jnp.where(is_near, src_idx, 2 ** 30)
    )
    winner = is_near & (src_idx == first[t_idx])

    # init = the source-laid delta grid (cells that receive no scatter keep
    # their own forward delta, exactly like the reference's index_put_ on a
    # copy of delta_X), then winners overwrite at their target cells
    scatter_idx = jnp.where(winner, t_idx, h * w)       # OOB -> dropped
    delta_grid = delta.at[scatter_idx].set(delta, mode="drop")

    out = src - delta_grid
    return out.reshape(h, w, 2)


def backward_warp(
    image: jnp.ndarray, field: jnp.ndarray
) -> jnp.ndarray:
    """grid_sample-style backward warp of (H, W, C) by an (H, W, 2) NDC field
    (align_corners=True, zero padding) — the consumer of
    cam2pixel_occlusion (reference forward_warp, warp_utils.py:768-795)."""
    h, w, _ = image.shape
    x = (field[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (field[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = jnp.zeros_like(image)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            cx = x0 + dx
            cy = y0 + dy
            wgt = (1.0 - jnp.abs(x - cx)) * (1.0 - jnp.abs(y - cy))
            valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            cxc = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
            cyc = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
            wgt = jnp.where(valid, wgt, 0.0)
            out = out + image[cyc, cxc] * wgt[..., None]
    return out
