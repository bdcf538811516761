"""Geometry golden tests against closed-form warps (SURVEY.md §4b)."""

import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.ops import camera


import pytest

pytestmark = pytest.mark.fast


def test_pixel2cam_roundtrip():
    h = w = 16
    k = camera.camera_matrix(20.0, h, w)
    depth = jnp.full((h, w), 2.0)
    cam = camera.pixel2cam(depth, jnp.linalg.inv(k))
    # Reproject with identity transform: must land exactly on the pixel grid.
    coords = camera.cam2pixel(cam, jnp.eye(3), jnp.zeros((3, 1)), k)
    ident = camera.identity_field(h, w)
    np.testing.assert_allclose(np.asarray(coords[..., :2]), np.asarray(ident[..., :2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords[..., 2]), 2.0, atol=1e-5)


def test_translation_on_constant_depth_is_pixel_shift():
    """Pure x-translation at constant depth => uniform NDC shift of f*tx/z
    pixels (closed-form pinhole)."""
    h = w = 32
    f = 50.0
    z = 2.0
    tx = 0.2
    k = camera.camera_matrix(f, h, w)
    depth = jnp.full((h, w), z)
    mask = jnp.ones((h, w))
    t = jnp.asarray(camera.translate_matrix(tx, 0, 0), jnp.float32)
    coords = camera.transform_field(depth, k, t, mask)
    ident = camera.identity_field(h, w)
    expected_px_shift = f * tx / z
    dx_ndc = np.asarray(coords[..., 0] - ident[..., 0])
    np.testing.assert_allclose(dx_ndc, 2 * expected_px_shift / (w - 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), np.asarray(ident[..., 1]), atol=1e-5)


def test_recenter_makes_rotation_fix_centroid():
    """After recentering, the masked centroid must be a fixed point of the
    transform (warp_utils.py:421-435 behavior)."""
    h = w = 16
    k = camera.camera_matrix(30.0, h, w)
    depth = jnp.full((h, w), 1.5)
    mask = jnp.zeros((h, w)).at[4:8, 6:10].set(1.0)
    cam = camera.pixel2cam(depth, jnp.linalg.inv(k))
    rot = jnp.asarray(camera.rotate_axis(30.0, 2), jnp.float32)
    t = camera.recenter_transform(rot, cam, mask)
    m = np.asarray(mask).reshape(-1) >= 0.5
    pts = np.asarray(cam).reshape(3, -1)[:, m]
    c = pts.mean(axis=1)
    c_h = np.concatenate([c, [1.0]])
    np.testing.assert_allclose(np.asarray(t) @ c_h, c_h, atol=1e-4)


def test_compose_transform_order():
    """T @ S @ Rx @ Ry @ Rz composition (ui_utils.py:529-555)."""
    m = camera.compose_transform(tx=0.1, rz=90.0, sx=2.0)
    expected = (
        camera.translate_matrix(0.1, 0, 0)
        @ camera.scale_matrix(2.0, 1.0, 1.0)
        @ camera.rotate_axis(90.0, 2)
    )
    np.testing.assert_allclose(m, expected, atol=1e-12)
