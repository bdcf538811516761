"""Geometry golden tests against closed-form warps (SURVEY.md §4b)."""

import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.ops import camera


import pytest

pytestmark = [pytest.mark.fast, pytest.mark.smoke]


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


@pytest.mark.fast
def test_cam2pixel_occlusion_identity():
    """Identity transform -> identity sampling field; backward warp returns
    the image bit-exactly (integer sample positions)."""
    from geodiffuser_tpu.ops import camera

    h = w = 8
    intr = camera.camera_matrix(5.0, h, w)
    depth = jnp.full((h, w), 2.0)
    cam = camera.pixel2cam(depth, jnp.linalg.inv(intr))
    field = camera.cam2pixel_occlusion(
        cam, jnp.eye(3), jnp.zeros((3, 1)), intr
    )
    grid = np.stack(np.meshgrid(
        2 * np.arange(w) / (w - 1) - 1, 2 * np.arange(h) / (h - 1) - 1
    ), axis=-1)
    np.testing.assert_allclose(np.asarray(field), grid, atol=1e-5)

    img = jnp.asarray(np.random.RandomState(0).rand(h, w, 3), jnp.float32)
    out = camera.backward_warp(img, field)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


@pytest.mark.fast
def test_cam2pixel_occlusion_golden_vs_reference_semantics():
    """Golden test vs a numpy replica of the reference's z-descending
    index_put_ (warp_utils.py:495-595): nearest source wins contested
    target cells."""
    from geodiffuser_tpu.ops import camera

    h = w = 8
    f = 4.0
    intr = np.asarray(camera.camera_matrix(f, h, w))
    rng = np.random.RandomState(1)
    # near strip (z=1) over a far plane (z=4): a camera-x translation moves
    # the near strip 4x further in pixels -> guaranteed occlusion overlaps
    depth = np.full((h, w), 4.0, np.float32)
    depth[:, 2] = 1.0
    rot = np.eye(3, dtype=np.float32)
    tr = np.asarray([[0.5], [0.0], [0.0]], np.float32)

    cam = np.asarray(camera.pixel2cam(jnp.asarray(depth), jnp.linalg.inv(jnp.asarray(intr))))

    # ---- numpy replica of the reference
    flat = cam.reshape(3, -1)
    p = rot @ flat + tr
    p = intr @ p
    z = np.maximum(p[2], 1e-8)
    x_ndc = 2 * (p[0] / z) / (w - 1) - 1
    y_ndc = 2 * (p[1] / z) / (h - 1) - 1
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    x_in = 2 * xs.reshape(-1) / (w - 1) - 1
    y_in = 2 * ys.reshape(-1) / (h - 1) - 1
    delta = np.stack([x_ndc - x_in, y_ndc - y_in], -1)
    ty = np.clip(np.round((y_ndc + 1) / 2 * (h - 1)), 0, h - 1).astype(int)
    tx = np.clip(np.round((x_ndc + 1) / 2 * (w - 1)), 0, w - 1).astype(int)
    dg = delta.copy().reshape(h, w, 2)
    for i in np.argsort(-z, kind="stable"):           # far first, near last
        dg[ty[i], tx[i]] = delta[i]
    expected = np.stack([x_in, y_in], -1) - dg.reshape(-1, 2)

    field = np.asarray(camera.cam2pixel_occlusion(
        jnp.asarray(cam), jnp.asarray(rot), jnp.asarray(tr), jnp.asarray(intr)
    )).reshape(-1, 2)

    # all cells whose winner is unambiguous must match the replica exactly;
    # the only legitimate differences are exact-Z ties (none in this scene:
    # near z=1 vs far z=4 after translation stay distinct per cell)
    np.testing.assert_allclose(field, expected, atol=1e-5)
