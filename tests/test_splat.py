"""Splat kernel golden-value tests vs closed-form expectations (SURVEY.md §4c)."""

import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.ops import camera, splat
from geodiffuser_tpu.ops import image as image_ops


import pytest

pytestmark = [pytest.mark.fast, pytest.mark.smoke]


def test_identity_splat_preserves_image():
    h = w = 16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    coords = camera.identity_field(h, w)
    out = splat.splat_image(img, coords, radius=1.0, tau=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_integer_translation_shifts_image():
    h = w = 16
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(h, w, 1), jnp.float32)
    coords = camera.identity_field(h, w)
    # shift right by exactly 3 pixels in NDC
    coords = coords.at[..., 0].add(2 * 3 / (w - 1))
    out = np.asarray(splat.splat_image(img, coords, radius=1.0, tau=1.0))
    np.testing.assert_allclose(out[:, 3:, 0], np.asarray(img)[:, :-3, 0], atol=1e-4)
    # vacated columns receive nothing -> zeros ('zeros' padding semantics)
    np.testing.assert_allclose(out[:, :3, 0], 0.0, atol=1e-6)


def test_occlusion_front_point_wins():
    """Two source pixels splat to the same target; the smaller z must win."""
    h = w = 8
    img = jnp.zeros((h, w, 1)).at[2, 2, 0].set(1.0).at[5, 5, 0].set(2.0)
    coords = camera.identity_field(h, w)
    # send (5,5) on top of (2,2), closer to camera (z=0.5 vs 1.0)
    tgt_x = 2 * 2 / (w - 1) - 1
    tgt_y = 2 * 2 / (h - 1) - 1
    coords = coords.at[5, 5].set(jnp.array([tgt_x, tgt_y, 0.5]))
    out = np.asarray(splat.splat_image(img, coords, radius=1.0, tau=1.0, z_beta=50.0))
    assert abs(out[2, 2, 0] - 2.0) < 0.05, out[2, 2, 0]


def test_grid_sample_matches_identity_and_shift():
    h = w = 12
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(h, w, 2), jnp.float32)
    ident = camera.identity_field(h, w)[..., :2]
    out = splat.grid_sample(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # backward warp: coords point at source location (gather semantics)
    shifted = ident.at[..., 0].add(2 * 1 / (w - 1))
    out2 = np.asarray(splat.grid_sample(img, shifted))
    np.testing.assert_allclose(out2[:, :-1], np.asarray(img)[:, 1:], atol=1e-5)


def test_densified_mask_splat_fills_holes():
    """A 2x scale leaves holes under naive point splatting; the densified
    splat (amodal stand-in for mesh rasterization) must not."""
    h = w = 32
    mask = jnp.zeros((h, w)).at[12:20, 12:20].set(1.0)
    depth = jnp.full((h, w), 0.5)
    k = camera.camera_matrix(40.0, h, w)
    t = jnp.asarray(camera.scale_matrix(2.0, 2.0, 1.0), jnp.float32)
    coords = camera.transform_field(depth, k, t, mask)
    amodal = np.asarray(splat.densified_mask_splat(mask, coords))
    # object doubled in size about its center: center region must be solid
    assert amodal[16, 16] == 1.0
    inner = amodal[10:22, 10:22]
    assert inner.mean() > 0.95, inner.mean()


def test_morphology():
    m = jnp.zeros((9, 9)).at[3:6, 3:6].set(1.0)
    d = np.asarray(image_ops.dilate(m, 3))
    e = np.asarray(image_ops.erode(m, 3))
    assert d[2:7, 2:7].min() == 1.0 and d.sum() == 25
    assert e.sum() == 1 and e[4, 4] == 1.0


def test_warp_matrix_matches_splat_image():
    h = w = 16
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(h, w, 5), jnp.float32)
    coords = camera.identity_field(h, w).at[..., 0].add(0.13).at[..., 2].set(
        jnp.asarray(rng.rand(h, w) + 0.5))
    direct = splat.splat_image(img, coords, radius=1.3, tau=0.8, z_beta=20.0)
    mat = splat.warp_matrix(coords, radius=1.3, tau=0.8, z_beta=20.0)
    via_mat = splat.apply_warp_matrix(mat, img)
    np.testing.assert_allclose(np.asarray(via_mat), np.asarray(direct), atol=2e-5)


@pytest.mark.fast
def test_softsplat_modes_golden():
    """softsplat mode parity (softsplat.py:232-273) vs a numpy scatter
    reference, incl. integer-shift exactness and eps variants."""
    from geodiffuser_tpu.ops.splat import softsplat

    rng = np.random.RandomState(0)
    h = w = 8
    src = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    # integer shift by (+2, +1): sum mode must be an exact index shift
    flow = jnp.broadcast_to(jnp.asarray([2.0, 1.0]), (h, w, 2))
    out = np.asarray(softsplat(src, flow, mode="sum"))
    np.testing.assert_allclose(out[1:, 2:], np.asarray(src)[:-1, :-2], atol=1e-6)
    assert np.abs(out[0]).max() == 0.0  # vacated rows are empty

    # avg on an integer shift divides by the ones channel -> same values
    out_avg = np.asarray(softsplat(src, flow, mode="avg"))
    np.testing.assert_allclose(out_avg[1:, 2:], np.asarray(src)[:-1, :-2], atol=1e-5)

    # numpy golden for fractional flow, all modes
    flow_f = jnp.asarray(rng.rand(h, w, 2) * 1.5, jnp.float32)
    metric = jnp.asarray(rng.randn(h, w), jnp.float32)

    def np_scatter(arr):
        acc = np.zeros((h, w, arr.shape[-1]), np.float64)
        for y in range(h):
            for x in range(w):
                tx, ty = x + flow_f[y, x, 0], y + flow_f[y, x, 1]
                x0, y0 = int(np.floor(tx)), int(np.floor(ty))
                for cy in (y0, y0 + 1):
                    for cx in (x0, x0 + 1):
                        if 0 <= cy < h and 0 <= cx < w:
                            wgt = (1 - abs(tx - cx)) * (1 - abs(ty - cy))
                            acc[cy, cx] += wgt * np.asarray(arr[y, x], np.float64)
        return acc

    s = np.asarray(src)
    m = np.asarray(metric)[..., None]
    golden_sum = np_scatter(src)
    np.testing.assert_allclose(
        np.asarray(softsplat(src, flow_f, mode="sum")), golden_sum, atol=1e-5
    )
    num = np_scatter(jnp.asarray(s * np.exp(m)))
    den = np_scatter(jnp.asarray(np.exp(m)))
    np.testing.assert_allclose(
        np.asarray(softsplat(src, flow_f, metric, mode="soft")),
        num / (den + 1e-7), atol=1e-4,
    )
    num_l = np_scatter(jnp.asarray(s * m))
    den_l = np_scatter(jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(softsplat(src, flow_f, metric, mode="linear-zeroeps")),
        num_l / np.where(den_l == 0.0, 1.0, den_l), atol=1e-4,
    )


@pytest.mark.fast
def test_softsplat_grads():
    """The XLA scatter transpose reproduces the reference's analytic VJP
    for both the input and the flow (softsplat.py:357-520)."""
    from jax.test_util import check_grads

    from geodiffuser_tpu.ops.splat import softsplat

    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(5, 5, 2), jnp.float32)
    flow = jnp.asarray(rng.rand(5, 5, 2) * 0.7 + 0.1, jnp.float32)
    metric = jnp.asarray(rng.randn(5, 5), jnp.float32)
    check_grads(lambda s, f: softsplat(s, f, mode="sum").sum() ** 2,
                (src, flow), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)
    check_grads(
        lambda s, f, m: (softsplat(s, f, m, mode="soft") ** 2).sum(),
        (src, flow, metric), order=1, modes=["rev"], atol=2e-2, rtol=2e-2,
    )
