"""Fused Pallas splat kernel vs the XLA scatter path (ops/splat.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geodiffuser_tpu.kernels.splat import splat_image_fused
from geodiffuser_tpu.ops import camera
from geodiffuser_tpu.ops import splat as so


def _field(rng, h, w, shift=0.1, zrand=True):
    tc = camera.identity_field(h, w)
    tc = tc.at[..., 0].add(jnp.asarray(rng.rand(h, w) * 2 * shift - shift))
    tc = tc.at[..., 1].add(jnp.asarray(rng.rand(h, w) * 2 * shift - shift))
    if zrand:
        tc = tc.at[..., 2].set(jnp.asarray(rng.rand(h, w)))
    return tc


@pytest.mark.fast
@pytest.mark.parametrize("radius,tau", [(1.3, 1.0), (1.0, 0.1), (2.5, 0.5)])
def test_fused_matches_xla(radius, tau):
    rng = np.random.RandomState(0)
    h = w = 16
    src = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    tc = _field(rng, h, w)
    a = np.asarray(so.splat_image(src, tc, radius=radius, tau=tau))
    b = np.asarray(splat_image_fused(
        src, tc, radius=radius, tau=tau, interpret=True, block_o=64, block_s=128
    ))
    np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.fast
def test_fused_traced_scalars_and_occlusion():
    """radius/tau as traced scalars under jit; near z wins under z_beta."""
    rng = np.random.RandomState(1)
    h = w = 8
    src = jnp.asarray(rng.rand(h, w, 2), jnp.float32)
    tc = _field(rng, h, w, shift=0.3)

    @jax.jit
    def run(r, t):
        return splat_image_fused(src, tc, radius=r, tau=t, interpret=True,
                                 block_o=16, block_s=128)

    for r, t in ((1.3, 1.0), (1.0, 0.5)):
        a = np.asarray(so.splat_image(src, tc, radius=r, tau=t))
        b = np.asarray(run(jnp.float32(r), jnp.float32(t)))
        np.testing.assert_allclose(a, b, atol=2e-6)

    # two sources collapse onto one cell; the nearer (smaller z) dominates
    tc2 = camera.identity_field(h, w)
    tc2 = tc2.at[0, 1, 0].set(tc2[0, 0, 0])   # pixel (0,1) lands on (0,0)
    tc2 = tc2.at[..., 2].set(1.0).at[0, 1, 2].set(0.1)
    out = np.asarray(splat_image_fused(src, tc2, radius=1.0, tau=1.0,
                                       interpret=True, block_o=16, block_s=128))
    ref = np.asarray(so.splat_image(src, tc2, radius=1.0, tau=1.0))
    np.testing.assert_allclose(out, ref, atol=2e-6)
    np.testing.assert_allclose(out[0, 0], np.asarray(src)[0, 1], atol=2e-4)


@pytest.mark.fast
def test_fused_rect_and_downsample():
    """Rectangular grids and out_hw-downsampled warps (mask -> latent res)."""
    rng = np.random.RandomState(2)
    h, w = 12, 20
    src = jnp.asarray(rng.rand(h, w, 1), jnp.float32)
    tc = _field(rng, h, w, shift=0.05)
    a = np.asarray(so.splat_image(src, tc, radius=1.3, tau=1.0))
    b = np.asarray(splat_image_fused(src, tc, radius=1.3, tau=1.0,
                                     interpret=True, block_o=32, block_s=128))
    np.testing.assert_allclose(a, b, atol=2e-6)

    a2 = np.asarray(so.splat_image(src, tc, radius=1.3, tau=1.0, out_hw=(6, 10)))
    b2 = np.asarray(splat_image_fused(src, tc, radius=1.3, tau=1.0, out_hw=(6, 10),
                                      interpret=True, block_o=16, block_s=128))
    np.testing.assert_allclose(a2, b2, atol=2e-6)
