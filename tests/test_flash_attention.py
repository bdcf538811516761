"""Pallas flash-attention kernel vs reference attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geodiffuser_tpu.core import edit_attention
from geodiffuser_tpu.kernels import flash_attention as fa


@pytest.mark.parametrize("d", [40, 64, 128])
def test_flash_matches_reference(d):
    rng = np.random.RandomState(0)
    b, h, l = 2, 2, 512
    q = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    scale = d ** -0.5
    ref = edit_attention.vanilla_attention(q, k, v, scale)
    out = fa.flash_attention(q, k, v, scale, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 256, 40), jnp.bfloat16)
    ref = edit_attention.vanilla_attention(q, q, q, 0.158)
    out = fa.flash_attention(q, q, q, 0.158, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("d", [40, 128])
def test_flash_backward_matches_reference(d):
    """The Pallas backward (dq/dk/dv) vs jax.grad of explicit attention."""
    rng = np.random.RandomState(2)
    b, h, l = 1, 2, 512
    q = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    co = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    scale = d ** -0.5

    def loss_flash(q_, k_, v_):
        out = fa.flash_attention(q_, k_, v_, scale, 256, 256, True)
        return jnp.sum(out * co)

    def loss_ref(q_, k_, v_):
        return jnp.sum(edit_attention.vanilla_attention(q_, k_, v_, scale) * co)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_flash_backward_rectangular():
    """Lq != Lk (the shared-attention case warps queries, keys stay base)."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 512, 40), jnp.float32)
    k = jnp.asarray(rng.randn(2, 256, 40), jnp.float32)
    v = jnp.asarray(rng.randn(2, 256, 40), jnp.float32)
    scale = 0.158

    def f(fn):
        def loss(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    g_flash = f(lambda a, b_, c: fa.flash_attention(a, b_, c, scale, 256, 256, True))
    g_ref = f(lambda a, b_, c: edit_attention.vanilla_attention(a, b_, c, scale))
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3)


def test_flash_forward_rectangular_short_q():
    """Lq < Lk — the warped-row CFG blend computes the shared output for a
    seq//4 row budget against the full key set (edit_attention._editor_stream)."""
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, 2, 256, 40), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 1024, 40), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 1024, 40), jnp.float32)
    scale = 0.158
    ref = edit_attention.vanilla_attention(q, k, v, scale)
    out = fa.flash_attention(q, k, v, scale, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_use_flash_routing():
    assert fa.use_flash(4096, 4096)
    assert fa.use_flash(1024, 1024)
    assert not fa.use_flash(256, 256)   # small maps: not worth it
    assert not fa.use_flash(4096, 77)   # cross attention
    # rectangular: the warped-row blend (seq//4 queries, full keys)
    assert fa.use_flash(1024, 4096)
    assert fa.use_flash(256, 1024)
    assert not fa.use_flash(100, 1024)  # non-tiling query axis
