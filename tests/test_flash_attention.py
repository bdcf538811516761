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


def test_use_flash_routing():
    assert fa.use_flash(4096, 4096)
    assert fa.use_flash(1024, 1024)
    assert not fa.use_flash(256, 256)   # small maps: not worth it
    assert not fa.use_flash(4096, 77)   # cross attention
