"""DDIM schedule parity tests vs independently-computed closed forms."""

import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.config import SchedulerConfig
from geodiffuser_tpu.core import scheduler


import pytest

pytestmark = [pytest.mark.fast, pytest.mark.smoke]


def _ref_alphas():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    return np.cumprod(1 - betas)


def test_schedule_values():
    s = scheduler.make_schedule(SchedulerConfig())
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), _ref_alphas(), rtol=1e-6)
    np.testing.assert_allclose(float(s.final_alpha_cumprod), _ref_alphas()[0], rtol=1e-6)


def test_timestep_spacing():
    ts = scheduler.timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    inv = scheduler.inverse_timesteps(50)
    assert inv[0] == 0 and inv[-1] == 980
    np.testing.assert_array_equal(inv, ts[::-1])


def test_invert_then_denoise_roundtrip_constant_eps():
    """With a fixed eps-oracle, inverse then forward DDIM must reconstruct the
    sample exactly (the closed forms are mutual inverses)."""
    s = scheduler.make_schedule()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(4, 4), jnp.float32)
    n = 50
    x = x0
    for t in scheduler.inverse_timesteps(n):
        x = scheduler.ddim_inverse_step(s, eps, jnp.int32(t), x, n)
    for t in scheduler.timesteps(n):
        x = scheduler.ddim_step(s, eps, jnp.int32(t), x, n)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddim_step_matches_reference_formula():
    """One step vs a hand-written prev_step (inversion.py:47-55)."""
    s = scheduler.make_schedule()
    ac = _ref_alphas()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 2).astype(np.float32)
    eps = rng.randn(2, 2).astype(np.float32)
    t, ratio = 500, 20
    a_t, a_prev = ac[t], ac[t - ratio]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    got = scheduler.ddim_step(s, jnp.asarray(eps), jnp.int32(t), jnp.asarray(x), 50)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)
    # t=0 edge: previous alpha falls back to final_alpha_cumprod = ac[0]
    a_t, a_prev = ac[0], ac[0]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected0 = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    got0 = scheduler.ddim_step(s, jnp.asarray(eps), jnp.int32(0), jnp.asarray(x), 50)
    np.testing.assert_allclose(np.asarray(got0), expected0, rtol=1e-5)
