"""Fused removal-correlation kernel vs the explicit (map-materializing) math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geodiffuser_tpu.kernels import removal_corr as rc


def _scene(rng, h, k_rows, l, lk, d, sigma=1.0):
    qe = jnp.asarray(rng.randn(h, k_rows, d) * sigma, jnp.float32)
    ke = jnp.asarray(rng.randn(h, lk, d) * sigma, jnp.float32)
    qb = jnp.asarray(rng.randn(h, l, d) * sigma, jnp.float32)
    kb = jnp.asarray(rng.randn(h, lk, d) * sigma, jnp.float32)
    inpaint = (rng.rand(l) < 0.2).astype(np.float32)
    inpaint[:4] = 1.0  # never empty
    background = ((rng.rand(l) < 0.5) & (inpaint < 0.5)).astype(np.float32)
    background[-4:] = 1.0
    return qe, ke, qb, kb, jnp.asarray(inpaint), jnp.asarray(background)


@pytest.mark.parametrize(
    "h,k_rows,l,lk,d",
    [
        (2, 64, 256, 256, 40),    # self-attention geometry
        (2, 64, 256, 77, 40),     # cross-attention (padded key lanes)
        (1, 16, 64, 64, 32),      # tiny-model shapes
    ],
)
def test_pallas_matches_xla(h, k_rows, l, lk, d):
    rng = np.random.RandomState(0)
    qe, ke, qb, kb, inp, bg = _scene(rng, h, k_rows, l, lk, d)
    scale = d ** -0.5
    ref = rc._corr_xla(qe, ke, qb, kb, inp, bg, scale)
    out = rc._corr_pallas(qe, ke, qb, kb, inp, bg, None, scale, interpret=True)
    for o, r, name in zip(out, ref, ("p_in", "p_bg", "j_in", "j_bg")):
        if o.dtype == jnp.int32:
            # indices must agree wherever the max is numerically unambiguous;
            # bf16 accumulation can flip near-ties, so compare via the values
            continue
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=2e-2, rtol=2e-2, err_msg=name
        )
    # argmax agreement: the correlation at the chosen index must match the
    # reported max (self-consistency, robust to near-ties)
    p_in, p_bg, j_in, j_bg = out
    corr = jnp.einsum(
        "hik,hjk->hij",
        rc._probs(qe, ke, scale), rc._probs(qb, kb, scale),
        preferred_element_type=jnp.float32,
    )
    got_at_idx = jnp.take_along_axis(corr, j_bg[:, :, None], axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(got_at_idx), np.asarray(p_bg), atol=2e-2, rtol=2e-2)
    assert np.all(np.asarray(inp)[np.asarray(j_in)] > 0.5)
    assert np.all(np.asarray(bg)[np.asarray(j_bg)] > 0.5)


def test_custom_backward_matches_autodiff():
    """The sparse argmax backward vs jax.grad through the explicit corr."""
    rng = np.random.RandomState(1)
    h, k_rows, l, lk, d = 2, 32, 128, 128, 24
    qe, ke, qb, kb, inp, bg = _scene(rng, h, k_rows, l, lk, d)
    scale = d ** -0.5
    dist_w = jnp.asarray(rng.rand(h, k_rows), jnp.float32)

    def loss_from(p_in, p_bg):
        eps = 1e-4
        per = dist_w * (
            -jnp.log(jnp.maximum(p_bg, 0.0) + eps) + jnp.log(jnp.maximum(p_in, 0.0) + eps)
        )
        return per.sum()

    def loss_fused(qe_, ke_):
        p_in, p_bg, _, _ = rc.removal_correlation(
            qe_, ke_, qb, kb, inp, bg, None, scale, "xla", False
        )
        return loss_from(p_in, p_bg)

    def loss_explicit(qe_, ke_):
        pe = rc._probs(qe_, ke_, scale)
        pb = jax.lax.stop_gradient(rc._probs(qb, kb, scale))
        corr = jnp.einsum("hik,hjk->hij", pe, pb, preferred_element_type=jnp.float32)
        corr = corr.astype(jnp.float32)
        p_in = jnp.max(jnp.where(inp[None, None, :] > 0.5, corr, rc.MASKED), -1)
        p_bg = jnp.max(jnp.where(bg[None, None, :] > 0.5, corr, rc.MASKED), -1)
        return loss_from(p_in, p_bg)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qe, ke)
    g_ref = jax.grad(loss_explicit, argnums=(0, 1))(qe, ke)
    for gf, gr, name in zip(g_fused, g_ref, ("dqe", "dke")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-3, rtol=3e-2, err_msg=name
        )


def test_pallas_forward_backward_pipeline():
    """Full custom-vjp through the Pallas forward (interpret mode)."""
    rng = np.random.RandomState(2)
    h, k_rows, l, lk, d = 1, 16, 64, 64, 16
    qe, ke, qb, kb, inp, bg = _scene(rng, h, k_rows, l, lk, d)
    scale = d ** -0.5

    def loss(qe_, impl):
        p_in, p_bg, _, _ = rc.removal_correlation(
            qe_, ke, qb, kb, inp, bg, None, scale, impl, True
        )
        return (
            -jnp.log(jnp.maximum(p_bg, 0.0) + 1e-4)
            + jnp.log(jnp.maximum(p_in, 0.0) + 1e-4)
        ).sum()

    v_p, g_p = jax.value_and_grad(lambda q: loss(q, "pallas"))(qe)
    v_x, g_x = jax.value_and_grad(lambda q: loss(q, "xla"))(qe)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=3e-3, rtol=3e-2)


def test_block_skip_row_mask():
    """Inactive row blocks (row_mask prefix exhausted) are skipped: their
    outputs hold the NEG_INF sentinel, active rows match the XLA path."""
    rng = np.random.RandomState(3)
    h, k_rows, l, lk, d = 2, 64, 256, 256, 40
    qe, ke, qb, kb, inp, bg = _scene(rng, h, k_rows, l, lk, d)
    scale = d ** -0.5
    # only the first 10 budget rows are real (top_k packs them first)
    row_mask = jnp.asarray((np.arange(k_rows) < 10).astype(np.float32))

    p_in, p_bg, j_in, j_bg = rc._corr_pallas(
        qe, ke, qb, kb, inp, bg, row_mask, scale, interpret=True
    )
    r_in, r_bg, _, _ = rc._corr_xla(qe, ke, qb, kb, inp, bg, scale)
    np.testing.assert_allclose(
        np.asarray(p_in[:, :10]), np.asarray(r_in[:, :10]), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(p_bg[:, :10]), np.asarray(r_bg[:, :10]), atol=2e-2, rtol=2e-2
    )
    # with 64 budget rows and <=256-row blocks there is a single block here,
    # so force multi-block skipping with a bigger budget
    k_big = 512
    qe_b = jnp.asarray(rng.randn(h, k_big, d), jnp.float32)
    rm_b = jnp.asarray((np.arange(k_big) < 100).astype(np.float32))
    p_in_b, p_bg_b, _, _ = rc._corr_pallas(
        qe_b, ke, qb, kb, inp, bg, rm_b, scale, interpret=True
    )
    r_in_b, r_bg_b, _, _ = rc._corr_xla(qe_b, ke, qb, kb, inp, bg, scale)
    np.testing.assert_allclose(
        np.asarray(p_in_b[:, :100]), np.asarray(r_in_b[:, :100]), atol=2e-2, rtol=2e-2
    )
    # rows in fully-inactive blocks (>= 256) keep the sentinel
    assert np.all(np.asarray(p_in_b[:, 256:]) <= rc.NEG_INF * 0.5)
    assert np.all(np.asarray(p_bg_b[:, 256:]) <= rc.NEG_INF * 0.5)


def test_pallas_backward_matches_xla_backward():
    """The Pallas bwd kernel vs the XLA sparse backward, incl. block
    skipping and cross-attention key padding."""
    rng = np.random.RandomState(4)
    for (h, k_rows, l, lk, d) in [(2, 64, 256, 256, 40), (2, 64, 256, 77, 40)]:
        qe, ke, qb, kb, inp, bg = _scene(rng, h, k_rows, l, lk, d)
        scale = d ** -0.5
        row_mask = jnp.asarray((np.arange(k_rows) < 40).astype(np.float32))

        # identical residuals for both backwards (the two FORWARDS may pick
        # different argmax rows on bf16 near-ties, which would legitimately
        # change the gradient)
        _, res = rc._rc_fwd(qe, ke, qb, kb, inp, bg, row_mask, scale, "xla", True)
        p_in, p_bg = res[-2], res[-1]
        g_in = jnp.where(row_mask[None, :] > 0.5,
                         -1.0 / (jnp.maximum(p_in, 0.0) + 1e-4), 0.0)
        g_bg = jnp.where(row_mask[None, :] > 0.5,
                         1.0 / (jnp.maximum(p_bg, 0.0) + 1e-4), 0.0)
        cts = (g_in, g_bg, None, None)
        out_p = rc._rc_bwd(scale, "pallas", True, res, cts)
        out_x = rc._rc_bwd(scale, "xla", True, res, cts)
        for gp, gx, name in zip(out_p[:2], out_x[:2], ("dqe", "dke")):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=3e-3, rtol=3e-2,
                err_msg=f"{name} lk={lk}",
            )
