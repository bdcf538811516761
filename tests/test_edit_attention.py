"""Edit-attention mechanism tests: routing, gradient boundaries, mask algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geodiffuser_tpu.config import EditConfig, ModelConfig
from geodiffuser_tpu.core import edit_attention, edit_state
from geodiffuser_tpu.models.unet import UNet2DCondition
from geodiffuser_tpu.ops import camera

RES = 32
H = W = 256  # image size giving latent attention res 32


@pytest.fixture(scope="module")
def masks():
    mask = jnp.zeros((H, W)).at[100:160, 100:160].set(1.0)
    tc = camera.identity_field(H, W).at[..., 0].add(0.15)
    amodal = jnp.zeros((H, W)).at[100:160, 80:180].set(1.0)
    return edit_state.build_mask_sets(mask, tc, amodal, resolutions=(RES, 16, 8, 4))


def _state(masks, **kw):
    cfg = EditConfig(num_ddim_steps=50)
    return edit_state.make_edit_state(cfg, masks, **kw)


def _qkv(key, s, heads=2, l=RES * RES, d=8, lk=None):
    lk = lk or l
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (s, heads, l, d))
    k = jax.random.normal(ks[1], (s, heads, lk, d))
    v = jax.random.normal(ks[2], (s, heads, lk, d))
    return q, k, v


def test_mask_algebra_invariants(masks):
    """process_and_cache_masks invariants (attention_processors.py:334-373)."""
    ms = masks[RES]
    bg = np.asarray(ms.background)
    inp = np.asarray(ms.inpaint)
    mnw = np.asarray(ms.mask_new_warped)
    # background is disjoint from both the inpaint region and the warped mask
    assert float((bg * inp).sum()) == 0.0
    assert float((bg * (mnw > 0.5)).sum()) == 0.0
    # the three regions cover nearly everything (boundary pixels where the
    # fractional warped mask sits near 0.5 may fall through — reference
    # behavior, attention_processors.py:351-360)
    coverage = np.clip(bg + inp + (mnw > 0.5), 0, 1).mean()
    assert coverage > 0.97, coverage
    # inpaint is inside the original mask and excludes the warped intersection
    inp = np.asarray(ms.inpaint)
    warp = np.asarray(ms.mask_warp)
    assert (inp <= (warp > 0.4) + 1e-6).all()
    # amodal ring excludes the warped mask
    am = np.asarray(ms.amodal)
    mnw = np.asarray(ms.mask_new_warped)
    assert float((am * (mnw > 0.5)).sum()) == 0.0


def test_out_of_window_self_attention_is_vanilla(masks):
    state = _state(masks, cur_step=49, use_cfg=True)  # beyond self_replace_hi=47
    q, k, v = _qkv(jax.random.PRNGKey(0), 4)
    out, loss, _ = edit_attention.edited_attention(q, k, v, is_cross=False, state=state, scale=0.35)
    ref = edit_attention.vanilla_attention(q, k, v, 0.35)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert float(loss) == 0.0


def test_vanilla_streams_untouched_in_window(masks):
    state = _state(masks, cur_step=3, use_cfg=True)
    q, k, v = _qkv(jax.random.PRNGKey(1), 4)
    out, _, _ = edit_attention.edited_attention(q, k, v, is_cross=False, state=state, scale=0.35)
    ref = edit_attention.vanilla_attention(q, k, v, 0.35)
    # streams 0..2 (uncond_base, uncond_edit, cond_base) stay vanilla
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(ref[:3]), atol=1e-5)
    # the edit stream must differ
    assert float(jnp.abs(out[3] - ref[3]).max()) > 1e-4


def test_losses_only_without_cfg(masks):
    q, k, v = _qkv(jax.random.PRNGKey(2), 2)
    st = _state(masks, cur_step=3, use_cfg=False, compute_losses=True)
    _, loss, logs = edit_attention.edited_attention(q, k, v, is_cross=False, state=st, scale=0.35)
    assert float(loss) != 0.0
    assert float(logs["num_layers"]) == 1.0
    assert float(logs["self/sim"]) > 0.0 and float(logs["cross/sim"]) == 0.0


def test_gradient_boundaries(masks):
    """Only the edit stream's query path may carry gradient; base stream and
    values are detached (attention_sharing.py:242; edit_out detached)."""
    st = _state(masks, cur_step=3, use_cfg=False, compute_losses=True)
    q, k, v = _qkv(jax.random.PRNGKey(3), 2)

    def loss_fn(q_, k_, v_):
        _, loss, _ = edit_attention.edited_attention(q_, k_, v_, is_cross=False, state=st, scale=0.35)
        return loss

    gq, gk, gv = jax.grad(loss_fn, argnums=(0, 1, 2))(q, k, v)
    assert float(jnp.abs(gq[0]).max()) == 0.0, "base stream q must be detached"
    assert float(jnp.abs(gq[1]).max()) > 0.0, "edit stream q must carry grad"
    assert float(jnp.abs(gk[0]).max()) == 0.0 and float(jnp.abs(gv[0]).max()) == 0.0


def test_remover_mode_runs_and_blends(masks):
    cfg = EditConfig(edit_type="geometry_remover", num_ddim_steps=50, obj_edit_step=0.5)
    mask = jnp.zeros((H, W)).at[100:160, 100:160].set(1.0)
    tc = camera.identity_field(H, W)
    rmasks = edit_state.build_mask_sets(mask, tc, None, resolutions=(RES, 16), mode="remover")
    q, k, v = _qkv(jax.random.PRNGKey(4), 2)
    st_early = edit_state.make_edit_state(cfg, rmasks, cur_step=3, use_cfg=False, compute_losses=True)
    out_e, loss, logs = edit_attention.edited_attention(q, k, v, is_cross=False, state=st_early, scale=0.35)
    assert float(loss) != 0.0 and bool(jnp.isfinite(out_e).all())
    assert float(logs["self/removal"]) != 0.0
    # after obj_edit_step the output blends identity attention in the mask
    st_late = edit_state.make_edit_state(cfg, rmasks, cur_step=40, use_cfg=False, compute_losses=True)
    out_l, _, _ = edit_attention.edited_attention(q, k, v, is_cross=False, state=st_late, scale=0.35)
    assert float(jnp.abs(out_l[1] - out_e[1]).max()) > 1e-4


def test_cross_attention_edits_at_every_step(masks):
    state = _state(masks, cur_step=49, use_cfg=True)  # even beyond self window
    q, k, v = _qkv(jax.random.PRNGKey(5), 4, lk=77)
    out, _, _ = edit_attention.edited_attention(q, k, v, is_cross=True, state=state, scale=0.35)
    ref = edit_attention.vanilla_attention(q, k, v, 0.35)
    assert float(jnp.abs(out[3] - ref[3]).max()) > 1e-4


@pytest.mark.fast
def test_warped_row_blend_matches_full(masks):
    """The no-loss CFG fast path (shared-attention blend restricted to the
    static warped-row budget) must be numerically identical to the full-row
    variant (full_blend=True) — the host falls back to the latter only when
    warped_overflow fires (edit_attention._editor_stream)."""
    assert masks[RES].warped_rows is not None
    assert float(masks[RES].warped_overflow) == 0.0  # fixture mask fits
    q, k, v = _qkv(jax.random.PRNGKey(9), 4)
    kw = dict(cur_step=3, use_cfg=True, compute_losses=False,
              self_window=True, past_obj_edit=False)
    st_fast = _state(masks, **kw)
    st_full = _state(masks, full_blend=True, **kw)
    assert not st_fast.full_blend and st_full.full_blend
    for is_cross in (False, True):
        qkv = _qkv(jax.random.PRNGKey(10), 4, lk=77) if is_cross else (q, k, v)
        out_f, loss_f, _ = edit_attention.edited_attention(
            *qkv, is_cross=is_cross, state=st_fast, scale=0.35)
        out_r, loss_r, _ = edit_attention.edited_attention(
            *qkv, is_cross=is_cross, state=st_full, scale=0.35)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_r), atol=2e-5, rtol=1e-4,
            err_msg=f"is_cross={is_cross}")
        assert float(loss_f) == float(loss_r) == 0.0


@pytest.mark.fast
def test_warped_overflow_flag_fires():
    """A warped mask larger than the seq//4 row budget must raise
    warped_overflow so the host switches to the exact full-blend programs."""
    mask = jnp.zeros((H, W)).at[20:236, 20:236].set(1.0)  # most of the image
    tc = camera.identity_field(H, W)
    ms = edit_state.build_mask_sets(mask, tc, mask, resolutions=(RES, 16, 8, 4))
    assert float(ms[RES].warped_overflow) == 1.0
    # and the fixture-size mask does not
    small = jnp.zeros((H, W)).at[100:160, 100:160].set(1.0)
    ms2 = edit_state.build_mask_sets(small, tc, small, resolutions=(RES, 16, 8, 4))
    assert float(ms2[RES].warped_overflow) == 0.0


def test_unet_grad_flows_only_to_edit_stream(masks):
    """End-to-end through the tiny UNet: grad of the edit loss w.r.t. the
    input latents is zero for the base stream."""
    mcfg = ModelConfig.tiny()
    unet = UNet2DCondition(mcfg)
    st = _state(masks, cur_step=3, use_cfg=False, compute_losses=True)
    sample = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 32, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(7), (2, 77, mcfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(8), sample, jnp.int32(1), ctx)

    def loss_fn(s, c):
        _, aux = unet.apply(params, s, jnp.int32(500), c, st, mutable=["edit"])
        loss, _ = edit_attention.collect_edit_aux(aux)
        return loss

    gs, gc = jax.grad(loss_fn, argnums=(0, 1))(sample, ctx)
    assert float(jnp.abs(gs[0]).max()) == 0.0
    assert float(jnp.abs(gs[1]).max()) > 0.0
    assert float(jnp.abs(gc[0]).max()) == 0.0
    assert float(jnp.abs(gc[1]).max()) > 0.0
