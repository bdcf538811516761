"""GeoDiffuser shared-attention editing as pure functions.

Functional rewrite of the reference controller stack:
  * AttentionGeometryEdit.replace_{self,cross}_attention
    (attention_processors.py:384-624)
  * AttentionGeometryRemover.replace_{self,cross}_attention
    (attention_processors.py:748-928)
  * the four edit losses (attention_processors.py:231-305) and the
    smoothness TV loss (loss.py:29-40)
  * the window/stream routing of AttentionGeometryEdit.forward
    (attention_processors.py:633-664)

Conventions (TPU-first):
  * qkv are (S, H, L, D): S = CFG streams (4: [uncond_base, uncond_edit,
    cond_base, cond_edit]; 2 without CFG: [cond_base, cond_edit]),
    H = heads.  The reference flattens heads into batch
    (attn.head_to_batch_dim); we keep an explicit axis — better layouts for
    the MXU and simpler stream slicing.
  * logits/softmax accumulate in fp32 (bf16 operands), losses in fp32.
  * gradient boundaries follow the reference exactly: the whole base stream
    is detached (get_base_edit_qkv, attention_sharing.py:242), edit_out is
    detached, only replace_out carries gradient.

Known reference defect handled here: compute_attention's two "hard
constraints" (attention_sharing.py:37-42) assign through chained boolean
indexing, which mutates a copy — a silent no-op in torch.  We implement the
*intent* behind `state.apply_constraints` (default False = reference
behavior).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from geodiffuser_tpu.core.edit_state import EditState, MaskSet
from geodiffuser_tpu.ops import image as image_ops
from geodiffuser_tpu.ops import splat as splat_ops

sg = jax.lax.stop_gradient

LOG_KEYS = ("sim", "movement", "removal", "smoothness", "amodal")


def collect_edit_aux(aux_cols) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum the per-layer sown losses/logs from apply(..., mutable=['edit']).

    Functional replacement for `controller.loss` / `controller.loss_log_dict`
    accumulation (attention_processors.py:494-498, 604-608).
    """
    import flax.traverse_util as tu

    flat = tu.flatten_dict(aux_cols["edit"])
    loss = jnp.float32(0.0)
    logs = zero_logs()
    for key, val in flat.items():
        if key[-1] == "loss":
            loss = loss + val
        elif key[-2] == "logs":
            logs[key[-1]] = logs[key[-1]] + val
    return loss, logs


def normalize_logs(logs) -> Dict[str, jnp.ndarray]:
    """Per-layer average of the logged loss components, like
    convert_loss_log_to_numpy's division by num_layers.  Works on jnp or
    python-float dicts."""
    n = max(float(logs.get("num_layers", 0.0)), 1.0) if not hasattr(
        logs.get("num_layers", 0.0), "dtype"
    ) else jnp.maximum(logs["num_layers"], 1.0)
    return {k: (v / n if k != "num_layers" else v) for k, v in logs.items()}


def zero_logs() -> Dict[str, jnp.ndarray]:
    logs = {f"{b}/{k}": jnp.float32(0.0) for b in ("self", "cross") for k in LOG_KEYS}
    logs["num_layers"] = jnp.float32(0.0)
    return logs


def attn_probs(
    q: jnp.ndarray, k: jnp.ndarray, scale: float, out_dtype=jnp.float32
) -> jnp.ndarray:
    """softmax(q k^T * scale) with fp32 accumulation.  (.., Lq, D) x (.., Lk, D).

    out_dtype=bf16 halves the HBM footprint of materialized maps in the loss
    layers (softmax itself is computed in fp32)."""
    logits = jnp.einsum("...id,...jd->...ij", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits * scale, axis=-1).astype(out_dtype)


def attn_out(probs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum(
        "...ij,...jd->...id", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def vanilla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    return attn_out(attn_probs(q, k, scale), v)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def fast_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, allow_flash: bool
) -> jnp.ndarray:
    """Vanilla attention, routed through the Pallas flash kernel on TPU when
    the map is large (kernels/flash_attention.py).  Safe on differentiated
    paths: the backward is also a Pallas flash kernel."""
    from geodiffuser_tpu.kernels import flash_attention as fa

    lq, lk = q.shape[-2], k.shape[-2]
    if allow_flash and _on_tpu() and fa.use_flash(lq, lk):
        return fa.flash_attention(q, k, v, scale)
    return vanilla_attention(q, k, v, scale)


def _gather_rows(x: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """(H, L, D)[:, rows] as one gather."""
    return jnp.take(x, rows, axis=1)


# ---------------------------------------------------------------------------
# Losses (all fp32; masks are flattened (L,) floats)
# ---------------------------------------------------------------------------

def background_preservation_loss(
    edit_out: jnp.ndarray, replace_out: jnp.ndarray, mask_bg: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Masked L1 between detached shared-attention output and the live edit
    output over the background (attention_processors.py:231-246)."""
    diff = jnp.abs(sg(edit_out).astype(jnp.float32) - replace_out.astype(jnp.float32))
    num = (diff * mask_bg[None, :, None]).sum()
    h, _, d = replace_out.shape
    return num / (mask_bg.sum() * h * d + eps)


def object_placement_loss(
    edit_out: jnp.ndarray, replace_out: jnp.ndarray, mask_edit: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Masked L1 inside the warped object mask (attention_processors.py:283-287)."""
    return background_preservation_loss(edit_out, replace_out, mask_edit, eps)


def _removal_per_row_loss(p_in, p_bg, d_bg, row_mask, inpaint_sum, h, eps=1e-4):
    """Distance-weighted log-ratio reduction shared by both removal paths
    (attention_processors.py:263-268)."""
    w = sg(jnp.exp(-d_bg))
    per_row = w * (
        -jnp.log(jnp.maximum(p_bg, 0.0) + eps) + jnp.log(jnp.maximum(p_in, 0.0) + eps)
    )
    return (per_row * row_mask[None, :]).sum() / (inpaint_sum * h + 1e-8)


def removal_loss_fused(
    q_e: jnp.ndarray, k_r: jnp.ndarray, q_b: jnp.ndarray, k_b: jnp.ndarray,
    ms: MaskSet, scale: float,
) -> jnp.ndarray:
    """Removal correlation loss via the fused Pallas kernel
    (kernels/removal_corr.py): neither attention map nor the correlation
    matrix is materialized in HBM, and the backward touches only the two
    argmax base rows per inpaint row.  Semantics match `removal_loss`
    (attention_processors.py:248-280) under the static row budget."""
    from geodiffuser_tpu.kernels import removal_corr as rc

    h = q_e.shape[0]
    rows, row_mask = ms.inpaint_rows, ms.inpaint_row_mask
    qe_rows = q_e[:, rows]
    p_in, p_bg, _, j_bg = rc.removal_correlation(
        qe_rows, k_r, sg(q_b), sg(k_b), ms.inpaint, ms.background, row_mask, scale
    )
    # distance weights from pixel positions on the fly (the dense (L, L)
    # grid cost ~6 ms/step of row slicing in the compiled program)
    d_bg = jnp.sqrt(
        ((ms.pos[rows][None] - ms.pos[j_bg]) ** 2).sum(-1) + 1e-12
    )                                                    # (h, K)
    return _removal_per_row_loss(p_in, p_bg, d_bg, row_mask, ms.inpaint.sum(), h)


def removal_loss(
    probs_rows: jnp.ndarray,
    base_probs: jnp.ndarray,
    ms: MaskSet,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Correlation loss steering inpaint-region attention toward background.

    For each inpaint query row, correlate its attention distribution with
    every *base* query's distribution; maximize the best background match
    (distance-weighted) and minimize the best inpaint match
    (attention_processors.py:248-280).

    Explicit (map-materializing) formulation, used only on the
    `apply_constraints` path where the probability maps exist anyway; the
    default path uses `removal_loss_fused`.

    Static-shape reformulation: probs_rows holds only a static budget of
    inpaint rows (precomputed per edit, edit_state.build_mask_sets) — the
    full edit-attention map is never materialized; normalization keeps the
    full inpaint mask sum (exact parity while the budget holds, documented
    truncation otherwise).
    """
    h = probs_rows.shape[0]
    rows, row_mask = ms.inpaint_rows, ms.inpaint_row_mask
    corr = jnp.einsum(
        "hik,hjk->hij", probs_rows, sg(base_probs), preferred_element_type=jnp.float32
    ).astype(jnp.float32)                                # (h, K, L)
    neg = -1e9
    corr_in = jnp.where(ms.inpaint[None, None, :] > 0.5, corr, neg)
    corr_bg = jnp.where(ms.background[None, None, :] > 0.5, corr, neg)
    # reference multiplies by the mask instead of masking out; for max() the
    # two agree whenever any masked correlation is positive (softmax rows are
    # non-negative, so best matches are > 0); where() is safe against all-zero
    # rows which would otherwise pick an arbitrary unmasked column.
    p_in = jnp.max(corr_in, axis=-1)
    p_bg = jnp.max(corr_bg, axis=-1)
    j_bg = jnp.argmax(corr_bg, axis=-1)                  # (h, K)
    # distance weights from pixel positions on the fly (the dense (L, L)
    # grid cost ~6 ms/step of row slicing in the compiled program)
    d_bg = jnp.sqrt(
        ((ms.pos[rows][None] - ms.pos[j_bg]) ** 2).sum(-1) + 1e-12
    )                                                    # (h, K)
    return _removal_per_row_loss(p_in, p_bg, d_bg, row_mask, ms.inpaint.sum(), h, eps)


def interpolate_from_mask(
    features: jnp.ndarray, fg_mask: jnp.ndarray, distance: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-distance top-4 interpolation of foreground features
    (attention_sharing.py:67-105).

    Args:
        features: (H, L, D); fg_mask: (L,); distance: (L, L).
    Returns:
        interpolated (H, L, D), per-row confidence weights (L,).
    """
    d_new = distance * (512.0 / 2.0) + 1e5 * (1.0 - (fg_mask > 0.5).astype(jnp.float32))[None, :]
    inv = 1.0 / (d_new + 1e-4)  # (L, L)
    vals, idx = jax.lax.top_k(inv, 4)  # (L, 4)
    feats = features[:, idx, :]  # (H, L, 4, D)
    interp = (feats * vals[None, :, :, None]).sum(-2) / (vals.sum(-1)[None, :, None] + 1e-12)
    weights = jnp.exp(-(1.0 / jnp.max(vals, axis=-1)) / 5.0)  # (L,)
    return interp, weights


def smooth_attention_features(features: jnp.ndarray) -> jnp.ndarray:
    """5x5 Gaussian blur of per-head feature maps (generic_torch.py:145-154)."""
    h, l, d = features.shape
    res = int(math.isqrt(l))
    maps = features.transpose(0, 2, 1).reshape(h * d, res, res)
    maps = image_ops.gaussian_smooth_2d(maps, size=5)
    return maps.reshape(h, d, l).transpose(0, 2, 1)


def amodal_loss(
    edit_out: jnp.ndarray,
    replace_out: jnp.ndarray,
    ms: MaskSet,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Fill the amodal ring by nearest-foreground interpolation and pull the
    edit output toward it (attention_processors.py:289-305).  Interpolation
    sources/weights are precomputed per edit (edit_state.build_mask_sets)."""
    e = sg(edit_out).astype(jnp.float32)
    feats = e[:, ms.interp_idx, :]                               # (H, L, 4, D)
    vals = ms.interp_vals
    interp = (feats * vals[None, :, :, None]).sum(-2) / (
        vals.sum(-1)[None, :, None] + 1e-12
    )
    w = ms.interp_w
    interp = jnp.where((ms.mask_new_warped > 0.5)[None, :, None], e, interp)
    interp = smooth_attention_features(interp)
    diff = jnp.abs(sg(interp) - replace_out.astype(jnp.float32))
    wm = (w * ms.amodal)[None, :, None]
    h, _, d = replace_out.shape
    return (diff * wm).sum() / ((w * ms.amodal).sum() * h * d + eps)


def smoothness_loss(replace_out: jnp.ndarray) -> jnp.ndarray:
    """Total variation of the edit output over the spatial grid (loss.py:29-40)."""
    h, l, d = replace_out.shape
    res = int(math.isqrt(l))
    r = replace_out.astype(jnp.float32).reshape(h, res, res, d)
    dh = jnp.abs(r[:, 1:, :, :] - r[:, :-1, :, :]).mean()
    dw = jnp.abs(r[:, :, 1:, :] - r[:, :, :-1, :]).mean()
    return dh + dw


# ---------------------------------------------------------------------------
# Edit-stream attention
# ---------------------------------------------------------------------------

def _warp_queries(q_base: jnp.ndarray, ms: MaskSet, state: EditState) -> jnp.ndarray:
    """Warp the base query field by the transform coordinates inside the
    warped mask: q <- q*(1-m) + m*splat(q) (attention_processors.py:423-424,
    543-545).  Fully detached, as in the reference.

    Uses the precomputed dense warp operator (one MXU matmul) when the state
    carries one; falls back to the scatter splat otherwise.

    The matmul runs in the model dtype (bf16 on TPU, f32 accumulation on
    the MXU): q_base IS bf16 and the blend result is cast back to bf16
    either way, so only the operator weights' bf16 rounding (~0.4% on
    normalized splat weights) is an approximation — below the fp16
    precision the reference computes attention at.  Profiled: the five
    64^2-layer f32 warp matmuls were ~21 ms of the 89 ms optimize step."""
    h, l, d = q_base.shape
    res = int(math.isqrt(l))
    q_img = q_base.transpose(1, 0, 2).reshape(res, res, h * d)
    if state.warp_mats is not None and res in state.warp_mats:
        q_warp = splat_ops.apply_warp_matrix(
            state.warp_mats[res].astype(q_img.dtype), q_img
        )
    else:
        q_warp = splat_ops.splat_image(
            q_img.astype(jnp.float32), ms.t_coords, radius=state.splat_radius,
            tau=state.splat_tau, z_beta=state.z_beta,
        )
    m = ms.mask_new_warped_2d[..., None]
    out = q_img.astype(jnp.float32) * (1.0 - m) + m * q_warp.astype(jnp.float32)
    return sg(out.reshape(l, h, d).transpose(1, 0, 2).astype(q_base.dtype))


def _warp_queries_rows(
    q_base: jnp.ndarray, ms: MaskSet, state: EditState, rows: jnp.ndarray
) -> jnp.ndarray:
    """`_warp_queries` restricted to a static row budget: the warp operator's
    rows are gathered BEFORE the matmul, so the splat costs K/L of the full
    apply.  Returns (H, K, D), detached."""
    h, l, d = q_base.shape
    res = int(math.isqrt(l))
    q_flat = q_base.transpose(1, 0, 2).reshape(l, h * d)
    if state.warp_mats is not None and res in state.warp_mats:
        w_rows = jnp.take(state.warp_mats[res], rows, axis=0)       # (K, L)
        q_warp = jnp.dot(
            w_rows.astype(q_flat.dtype), q_flat,
            preferred_element_type=jnp.float32,
        )                                                           # (K, H*D)
    else:
        q_img = q_flat.reshape(res, res, h * d)
        q_warp = splat_ops.splat_image(
            q_img.astype(jnp.float32), ms.t_coords, radius=state.splat_radius,
            tau=state.splat_tau, z_beta=state.z_beta,
        ).reshape(l, h * d)[rows]
    m = ms.mask_new_warped[rows][:, None]
    out = q_flat[rows].astype(jnp.float32) * (1.0 - m) + m * q_warp.astype(jnp.float32)
    k = rows.shape[0]
    return sg(out.reshape(k, h, d).transpose(1, 0, 2).astype(q_base.dtype))


def _constraint_bias(ms: MaskSet, lk: int) -> jnp.ndarray:
    """Additive -1000 bias implementing the *intended* self-attention
    constraints of compute_attention (attention_sharing.py:37-42)."""
    rows_fgw = ms.mask_new_warped >= 0.5
    cols_not_fg = ms.mask_warp < 0.5
    rows_bg = ms.background >= 0.5
    cols_fg = ms.mask_warp >= 0.5
    bias = jnp.where(rows_fgw[:, None] & cols_not_fg[None, :lk], -1000.0, 0.0)
    bias = bias + jnp.where(rows_bg[:, None] & cols_fg[None, :lk], -1000.0, 0.0)
    return bias


def _branch_logs(is_cross: bool, **vals) -> Dict[str, jnp.ndarray]:
    logs = zero_logs()
    prefix = "cross" if is_cross else "self"
    for k, v in vals.items():
        logs[f"{prefix}/{k}"] = jnp.asarray(v, jnp.float32)
    logs["num_layers"] = jnp.float32(1.0)
    return logs


def _editor_stream(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    is_cross: bool,
    state: EditState,
    ms: MaskSet,
    scale: float,
):
    """AttentionGeometryEdit edit-stream output + losses
    (attention_processors.py:384-624)."""
    b_i, e_i = state.base_idx, state.edit_idx
    q_b, k_b, v_b = sg(q[b_i]), sg(k[b_i]), sg(v[b_i])
    q_e = q[e_i]

    # Live edit-stream keys: self uses base keys, cross uses edit keys
    # (attention_processors.py:432,555); values always from the base stream.
    k_r = k[e_i] if is_cross else k_b

    # No-loss blend fast path (CFG steps): the detached shared-attention
    # output feeds `shared = edit_out*m + replace_out*(1-m)` only where the
    # warped mask is positive, so both the query warp and its attention run
    # over the static warped-row budget (seq//4) instead of all rows.  The
    # host selects the exact full-row variant (full_blend=True) whenever a
    # resolution's warped_overflow fires — identical math in either case.
    if (
        not state.compute_losses
        and state.past_obj_edit is False
        and not state.full_blend
        and ms.warped_rows is not None
        and not state.apply_constraints
    ):
        rows = ms.warped_rows
        q_eb_rows = _warp_queries_rows(q_b, ms, state, rows)
        edit_rows = sg(fast_attention(q_eb_rows, k_b, v_b, scale, allow_flash=True))
        replace_out = fast_attention(q_e, k_r, v_b, scale, allow_flash=True)
        rep_rows = _gather_rows(replace_out, rows)
        m_rows = ms.mask_new_warped[rows][None, :, None].astype(replace_out.dtype)
        # padded budget rows carry mask weight 0 -> the blend is a no-op there
        blend = edit_rows.astype(replace_out.dtype) * m_rows + rep_rows * (1.0 - m_rows)
        out = replace_out.at[:, rows].set(blend)
        return out, jnp.float32(0.0), zero_logs()

    # Shared (reference-warped) attention output — fully detached.  The
    # query field is warped spatially for both self and cross layers
    # (keys are text tokens in the cross case).
    q_eb = _warp_queries(q_b, ms, state)
    # Outputs go through flash in BOTH passes (forward and backward are real
    # Pallas kernels); the removal loss routes through the fused correlation
    # kernel — no attention map is ever materialized on the default path.
    use_explicit = state.apply_constraints and not is_cross
    if use_explicit:
        logits = jnp.einsum(
            "hid,hjd->hij", q_e, k_r, preferred_element_type=jnp.float32
        ) * scale
        logits = logits + _constraint_bias(ms, logits.shape[-1])[None]
        replace_probs_full = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        replace_out = attn_out(replace_probs_full, v_b)
        probs_rows = replace_probs_full[:, ms.inpaint_rows] if state.compute_losses else None
        edit_out = sg(fast_attention(q_eb, k_b, v_b, scale, allow_flash=True))
    else:
        edit_out = sg(fast_attention(q_eb, k_b, v_b, scale, allow_flash=True))
        replace_out = fast_attention(q_e, k_r, v_b, scale, allow_flash=True)

    loss = jnp.float32(0.0)
    logs = zero_logs()
    l = q.shape[2]
    if state.compute_losses and l >= state.loss_min_seq:
        w = state.weights_cross if is_cross else state.weights_self
        sim = background_preservation_loss(edit_out, replace_out, ms.background)
        movement = object_placement_loss(edit_out, replace_out, ms.mask_new_warped)
        if use_explicit:
            base_probs = attn_probs(q_b, k_b, scale, out_dtype=jnp.bfloat16)
            removal = removal_loss(probs_rows, base_probs, ms)
        else:
            removal = removal_loss_fused(q_e, k_r, q_b, k_b, ms, scale)
        smooth = smoothness_loss(replace_out)
        if l >= state.amodal_min_seq:
            amodal = amodal_loss(edit_out, replace_out, ms)
        else:
            # amodal loss is zeroed at 32^2 (attention_processors.py:479-480)
            amodal = jnp.float32(0.0)
        loss = (
            w["sim"] * sim
            + w["movement"] * movement
            + w["removal"] * removal
            + w["smoothness"] * smooth
            + w["amodal"] * amodal
        )
        logs = _branch_logs(
            is_cross, sim=sim, movement=movement, removal=removal, smoothness=smooth, amodal=amodal
        )

    # Attention sharing vs diffusion correction (attention_processors.py:502-508).
    # With a static phase flag the untaken side is deleted at compile time
    # (past the obj-edit step the query warp + shared attention feed nothing
    # when losses are off); None falls back to the traced select.
    if state.past_obj_edit is True and not state.compute_losses:
        return replace_out, loss, logs
    m_e = ms.mask_new_warped[None, :, None].astype(replace_out.dtype)
    shared = sg(edit_out) * m_e + replace_out * (1.0 - m_e)
    if state.past_obj_edit is True:
        out = replace_out
    elif state.past_obj_edit is False:
        out = shared
    else:
        out = jnp.where(state.cur_step < state.obj_edit_thresh, shared, replace_out)
    return out, loss, logs


def _remover_stream(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    is_cross: bool,
    state: EditState,
    ms: MaskSet,
    scale: float,
    base_out: jnp.ndarray,
):
    """AttentionGeometryRemover edit-stream output + losses
    (attention_processors.py:748-928)."""
    b_i, e_i = state.base_idx, state.edit_idx
    q_b, k_b, v_b = sg(q[b_i]), sg(k[b_i]), sg(v[b_i])
    q_e = q[e_i]

    edit_out = sg(base_out)  # the base stream's vanilla output

    replace_out = fast_attention(q_e, k_b, v_b, scale, allow_flash=True)

    loss = jnp.float32(0.0)
    logs = zero_logs()
    l = q.shape[2]
    if state.compute_losses and l >= state.loss_min_seq:
        w = state.weights_cross if is_cross else state.weights_self
        sim = background_preservation_loss(edit_out, replace_out, ms.background)
        removal = removal_loss_fused(q_e, k_b, q_b, k_b, ms, scale)
        smooth = smoothness_loss(replace_out)
        loss = w["sim"] * sim + w["removal"] * removal + w["smoothness"] * smooth
        logs = _branch_logs(is_cross, sim=sim, removal=removal, smoothness=smooth)

    # After obj_edit_step, blend identity attention inside the inpaint mask
    # (attention_processors.py:831-834, 922-925).
    def with_identity(_):
        id_out = fast_attention(q_e, k[e_i], v[e_i], scale, allow_flash=True)
        m_in = ms.inpaint[None, :, None].astype(replace_out.dtype)
        m_bg = ms.background[None, :, None].astype(replace_out.dtype)
        return id_out * m_in + replace_out * m_bg

    def without_identity(_):
        m_in = ms.inpaint[None, :, None].astype(replace_out.dtype)
        m_bg = ms.background[None, :, None].astype(replace_out.dtype)
        return replace_out * m_in + replace_out * m_bg

    if state.past_obj_edit is True:
        out = with_identity(None)
    elif state.past_obj_edit is False:
        out = without_identity(None)
    else:
        out = jax.lax.cond(
            state.cur_step < state.obj_edit_thresh, without_identity, with_identity, None
        )
    return out, loss, logs


# ---------------------------------------------------------------------------
# Top-level routing
# ---------------------------------------------------------------------------

def edited_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    is_cross: bool,
    state: EditState,
    scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full edited multi-stream attention.

    Routing (AttentionGeometryEdit.forward, attention_processors.py:633-664):
    cross-attention layers are always edited; self-attention layers only
    while self_replace_lo <= cur_step < self_replace_hi, otherwise all
    streams get vanilla attention.  Under CFG the uncond streams and the
    cond base stream are always vanilla; only the cond edit stream is
    replaced.

    Returns (out (S,H,L,D), total_loss scalar, logs dict).
    """
    s, h, l, d = q.shape
    res = int(math.isqrt(l))
    n_van = state.n_vanilla_streams  # reference computes vanilla for streams
    # [0:coords_base[1]] only (attention_processors.py:643-647); the edit
    # stream's vanilla is needed only outside the self-replace window and is
    # computed inside that branch.

    if res * res != l or res not in state.masks:
        out_v = fast_attention(q, k, v, scale, allow_flash=True)
        return out_v, jnp.float32(0.0), zero_logs()
    ms = state.masks[res]

    out_v = fast_attention(q[:n_van], k[:n_van], v[:n_van], scale, allow_flash=True)

    def do_edit(_):
        if state.mode == "remover":
            return _remover_stream(
                q, k, v, is_cross, state, ms, scale, out_v[state.base_idx]
            )
        return _editor_stream(q, k, v, is_cross, state, ms, scale)

    def no_edit(_):
        return (
            fast_attention(
                q[state.edit_idx : state.edit_idx + 1],
                k[state.edit_idx : state.edit_idx + 1],
                v[state.edit_idx : state.edit_idx + 1],
                scale, allow_flash=True,
            )[0],
            jnp.float32(0.0),
            zero_logs(),
        )

    if is_cross or state.self_window is True:
        out_e, loss, logs = do_edit(None)
    elif state.self_window is False:
        out_e, loss, logs = no_edit(None)
    else:
        in_window = (state.self_replace_lo <= state.cur_step) & (
            state.cur_step < state.self_replace_hi
        )
        out_e, loss, logs = jax.lax.cond(in_window, do_edit, no_edit, None)

    out = jnp.concatenate([out_v, out_e[None]], axis=0)
    return out, loss, logs
