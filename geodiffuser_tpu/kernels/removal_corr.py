"""Fused Pallas kernel for the GeoDiffuser removal-correlation loss.

The removal loss (reference attention_processors.py:248-280,
`removal_loss_geodiff`) correlates each inpaint-region attention row of the
edit stream with every base-stream attention row:

    corr[i, j] = sum_k P_edit[i, k] * P_base[j, k]
    p_in[i], j_in[i] = max/argmax_j of corr masked to inpaint columns
    p_bg[i], j_bg[i] = max/argmax_j of corr masked to background columns

The naive formulation materializes P_base (H, L, L) and corr (H, K, L) in
HBM, and its autodiff backward multiplies a *dense* (mostly-zero) cotangent
back through the corr matmul — at 64^2 resolution that is ~0.5 GB of HBM
traffic and an extra 275 GFLOP matmul per layer per optimize step.

This kernel fuses everything: both softmaxes are computed online
(flash-style running max/denominator), the correlation tile is accumulated
on the MXU in bf16 (matching the bf16 probability maps of the XLA path),
and the masked max/argmax over base rows j reduces in VMEM.  Only the
(H, K) maxima and argmax indices leave the chip.

The backward exploits the analytic sparsity of max: only TWO base rows per
inpaint row (the argmax winners) carry gradient, so it recomputes exactly
those rows' probabilities — (H, K, Lk) work instead of (H, K, L) @ (H, L, Lk).
The base stream is detached in the reference (attention_sharing.py:242), so
q_base / k_base receive zero cotangents by construction.

Grid iteration order (h, i, j, k): k innermost accumulates the correlation
tile; j next reduces the running max; outputs for a given (h, i) block stay
resident in VMEM across the whole (j, k) sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
MASKED = -1e9  # filler for mask-excluded correlations (edit_attention.py)


def _corr_kernel(
    active_ref,
    qe_ref, ke_ref, qb_ref, kb_ref, inp_ref, bg_ref,
    p_in_ref, j_in_ref, p_bg_ref, j_bg_ref,
    c_scr, me_scr, le_scr, mb_scr, lb_scr,
    *, scale, k_steps, j_steps, block_j, lk_valid, block_k,
):
    i_i = pl.program_id(1)
    j_i = pl.program_id(2)
    k_i = pl.program_id(3)

    @pl.when((j_i == 0) & (k_i == 0))
    def _init_out():
        p_in_ref[:] = jnp.full_like(p_in_ref, NEG_INF)
        p_bg_ref[:] = jnp.full_like(p_bg_ref, NEG_INF)
        j_in_ref[:] = jnp.zeros_like(j_in_ref)
        j_bg_ref[:] = jnp.zeros_like(j_bg_ref)

    # Row-block activity (scalar-prefetched): the static row budget is sized
    # for the worst case (seq//2 remover), but top_k puts all REAL inpaint
    # rows first, so typical edits fill only the first block(s).  Skipping
    # the whole (j, k) sweep for inactive blocks makes the kernel cost
    # proportional to the actual mask, not the budget.
    @pl.when(active_ref[i_i] > 0)
    def _work():
        @pl.when(k_i == 0)
        def _init_acc():
            c_scr[:] = jnp.zeros_like(c_scr)
            me_scr[:] = jnp.full_like(me_scr, NEG_INF)
            le_scr[:] = jnp.zeros_like(le_scr)
            mb_scr[:] = jnp.full_like(mb_scr, NEG_INF)
            lb_scr[:] = jnp.zeros_like(lb_scr)

        qe = qe_ref[0]                                      # (BI, Dp)
        ke = ke_ref[0]                                      # (BK, Dp)
        qb = qb_ref[0]                                      # (BJ, Dp)
        kb = kb_ref[0]                                      # (BK, Dp)

        # key-column validity (cross-attention pads Lk=77 to 128 lanes)
        col = k_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, ke.shape[0]), 1)
        col_ok = col < lk_valid                             # (1, BK)

        def online(q, k, m_scr, l_scr):
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale                                       # (B, BK)
            s = jnp.where(col_ok, s, NEG_INF)
            m_prev = m_scr[:]                               # (B, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s - m_new)                          # (B, BK); invalid cols -> 0
            alpha = jnp.exp(m_prev - m_new)                 # (B, 1)
            l_scr[:] = alpha * l_scr[:] + jnp.sum(e, axis=-1, keepdims=True)
            m_scr[:] = m_new
            return e, alpha

        e_e, alpha_e = online(qe, ke, me_scr, le_scr)
        e_b, alpha_b = online(qb, kb, mb_scr, lb_scr)

        # both running maxes may move: rescale the prior accumulation by
        # alpha_e per row (edit axis) AND alpha_b per column (base axis)
        c_scr[:] = c_scr[:] * alpha_e * alpha_b[:, 0][None, :] + jax.lax.dot_general(
            e_e.astype(jnp.bfloat16), e_b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )

        @pl.when(k_i == k_steps - 1)
        def _reduce():
            corr = c_scr[:] / (le_scr[:] * lb_scr[:][:, 0][None, :])   # (BI, BJ)
            bi, bj = corr.shape
            col_j = jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
            j_glob = j_i * block_j + col_j

            def merge(mask_row, p_ref, j_ref):
                cm = jnp.where((mask_row > 0.5)[None, :], corr, MASKED)
                m = jnp.max(cm, axis=-1, keepdims=True)                 # (BI, 1)
                # first-occurrence argmax (torch semantics)
                idx = jnp.min(
                    jnp.where(cm == m, j_glob, jnp.int32(2**30)), axis=-1, keepdims=True
                )
                cur = p_ref[0]
                better = m > cur
                p_ref[0] = jnp.where(better, m, cur)
                j_ref[0] = jnp.where(better, idx, j_ref[0])

            merge(inp_ref[0], p_in_ref, j_in_ref)
            merge(bg_ref[0], p_bg_ref, j_bg_ref)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_block(n, pref):
    b = min(pref, n)
    while n % b:
        b //= 2
    return max(b, 1)


def _corr_pallas(qe, ke, qb, kb, inpaint, background, row_mask, scale,
                 interpret, block_i: int = 256, block_j: int = 1024,
                 block_k: int = 1024):
    """Block defaults (256, 1024, 1024) from scripts/tpu_corr_sweep.py on
    v5e at the 64^2 shapes: the wider (j, k) tiles quarter the number of
    online-softmax rescale visits per output block — measured -32% (editor
    K=1024) and -34% (remover K=2048) vs the old (256, 512, 512) at
    realistic active-row prefixes.  bi stays 256: the activity skip's
    granularity (cost tracks the real mask, not the budget) beats the
    fewer-base-softmax-passes of larger bi, and bi>=512 with bj=1024
    exceeds VMEM."""
    h, k_rows, d = qe.shape
    l = qb.shape[1]
    lk = ke.shape[1]

    # Head dim stays NATIVE (40/80/160): the MXU pads its contraction wave
    # either way, but HBM-padding d to 128 materialized 3.2x the bytes at
    # the 64^2 layers.  Only the key SEQUENCE axis is padded (cross keys are
    # Lk=77; masked by col_ok in-kernel).
    lk_pad = ((lk + 127) // 128) * 128
    qe_p = qe
    qb_p = qb
    ke_p = _pad_to(ke, 1, 128)
    kb_p = _pad_to(kb, 1, 128)
    # pad the inpaint-row axis to the sublane multiple; padded rows produce
    # garbage maxima that the caller's row mask zeroes out of the loss
    qe_p = _pad_to(qe_p, 1, 8)
    kp = qe_p.shape[1]

    bi = _pick_block(kp, block_i)
    bj = _pick_block(l, block_j)
    bk = _pick_block(lk_pad, block_k)
    j_steps = l // bj
    k_steps = lk_pad // bk
    grid = (h, kp // bi, j_steps, k_steps)

    inp2 = inpaint.reshape(1, l).astype(jnp.float32)
    bg2 = background.reshape(1, l).astype(jnp.float32)

    # per-i-block activity flags (scalar-prefetched): top_k ordering packs
    # the real inpaint rows first, so block activity is a prefix
    if row_mask is None:
        active = jnp.ones((kp // bi,), jnp.int32)
    else:
        rm = jnp.pad(row_mask.reshape(-1), (0, kp - k_rows))
        active = (rm.reshape(kp // bi, bi).max(axis=1) > 0.5).astype(jnp.int32)

    kern = functools.partial(
        _corr_kernel, scale=scale, k_steps=k_steps, j_steps=j_steps,
        block_j=bj, lk_valid=lk, block_k=bk,
    )
    p_in, j_in, p_bg, j_bg = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bi, d), lambda h_, i, j, k, s: (h_, i, 0)),
                pl.BlockSpec((1, bk, d), lambda h_, i, j, k, s: (h_, k, 0)),
                pl.BlockSpec((1, bj, d), lambda h_, i, j, k, s: (h_, j, 0)),
                pl.BlockSpec((1, bk, d), lambda h_, i, j, k, s: (h_, k, 0)),
                pl.BlockSpec((1, bj), lambda h_, i, j, k, s: (0, j)),
                pl.BlockSpec((1, bj), lambda h_, i, j, k, s: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, bi, 1), lambda h_, i, j, k, s: (h_, i, 0)),
                pl.BlockSpec((1, bi, 1), lambda h_, i, j, k, s: (h_, i, 0)),
                pl.BlockSpec((1, bi, 1), lambda h_, i, j, k, s: (h_, i, 0)),
                pl.BlockSpec((1, bi, 1), lambda h_, i, j, k, s: (h_, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bi, bj), jnp.float32),
                pltpu.VMEM((bi, 1), jnp.float32),
                pltpu.VMEM((bi, 1), jnp.float32),
                pltpu.VMEM((bj, 1), jnp.float32),
                pltpu.VMEM((bj, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((h, kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, kp, 1), jnp.int32),
            jax.ShapeDtypeStruct((h, kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, kp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(active, qe_p, ke_p, qb_p, kb_p, inp2, bg2)
    return (
        p_in[:, :k_rows, 0], p_bg[:, :k_rows, 0],
        j_in[:, :k_rows, 0], j_bg[:, :k_rows, 0],
    )


def _probs(q, k, scale):
    """softmax(q k^T * scale) in fp32 with the bf16 materialization cast the
    XLA loss path uses (edit_attention.attn_probs(out_dtype=bf16))."""
    s = jnp.einsum("hnd,hkd->hnk", q, k, preferred_element_type=jnp.float32) * scale
    return jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)


def _corr_xla(qe, ke, qb, kb, inpaint, background, scale):
    """Reference formulation (materializes the maps; CPU/tests fallback)."""
    pe = _probs(qe, ke, scale)
    pb = _probs(qb, kb, scale)
    corr = jnp.einsum("hik,hjk->hij", pe, pb, preferred_element_type=jnp.float32)
    corr = corr.astype(jnp.float32)
    c_in = jnp.where(inpaint[None, None, :] > 0.5, corr, MASKED)
    c_bg = jnp.where(background[None, None, :] > 0.5, corr, MASKED)
    return (
        jnp.max(c_in, axis=-1),
        jnp.max(c_bg, axis=-1),
        jnp.argmax(c_in, axis=-1).astype(jnp.int32),
        jnp.argmax(c_bg, axis=-1).astype(jnp.int32),
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def removal_correlation(
    qe: jnp.ndarray,        # (H, K, D) edit queries at the inpaint-row budget
    ke: jnp.ndarray,        # (H, Lk, D) edit-stream keys
    qb: jnp.ndarray,        # (H, L, D) base queries (detached upstream)
    kb: jnp.ndarray,        # (H, Lk, D) base keys (detached upstream)
    inpaint: jnp.ndarray,   # (L,) inpaint mask over base rows
    background: jnp.ndarray,  # (L,) background mask over base rows
    row_mask: jnp.ndarray | None,  # (K,) validity of the budgeted rows; real
                                   # rows first (top_k) -> block-skip prefix
    scale: float,
    impl: str = "auto",     # auto | pallas | xla
    interpret: bool = False,
):
    """Fused removal-loss correlation maxima.

    Returns (p_in, p_bg, j_in, j_bg): the best inpaint/background
    correlation per inpaint row and the base-row indices attaining them.
    Differentiable in (qe, ke); the base stream is treated as constant
    (matching the reference's .detach(), attention_processors.py:250).
    Rows with row_mask == 0 return the NEG_INF sentinel (their loss terms are
    masked out by the caller) and cost no kernel work.
    """
    out, _ = _rc_fwd(qe, ke, qb, kb, inpaint, background, row_mask, scale, impl, interpret)
    return out


def _rc_fwd(qe, ke, qb, kb, inpaint, background, row_mask, scale, impl, interpret):
    use_pallas = impl == "pallas" or (impl == "auto" and _on_tpu())
    if use_pallas:
        p_in, p_bg, j_in, j_bg = _corr_pallas(
            qe, ke, qb, kb, inpaint, background, row_mask, scale, interpret
        )
    else:
        p_in, p_bg, j_in, j_bg = _corr_xla(qe, ke, qb, kb, inpaint, background, scale)
        if row_mask is not None:
            # match the kernel's skip semantics so both paths agree bit-wise
            dead = row_mask[None, :] < 0.5
            p_in = jnp.where(dead, NEG_INF, p_in)
            p_bg = jnp.where(dead, NEG_INF, p_bg)
            j_in = jnp.where(dead, 0, j_in)
            j_bg = jnp.where(dead, 0, j_bg)
    out = (p_in, p_bg, j_in, j_bg)
    return out, (qe, ke, qb, kb, inpaint, background, row_mask, j_in, j_bg, p_in, p_bg)


def _rc_bwd(scale, impl, interpret, res, cts):
    """Sparse analytic backward: p_x[i] = sum_k P_e[i,k] * P_b[j_x[i], k],
    so only the two argmax base rows per inpaint row carry gradient.

    On TPU this runs as a Pallas kernel (see _corr_bwd_kernel) — the XLA
    formulation below materializes (H, K, Lk) fp32 intermediates in HBM,
    which at the remover's K = seq//2 budget dominates the optimize-step
    backward."""
    qe, ke, qb, kb, inpaint, background, row_mask, j_in, j_bg, p_in, p_bg = res
    g_in, g_bg = cts[0], cts[1]  # int outputs get float0 cotangents — ignored
    # mask-excluded maxima (empty mask in some tile) carry no gradient
    g_in = jnp.where(p_in > MASKED * 0.5, g_in, 0.0)
    g_bg = jnp.where(p_bg > MASKED * 0.5, g_bg, 0.0)

    use_pallas = impl == "pallas" or (impl == "auto" and _on_tpu())
    if use_pallas:
        q_sel_in = jnp.take_along_axis(qb, j_in[..., None], axis=1)
        q_sel_bg = jnp.take_along_axis(qb, j_bg[..., None], axis=1)
        d_qe, d_ke = _corr_bwd_pallas(
            qe, ke, kb, q_sel_in, q_sel_bg, g_in, g_bg, row_mask, scale, interpret
        )
    else:
        def base_rows(j_idx):
            q_sel = jnp.take_along_axis(qb, j_idx[..., None], axis=1)     # (H,K,D)
            return _probs(q_sel, kb, scale).astype(jnp.float32)           # (H,K,Lk)

        d_pe = g_in[..., None] * base_rows(j_in) + g_bg[..., None] * base_rows(j_bg)

        s = jnp.einsum("hnd,hkd->hnk", qe, ke, preferred_element_type=jnp.float32) * scale
        pe = jax.nn.softmax(s, axis=-1)
        d_logits = pe * (d_pe - jnp.sum(d_pe * pe, axis=-1, keepdims=True))
        d_qe = jnp.einsum(
            "hnk,hkd->hnd", d_logits, ke.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(qe.dtype) * scale
        d_ke = jnp.einsum(
            "hnk,hnd->hkd", d_logits, qe.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(ke.dtype) * scale
    z = jnp.zeros_like
    d_rm = None if row_mask is None else z(row_mask)
    return d_qe, d_ke, z(qb), z(kb), z(inpaint), z(background), d_rm


removal_correlation.defvjp(_rc_fwd, _rc_bwd)



# ---------------------------------------------------------------------------
# Pallas backward.  The XLA sparse backward below is analytically minimal
# (only the two argmax base rows carry gradient) but materializes several
# (H, K, Lk) fp32 intermediates in HBM — at the remover's K = seq//2 budget
# that traffic costs ~100 ms/step.  This kernel keeps all of them in VMEM:
# per (head, row-block) it recomputes the three probability row-sets
# (edit rows, and the two gathered base rows vs kb), forms the softmax-VJP
# tangent t = pe * (d_pe - <d_pe, pe>), and emits
#   d_qe = scale * t @ ke          (per row block)
#   d_ke = scale * t^T @ qe        (accumulated across row blocks directly
#                                   in the revisited output block)
# with the same row-block activity skipping as the forward.
# ---------------------------------------------------------------------------


def _corr_bwd_kernel(
    active_ref,
    qe_ref, ke_ref, qin_ref, qbg_ref, kb_ref, gin_ref, gbg_ref,
    dqe_ref, dke_ref,
    *, scale, i_steps, lk_valid,
):
    i_i = pl.program_id(1)

    @pl.when(i_i == 0)
    def _init():
        dke_ref[:] = jnp.zeros_like(dke_ref)

    @pl.when(active_ref[i_i] > 0)
    def _work():
        qe = qe_ref[0]                                   # (BI, Dp)
        ke = ke_ref[0]                                   # (Lkp, Dp)
        kb = kb_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, ke.shape[0]), 1)
        col_ok = col < lk_valid

        def probs(q, k):
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale                                    # (BI, Lkp)
            s = jnp.where(col_ok, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            return e / jnp.sum(e, axis=-1, keepdims=True)

        pe = probs(qe, ke)
        p_in = probs(qin_ref[0], kb)
        p_bg = probs(qbg_ref[0], kb)

        g_in = gin_ref[0]                                # (BI, 1)
        g_bg = gbg_ref[0]
        d_pe = g_in * p_in + g_bg * p_bg
        c = jnp.sum(d_pe * pe, axis=-1, keepdims=True)
        t = pe * (d_pe - c)                              # (BI, Lkp)

        dqe_ref[0] = (scale * jax.lax.dot_general(
            t, ke, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )).astype(dqe_ref.dtype)
        dke_ref[0] = dke_ref[0] + (scale * jax.lax.dot_general(
            t, qe, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )).astype(dke_ref.dtype)

    @pl.when((active_ref[i_i] == 0))
    def _zero_dqe():
        dqe_ref[:] = jnp.zeros_like(dqe_ref)


def _corr_bwd_pallas(qe, ke, kb, q_sel_in, q_sel_bg, g_in, g_bg, row_mask,
                     scale, interpret):
    h, k_rows, d = qe.shape
    lk = ke.shape[1]
    # head dim stays native (see _corr_pallas): only sequence axes are padded
    qe_p = _pad_to(qe, 1, 8)
    qin_p = _pad_to(q_sel_in, 1, 8)
    qbg_p = _pad_to(q_sel_bg, 1, 8)
    ke_p = _pad_to(ke, 1, 128)
    kb_p = _pad_to(kb, 1, 128)
    kp = qe_p.shape[1]
    lkp = ke_p.shape[1]

    bi = _pick_block(kp, 128)
    i_steps = kp // bi
    grid = (h, i_steps)

    gi = _pad_to(g_in[..., None].astype(jnp.float32), 1, 8)   # (H, Kp, 1)
    gb = _pad_to(g_bg[..., None].astype(jnp.float32), 1, 8)

    if row_mask is None:
        active = jnp.ones((i_steps,), jnp.int32)
    else:
        rm = jnp.pad(row_mask.reshape(-1), (0, kp - k_rows))
        active = (rm.reshape(i_steps, bi).max(axis=1) > 0.5).astype(jnp.int32)

    kern = functools.partial(
        _corr_bwd_kernel, scale=scale, i_steps=i_steps, lk_valid=lk,
    )
    d_qe, d_ke = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bi, d), lambda h_, i, s: (h_, i, 0)),
                pl.BlockSpec((1, lkp, d), lambda h_, i, s: (h_, 0, 0)),
                pl.BlockSpec((1, bi, d), lambda h_, i, s: (h_, i, 0)),
                pl.BlockSpec((1, bi, d), lambda h_, i, s: (h_, i, 0)),
                pl.BlockSpec((1, lkp, d), lambda h_, i, s: (h_, 0, 0)),
                pl.BlockSpec((1, bi, 1), lambda h_, i, s: (h_, i, 0)),
                pl.BlockSpec((1, bi, 1), lambda h_, i, s: (h_, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bi, d), lambda h_, i, s: (h_, i, 0)),
                pl.BlockSpec((1, lkp, d), lambda h_, i, s: (h_, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((h, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((h, lkp, d), jnp.float32),
        ],
        interpret=interpret,
    )(active, qe_p, ke_p, qin_p, qbg_p, kb_p, gi, gb)
    return d_qe[:, :k_rows].astype(qe.dtype), d_ke[:, :lk].astype(ke.dtype)
