"""Pallas TPU flash attention (forward + backward) for the UNet attention.

Why: at 64^2 latent resolution a single self-attention layer materializes a
(streams*heads, 4096, 4096) probability matrix; the XLA path writes it to
HBM in fp32 (softmax accumulation) and reads it back for the PV matmul —
~1 GB of traffic per layer per pass.  This kernel computes
softmax(q k^T * scale) v with the online-softmax recurrence entirely in
VMEM: HBM traffic drops to the q/k/v/o tensors themselves.

The backward is a real Pallas implementation of the flash-attention
recurrence (two kernels: dq over q-tiles scanning k, dk/dv over k-tiles
scanning q), using the forward's saved log-sum-exp row statistics — the
probability map is never materialized in HBM in EITHER pass.  This is what
lets the optimize step (grad of the shared-attention loss through the UNet,
reference editor.py:181-336) run attention at flash cost.

Head dims in SD-1.x are 40/80/160; operands are passed at their NATIVE head
dim.  The MXU pads the contraction to its 128-deep systolic wave either way
(cycle count is identical), but padding the arrays in HBM — what earlier
revisions did — materializes 3.2x the bytes at d=40 (a full padded write of
q/k/v/o plus 3.2x the kernel DMA traffic at the 64^2 layers).  Blocks cover
the whole head dim, so every DMA row is contiguous; Mosaic masks the lane
tail in VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale, kv_steps):
    """Grid = (batch, q_blocks, k_blocks); k is the innermost (sequential)
    axis, accumulators persist across it in VMEM scratch."""
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]
    # log2 domain: the VPU's transcendental unit is exp2-native (XLA lowers
    # exp to exp2 + mul); folding log2(e) into the matmul scale deletes one
    # multiply per logit — measurable at d=40 where softmax, not the MXU,
    # bounds the kernel.
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)                                    # (BQ, BK), log2
    m_prev = m_scr[:]                                      # (BQ, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(logits - m_new)                           # (BQ, BK)
    alpha = jnp.exp2(m_prev - m_new)                       # (BQ, 1)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(kv_i == kv_steps - 1)
    def _done():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        # lse in NATURAL log units (m is in the log2 domain)
        lse_ref[0] = (m_scr[:] + jnp.log2(l_scr[:])) * (1.0 / LOG2E)


def _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret):
    """Returns (o, lse) on flattened (B, L, D) operands (native head dim)."""
    l, d = q.shape[-2:]
    lk = k.shape[-2]
    b = math.prod(q.shape[:-2])
    bq = min(block_q, l)
    bk = min(block_k, lk)
    assert l % bq == 0 and lk % bk == 0, (l, lk, bq, bk)

    qf = q.reshape(b, l, d)
    kf = k.reshape(b, lk, d)
    vf = v.reshape(b, lk, d)

    kv_steps = lk // bk
    grid = (b, l // bq, kv_steps)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_steps=kv_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, l, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return o, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_scr, *, scale, kv_steps):
    """Grid = (batch, q_blocks, k_blocks); accumulates dq over k tiles.

    ds = p * (do v^T - delta);  dq = scale * ds k.
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                                       # (BQ, 1)
    delta = delta_ref[0]                                   # (BQ, 1)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)                                    # log2 domain
    p = jnp.exp2(logits - lse * LOG2E)                     # (BQ, BK)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # (BQ, BK)
    ds = p * (dp - delta)
    acc_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_i == kv_steps - 1)
    def _done():
        dq_ref[0] = (acc_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, q_steps):
    """Grid = (batch, k_blocks, q_blocks); accumulates dk/dv over q tiles.

    p^T = exp(k q^T * scale - lse);  dv = p^T do;  dk = scale * ds^T q.
    """
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0][None, :]                        # (1, BQ)
    delta = delta_ref[0][:, 0][None, :]                    # (1, BQ)

    logits_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)                                    # (BK, BQ), log2
    p_t = jnp.exp2(logits_t - lse * LOG2E)
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # (BK, BQ)
    ds_t = p_t * (dp_t - delta)
    dk_scr[:] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_i == q_steps - 1)
    def _done():
        dk_ref[0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g, scale, block_q, block_k, interpret):
    """Pallas backward on flattened (B, L, D) operands; returns (dq, dk, dv).

    The k block clamps to 1024 regardless of the forward's block_k: the
    backward kernels hold TWO (BQ, BK) fp32 tiles (logits and dp) plus the
    probability tile, so bk=4096 blows the 16 MB scoped-VMEM budget inside
    the full optimize program (measured: the remover program's dkv kernel
    asked for 20.7 MB), while bk=1024 is speed-equivalent on the sweep
    (1108 vs 1086 us at (8, 4096, 40) fwd+bwd)."""
    l, d = q.shape[-2:]
    lk = k.shape[-2]
    b = math.prod(q.shape[:-2])
    bq = min(block_q, l)
    bk = min(block_k, lk, 1024)

    qf = q.reshape(b, l, d)
    kf = k.reshape(b, lk, d)
    vf = v.reshape(b, lk, d)
    dof = g.reshape(b, l, d)
    of = o.reshape(b, l, d)
    lsef = lse.reshape(b, l, 1)
    # delta_i = sum_d do[i,d] * o[i,d] — a fused elementwise+reduce in XLA.
    delta = jnp.sum(
        dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1,
        keepdims=True,
    )

    kv_steps = lk // bk
    q_steps = l // bq

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_steps=kv_steps),
        grid=(b, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_steps=q_steps),
        grid=(b, kv_steps, q_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, j, i: (b_, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b_, j, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, j, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, j, i: (b_, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, j, i: (b_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, delta)

    dq = dq.reshape(q.shape)
    dk = dk.reshape(k.shape)
    dv = dv.reshape(v.shape)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the map.

    q, k, v: (..., L, D) with any leading batch dims; D is carried at its
    native width (Mosaic masks the lane tail in VMEM; no HBM padding);
    L must divide by the block sizes (callers use powers of two >= 256).
    Differentiable: the backward is also a Pallas flash kernel (no HBM map
    in either pass).

    Default blocks (512, 4096) from scripts/tpu_flash_sweep.py on v5e at
    the hot shape (8, 4096, 40): block_k clamps to Lk, so every UNet level
    runs its whole key range in ONE kv step — the online-softmax rescale
    disappears (exactly one exp2 per logit) and the backward's dk/dv pass
    keeps its whole accumulator resident.  fwd 1125 -> 1040 us and
    fwd+bwd 1403 -> ~1074 us vs the old (512, 1024) at d=40 (plus the
    exp2-domain softmax on top), where the softmax VPU mass, not the MXU,
    bounds the kernel.
    """
    o, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return o.reshape(q.shape)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    o = o.reshape(q.shape)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, block_q, block_k, interpret)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def use_flash(lq: int, lk: int) -> bool:
    """Flash pays off when the key sequence is large (self-attention at
    >= 32^2); cross attention (Lk=77) has no L^2 term to save.  Rectangular
    maps (the warped-row blend computes the shared output for a seq//4 row
    budget against the full key set) qualify whenever both axes tile."""
    return lk >= 1024 and lk % 256 == 0 and lq >= 256 and lq % 256 == 0
