"""Pallas TPU flash attention for the UNet's self-attention layers.

Why: at 64^2 latent resolution a single self-attention layer materializes a
(streams*heads, 4096, 4096) probability matrix; the XLA path writes it to
HBM in fp32 (softmax accumulation) and reads it back for the PV matmul —
~1 GB of traffic per layer per pass.  This kernel computes
softmax(q k^T * scale) v with the online-softmax recurrence entirely in
VMEM: HBM traffic drops to the q/k/v/o tensors themselves.

Used for the *vanilla* attention paths (all 4 CFG streams; the base/edit
streams of the optimize pass outside loss layers).  The loss-bearing edit
layers still use the explicit form — the removal loss semantically needs
attention rows (attention_processors.py:248-280); fusing those reductions
is the next kernel.

Head dims in SD-1.x are 40/80/160; operands are zero-padded to 128 lanes
(zeros don't change logits or the weighted sum).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, kv_steps):
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
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                              # (BQ, BK)

    m_prev = m_scr[:]                                      # (BQ, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                            # (BQ, BK)
    alpha = jnp.exp(m_prev - m_new)                        # (BQ, 1)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the map.

    q, k, v: (..., L, D) with any leading batch dims; D is zero-padded to a
    multiple of 128 internally; L must divide by the block sizes (callers
    use powers of two >= 256).
    """
    orig_shape = q.shape
    l, d = q.shape[-2:]
    lk = k.shape[-2]
    b = math.prod(q.shape[:-2])
    bq = min(block_q, l)
    bk = min(block_k, lk)
    assert l % bq == 0 and lk % bk == 0, (l, lk, bq, bk)

    d_pad = ((d + 127) // 128) * 128
    qf = q.reshape(b, l, d)
    kf = k.reshape(b, lk, d)
    vf = v.reshape(b, lk, d)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        qf, kf, vf = (jnp.pad(t, pad) for t in (qf, kf, vf))

    kv_steps = lk // bk
    grid = (b, l // bq, kv_steps)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_steps=kv_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out[..., :d].reshape(orig_shape)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    return flash_attention(q, k, v, scale, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Backward via the explicit XLA attention (materializes the map only in
    the backward pass; the hot no-grad paths never hit this)."""
    q, k, v = res

    def ref(q_, k_, v_):
        logits = jnp.einsum("...id,...jd->...ij", q_, k_, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * scale, axis=-1)
        return jnp.einsum("...ij,...jd->...id", p.astype(v_.dtype), v_)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def use_flash(lq: int, lk: int) -> bool:
    """Flash pays off when the map is large and square-ish (self-attention
    at >= 32^2); cross attention (Lk=77) has no L^2 term to save."""
    return lq == lk and lq >= 1024 and lq % 256 == 0
