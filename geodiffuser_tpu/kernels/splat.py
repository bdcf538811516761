"""Fused Pallas splat kernel: the point-splat as flash-style attention.

The dense warp-matrix formulation (ops/splat.py:warp_matrix) materializes an
(L_out, L_in) operator in HBM — 67 MB at 64^2 per (radius, tau), ~0.9 GB for
the annealing schedule's cache.  This kernel computes the SAME normalized
soft-z-buffer splat without ever materializing the matrix: the splat weight

    l[o, s] = log(alpha_spatial(o, s)) - z_beta * z[s]
    out[o]  = softmax_s(l[o, :]) @ v  *  coverage[o]
    coverage[o] = 1 - exp(sum_s log1p(-alpha[o, s]))

is mathematically identical to the two-pass zmin formulation: z >= zmin makes
the max() clamp a no-op and the exp(z_beta * zmin[o]) factor cancels between
numerator and denominator (it is kept implicitly by the online running max,
which also gives fp safety for unnormalized depths).  alpha is the exact
reference spatial falloff (warp_utils.py:131-140) restricted to the same
2x2 corner footprint as ops/splat.py, so outputs match the XLA path to fp32
tolerance (tests/test_splat_kernel.py).

Like every splat in the reference (wrapped in no_grad, warp_utils.py:72-73)
this runs on the non-differentiated path; it defines no VJP.

Trade-off vs the dense matrix (documented, PARITY.md): per-apply the dense
matmul is faster once built (one 67 MB read + MXU), but the fused kernel
needs zero HBM for operators, no per-(radius, tau) build/caching, and takes
radius/tau as plain traced scalars — use it where HBM headroom matters
(remover at >512^2) or operators would be built once and used once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _splat_kernel(
    x_ref, y_ref, z_ref, v_ref, out_ref,
    num_scr, den_scr, m_scr, miss_scr,
    *, s_steps, block_o, block_s, out_w, z_beta, n_valid,
):
    o_i = pl.program_id(0)
    s_i = pl.program_id(1)

    @pl.when(s_i == 0)
    def _init():
        num_scr[:] = jnp.zeros_like(num_scr)
        den_scr[:] = jnp.zeros_like(den_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        miss_scr[:] = jnp.zeros_like(miss_scr)

    # output-pixel integer positions from the flat block offset
    flat = o_i * block_o + jax.lax.broadcasted_iota(jnp.int32, (block_o, 1), 0)
    gx = (flat % out_w).astype(jnp.float32)                  # (BO, 1)
    gy = (flat // out_w).astype(jnp.float32)

    x = x_ref[0][None, :]                                     # (1, BS) target x (px)
    y = y_ref[0][None, :]
    z = z_ref[0][None, :]
    r = z_ref[1][0]                                           # radius row (broadcast)
    tau = z_ref[2][0]                                         # tau row (broadcast)

    dx = gx - x                                               # (BO, BS)
    dy = gy - y
    d2 = dx * dx + dy * dy
    r2 = jnp.maximum(r * r, 1e-8)
    a = jnp.power(1.0 - jnp.sqrt(jnp.clip(d2 / r2, 0.0, 1.0)), tau)

    # 2x2 corner footprint of ops/splat.py:_corner_data: an output cell
    # receives a source point iff it is floor(t) or floor(t)+1 — the SAME
    # fp32 floor as the scatter path, so near-integer coordinates bucket
    # identically (an interval test like -1 < g-t <= 1 flips cells when the
    # NDC->pixel roundtrip lands at 3.9999997)
    fx = jnp.floor(x)
    fy = jnp.floor(y)
    corner = ((gx == fx) | (gx == fx + 1.0)) & ((gy == fy) | (gy == fy + 1.0))
    col = s_i * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    valid = corner & (a > 1e-6) & (col < n_valid)
    a = jnp.where(valid, a, 0.0)

    logits = jnp.where(valid, jnp.log(jnp.maximum(a, 1e-30)) - z_beta * z, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.where(valid, jnp.exp(logits - m_new), 0.0)        # (BO, BS)
    alpha_r = jnp.exp(m_prev - m_new)
    den_scr[:] = den_scr[:] * alpha_r + jnp.sum(e, axis=-1, keepdims=True)
    num_scr[:] = num_scr[:] * alpha_r + jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    miss_scr[:] = miss_scr[:] + jnp.sum(
        jnp.log1p(-jnp.clip(a, 0.0, 1.0 - 1e-4)), axis=-1, keepdims=True
    )

    @pl.when(s_i == s_steps - 1)
    def _finalize():
        coverage = 1.0 - jnp.exp(miss_scr[:])
        out = num_scr[:] / jnp.maximum(den_scr[:], 1e-30) * coverage
        out_ref[:] = jnp.where(den_scr[:] > 0.0, out, 0.0).astype(out_ref.dtype)


def _pad_axis(t, axis, mult):
    n = t.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return t
    widths = [(0, 0)] * t.ndim
    widths[axis] = (0, pad)
    return jnp.pad(t, widths)


def splat_image_fused(
    src: jnp.ndarray,
    coords: jnp.ndarray,
    radius: jnp.ndarray | float = 1.3,
    tau: jnp.ndarray | float = 1.0,
    z_beta: float = 20.0,
    out_hw: tuple[int, int] | None = None,
    block_o: int = 512,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ops.splat.splat_image (2x2 footprint).

    src (H, W, C), coords (H, W, 3) NDC+z -> (H_out, W_out, C).
    radius/tau may be traced scalars — no per-value caching needed.
    """
    h, w, c = src.shape
    oh, ow = out_hw if out_hw is not None else (h, w)
    n = h * w
    n_out = oh * ow

    cf = coords.reshape(n, 3).astype(jnp.float32)
    x = (cf[:, 0] + 1.0) * 0.5 * (ow - 1)
    y = (cf[:, 1] + 1.0) * 0.5 * (oh - 1)
    z = cf[:, 2]

    bs = min(block_s, max(128, n))
    bo = min(block_o, max(8, n_out))
    xp = _pad_axis(x[None], 1, bs)                      # (1, Np)
    yp = _pad_axis(y[None], 1, bs)
    # z carries two extra broadcast rows (radius, tau) so traced scalars
    # ride a tensor input instead of needing SMEM plumbing
    npad = xp.shape[1]
    r_row = jnp.full((1, npad), jnp.asarray(radius, jnp.float32))
    t_row = jnp.full((1, npad), jnp.asarray(tau, jnp.float32))
    zp = jnp.concatenate([_pad_axis(z[None], 1, bs), r_row, t_row], axis=0)  # (3, Np)
    vp = _pad_axis(src.reshape(n, c).astype(jnp.float32), 0, bs)
    vp = _pad_axis(vp, 1, 128)
    cp = vp.shape[1]

    n_out_p = ((n_out + bo - 1) // bo) * bo
    s_steps = xp.shape[1] // bs
    grid = (n_out_p // bo, s_steps)

    kern = functools.partial(
        _splat_kernel, s_steps=s_steps, block_o=bo, block_s=bs,
        out_w=ow, z_beta=float(z_beta), n_valid=n,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs), lambda o, s: (0, s)),
            pl.BlockSpec((1, bs), lambda o, s: (0, s)),
            pl.BlockSpec((3, bs), lambda o, s: (0, s)),
            pl.BlockSpec((bs, cp), lambda o, s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((bo, cp), lambda o, s: (o, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out_p, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bo, cp), jnp.float32),
            pltpu.VMEM((bo, 1), jnp.float32),
            pltpu.VMEM((bo, 1), jnp.float32),
            pltpu.VMEM((bo, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp, zp, vp)
    return out[:n_out, :c].reshape(oh, ow, c)
