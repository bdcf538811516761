"""Differentiable-forward warping by point splatting (pure JAX).

This is the TPU-native replacement for the reference's PyTorch3D z-buffer
point rasterizer (`RasterizePointsXYsBlending`, warp_utils.py:28-176) and the
`warp_grid_edit` dispatcher (warp_utils.py:798-837), which together implement
*every* forward warp in GeoDiffuser (images, latents, masks, attention
queries).

Design notes (TPU-first, not a port):
 * The reference rasterizes k-nearest points per pixel by depth and
   alpha-composites front-to-back (CUDA kernels).  Hard per-pixel top-k +
   sorting maps poorly to the MXU/VPU; instead we use a two-pass *soft
   z-buffer*:
       pass 1: scatter-min of depth  ->  zmin per target pixel
       pass 2: scatter-add of  w * f  and  w,
               w = alpha_spatial * exp(-z_beta * (z - zmin[pixel]))
   with alpha_spatial = (1 - clamp(d^2/r^2, 1e-3, 1)^0.5)^tau — the exact
   spatial falloff of the reference (warp_utils.py:131-140).  The exp term
   reproduces hard occlusion as z_beta -> inf.  Coverage dimming of the
   alpha-over operator is approximated with c = 1 - exp(sum(log(1-alpha))).
 * Everything is static-shaped: each source point splats onto a fixed
   `footprint`^2 neighborhood, out-of-bounds contributions are masked to a
   dump row.
 * The reference wraps all splats in no_grad (warp_utils.py:72-73), so this
   op is used under stop_gradient on the edit path; the scatter formulation
   is nevertheless differentiable end-to-end for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geodiffuser_tpu.ops import image as image_ops


def _corner_data(
    coords: jnp.ndarray,
    height: int,
    width: int,
    radius: jnp.ndarray,
    tau: jnp.ndarray,
    footprint: int,
):
    """Per-point splat targets and spatial alphas.

    Args:
        coords: (N, 3) target (x_ndc, y_ndc, z), align_corners=True NDC.
        radius, tau: traced scalars (annealed per step; editor.py:154-156).
        footprint: static neighborhood width (2 => bilinear-size 2x2).
    Returns:
        idx: (F*F*N,) flat target indices (H*W = dump slot for out-of-bounds)
        alpha: (F*F*N,) spatial weights
        z: (F*F*N,) depths

    Layout note: everything is CORNER-MAJOR — entry k*N + p is corner k of
    point p.  The million-point axis must sit on the TPU 128-lane dimension:
    point-major (N, F, F) intermediates tile the trailing size-2 dims onto
    the lane axis, padding them 64x (8 GB of s32 at 512^2 with a 2x-densified
    field — the round-3 batched-preprocess OOM).  Consumers pair these with
    jnp.tile (NOT jnp.repeat) of per-point data.
    """
    n = coords.shape[0]
    x = (coords[:, 0] + 1.0) * 0.5 * (width - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (height - 1)
    z = coords[:, 2]

    base_x = jnp.floor(x).astype(jnp.int32)
    base_y = jnp.floor(y).astype(jnp.int32)
    offs = jnp.arange(footprint, dtype=jnp.int32) - (footprint - 1) // 2
    # (F*F, N): corner offsets on the (tiny) sublane axis, points on lanes
    ox = jnp.repeat(offs, footprint)
    oy = jnp.tile(offs, footprint)
    cx = base_x[None, :] + ox[:, None]
    cy = base_y[None, :] + oy[:, None]
    dx = cx.astype(jnp.float32) - x[None, :]
    dy = cy.astype(jnp.float32) - y[None, :]
    d2 = dx * dx + dy * dy

    r2 = jnp.maximum(radius * radius, 1e-8)
    # Reference alpha: (1 - clamp(d2/r2, 1e-3, 1)^0.5)^tau  (warp_utils.py:131-140).
    # We drop the 1e-3 lower clamp: it exists there so that alpha < 1 keeps
    # points behind the front alive in ordered compositing; our normalized
    # accumulation doesn't need it, and without it an exact-hit point has
    # alpha == 1 so identity warps preserve the image exactly.
    a = jnp.power(1.0 - jnp.sqrt(jnp.clip(d2 / r2, 0.0, 1.0)), tau)

    in_bounds = (cx >= 0) & (cx < width) & (cy >= 0) & (cy < height)
    valid = in_bounds & (a > 1e-6)
    flat_idx = jnp.where(valid, cy * width + cx, height * width)
    zc = jnp.broadcast_to(z[None, :], (footprint * footprint, n))
    return (
        flat_idx.reshape(-1),
        jnp.where(valid, a, 0.0).reshape(-1),
        zc.reshape(-1),
    )


def splat_image(
    src: jnp.ndarray,
    coords: jnp.ndarray,
    radius: jnp.ndarray | float = 1.3,
    tau: jnp.ndarray | float = 1.0,
    z_beta: float = 20.0,
    footprint: int = 2,
    out_hw: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Forward-splat an (H, W, C) image along an (H, W, 3) coordinate field.

    Equivalent role to SPLATTER(pts3D, src) in the reference
    (warp_utils.py:74-176); zero where nothing lands ('zeros' padding).
    """
    h, w, c = src.shape
    oh, ow = out_hw if out_hw is not None else (h, w)
    n = h * w
    radius = jnp.asarray(radius, jnp.float32)
    tau = jnp.asarray(tau, jnp.float32)

    idx, alpha, z = _corner_data(coords.reshape(n, 3).astype(jnp.float32), oh, ow, radius, tau, footprint)

    # Pass 1: hard z-min per target pixel (the z-buffer).
    zmin = jnp.full((oh * ow + 1,), jnp.inf, jnp.float32)
    zmin = zmin.at[idx].min(jnp.where(alpha > 0.0, z, jnp.inf))
    zref = zmin[idx]
    zref = jnp.where(jnp.isfinite(zref), zref, 0.0)

    # Pass 2: occlusion-weighted accumulation — numerator, denominator and
    # the alpha-over coverage term ride ONE scatter (TPU scatters are the
    # dominant cost here; three separate .at[].add were ~3x slower)
    wgt = alpha * jnp.exp(-z_beta * jnp.maximum(z - zref, 0.0))
    # corner-major pairing with _corner_data: tile, not repeat
    feats = jnp.tile(src.reshape(n, c).astype(jnp.float32), (footprint * footprint, 1))
    stacked = jnp.concatenate(
        [
            wgt[:, None] * feats,
            wgt[:, None],
            jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-4))[:, None],
        ],
        axis=-1,
    )
    acc = jnp.zeros((oh * ow + 1, c + 2), jnp.float32).at[idx].add(stacked)
    num, den, log_miss = acc[:-1, :c], acc[:-1, c], acc[:-1, c + 1]
    coverage = 1.0 - jnp.exp(log_miss)

    out = num / jnp.maximum(den[:, None], 1e-8) * coverage[:, None]
    return out.reshape(oh, ow, c)


def splat_batch(src_bchw_like, coords, **kw):
    """vmap helper over a leading batch axis of (B, H, W, C) / (B, H, W, 3)."""
    return jax.vmap(lambda s, t: splat_image(s, t, **kw))(src_bchw_like, coords)


def grid_sample(
    src: jnp.ndarray,
    coords: jnp.ndarray,
    padding: str = "zeros",
) -> jnp.ndarray:
    """Backward warp (gather): sample (H, W, C) at (H', W', 2) NDC locations.

    Matches torch.nn.functional.grid_sample(mode='bilinear',
    align_corners=True) — the reference fallback path
    (warp_utils.py:826-837, forward_warp warp_utils.py:768-795).
    """
    h, w, c = src.shape
    oh, ow = coords.shape[:2]
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    mode = {"zeros": "constant", "reflection": "mirror"}[padding]
    flat = src.reshape(h, w, c).astype(jnp.float32)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [y.reshape(-1), x.reshape(-1)], order=1, mode=mode, cval=0.0
        ).reshape(oh, ow)

    out = jax.vmap(sample_channel, in_axes=-1, out_axes=-1)(flat)
    return out


def warp_field(
    src: jnp.ndarray,
    coords: jnp.ndarray,
    radius: jnp.ndarray | float = 1.3,
    tau: jnp.ndarray | float = 1.0,
    z_beta: float = 20.0,
    use_splat: bool = True,
    padding: str = "zeros",
) -> jnp.ndarray:
    """The single warp entry point (role of warp_grid_edit, warp_utils.py:798-837).

    src: (H, W, C); coords: (H, W, 3) for splatting or (..., 2/3) for sampling.
    """
    if use_splat:
        return splat_image(src, coords, radius=radius, tau=tau, z_beta=z_beta)
    return grid_sample(src, coords[..., :2], padding=padding)


def densified_mask_splat(
    mask: jnp.ndarray,
    coords: jnp.ndarray,
    upsample: int = 2,
    radius: jnp.ndarray | float = 1.3,
    tau: jnp.ndarray | float = 1.0,
    z_beta: float = 20.0,
    close_kernel: int = 3,
) -> jnp.ndarray:
    """Amodal (hole-free) projected object mask.

    The reference builds a triangle mesh over the masked object's 3D points
    and rasterizes it (get_mesh/splatter_mesh, warp_utils.py:235-399) to get a
    surface-continuous projection.  TPU-native equivalent: bilinearly densify
    the coordinate field `upsample`x inside the mask and point-splat — dense
    enough that the projected surface closes — then morphologically close.
    2x density + closing matches 4x within IoU 0.998 on scale/rotation cases
    at a quarter of the scatter cost (the preprocess hot spot).

    Args:
        mask: (H, W) binary object mask.
        coords: (H, W, 3) transform field.
    Returns:
        (H, W) binary amodal mask.
    """
    h, w = mask.shape
    hh, ww = h * upsample, w * upsample
    coords_up = image_ops.resize_bilinear_hwc(coords, hh, ww)
    mask_up = image_ops.resize_bilinear(mask.astype(jnp.float32), hh, ww)

    # Binary surface-coverage splat: the z-buffer is irrelevant for an
    # amodal mask (self-occluded object points cover the cell either way —
    # mesh rasterization coverage likewise ignores depth within the object),
    # so a single 3-channel scatter-add replaces splat_image's 4 scatter
    # passes (measured 803 ms -> the scatter count dominates at 4x density).
    n = hh * ww
    radius = jnp.asarray(radius, jnp.float32)
    tau = jnp.asarray(tau, jnp.float32)
    idx, alpha, _z = _corner_data(
        coords_up.reshape(n, 3).astype(jnp.float32), h, w, radius, tau, 2
    )
    m_rep = jnp.tile(mask_up.reshape(n), 4)  # corner-major (_corner_data)
    stacked = jnp.stack(
        [
            alpha * m_rep,
            alpha,
            jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-4)),
        ],
        axis=-1,
    )
    acc = jnp.zeros((h * w + 1, 3), jnp.float32).at[idx].add(stacked)
    coverage = 1.0 - jnp.exp(acc[:-1, 2])
    out = acc[:-1, 0] / jnp.maximum(acc[:-1, 1], 1e-8) * coverage
    amodal = image_ops.binarize(out.reshape(h, w), 0.5)
    return image_ops.closing(amodal, close_kernel)


def warp_matrix(
    coords: jnp.ndarray,
    radius: jnp.ndarray | float = 1.3,
    tau: jnp.ndarray | float = 1.0,
    z_beta: float = 20.0,
    footprint: int = 2,
    out_hw: tuple[int, int] | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """The splat as an explicit linear operator: W with
    splat_image(src, coords) == W @ src.reshape(L, C).

    TPU-first rationale: the edit warps the SAME coordinate field inside
    every attention layer of every step (attention_processors.py:424, 544).
    Scatter ops serialize poorly on TPU, but the scatter pattern depends only
    on (coords, radius, tau) — so we scatter the *weights* once into a dense
    (L_out, L_in) matrix and every per-layer warp becomes one MXU matmul
    (4096^2 x C at 64^2).  Normalization and alpha-coverage are folded in.
    """
    h, w = coords.shape[:2]
    oh, ow = out_hw if out_hw is not None else (h, w)
    n = h * w
    radius = jnp.asarray(radius, jnp.float32)
    tau = jnp.asarray(tau, jnp.float32)
    idx, alpha, z = _corner_data(
        coords.reshape(n, 3).astype(jnp.float32), oh, ow, radius, tau, footprint
    )
    zmin = jnp.full((oh * ow + 1,), jnp.inf, jnp.float32)
    zmin = zmin.at[idx].min(jnp.where(alpha > 0.0, z, jnp.inf))
    zref = zmin[idx]
    zref = jnp.where(jnp.isfinite(zref), zref, 0.0)
    wgt = alpha * jnp.exp(-z_beta * jnp.maximum(z - zref, 0.0))

    # corner-major pairing with _corner_data: tile, not repeat
    src_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), footprint * footprint)
    mat = jnp.zeros((oh * ow + 1, n), jnp.float32).at[idx, src_idx].add(wgt)
    den = mat.sum(axis=1, keepdims=True)
    log_miss = jnp.zeros((oh * ow + 1,), jnp.float32).at[idx].add(
        jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-4))
    )
    coverage = 1.0 - jnp.exp(log_miss)
    mat = mat / jnp.maximum(den, 1e-8) * coverage[:, None]
    return mat[:-1].astype(dtype)


def apply_warp_matrix(mat: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """(L_out, L_in) @ (H, W, C) -> (H_out, W_out, C) via one matmul."""
    h, w, c = src.shape
    l_out = mat.shape[0]
    side = int(l_out ** 0.5)
    out = jnp.dot(mat, src.reshape(h * w, c).astype(mat.dtype),
                  preferred_element_type=jnp.float32)
    return out.reshape(side, side, c).astype(src.dtype)


# ---------------------------------------------------------------------------
# softsplat (summation splatting) mode parity.
#
# Reference: GeoDiffuser/utils/softsplat.py:232-273 (dispatcher) + the CUDA
# scatter kernel :277-354.  Forward = bilinear scatter-add of the input along
# a pixel-offset flow field; modes wrap it with a normalization channel:
#   sum     raw scatter-add                       (metric unused)
#   avg     append a ones channel, divide by it
#   linear  splat (in*metric | metric), divide
#   soft    splat (in*e^metric | e^metric), divide
# The reference's hand-written backward (softsplat.py:357-520) exists only
# because CUDA kernels aren't differentiable; here the scatter-add is a
# native XLA op whose transpose IS that analytic gradient, so jax.grad gives
# the same VJP for free (verified by tests/test_splat.py check_grads).
# ---------------------------------------------------------------------------


def _bilinear_scatter(src: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) src + (H, W, 2) pixel-offset flow -> (H, W, C) scatter-add.

    Out-of-bounds corners are dropped (mode='drop'), matching the kernel's
    bounds checks (softsplat.py:316-341).
    """
    h, w, c = src.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    tx = xx + flow[..., 0]
    ty = yy + flow[..., 1]
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    out = jnp.zeros((h * w, c), src.dtype)
    flat = src.reshape(h * w, c)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            cx = x0 + dx
            cy = y0 + dy
            # per-axis bounds mask: a flat index would let column overflow
            # wrap into the next row (softsplat.py:316-341 bounds-checks both)
            valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            wgt = ((1.0 - jnp.abs(tx - cx)) * (1.0 - jnp.abs(ty - cy)))
            wgt = jnp.where(valid, wgt, 0.0).reshape(-1, 1)
            idx = jnp.where(valid, cy * w + cx, -1).astype(jnp.int32).reshape(-1)
            out = out.at[idx].add(
                flat * wgt, mode="drop",
                indices_are_sorted=False, unique_indices=False,
            )
    return out.reshape(h, w, c)


def softsplat(
    src: jnp.ndarray,
    flow: jnp.ndarray,
    metric: jnp.ndarray | None = None,
    mode: str = "soft",
) -> jnp.ndarray:
    """Differentiable forward warping, reference mode semantics
    (softsplat.py:232-273).  src (H, W, C), flow (H, W, 2) in pixels,
    metric (H, W) or (H, W, 1); eps variants: '<mode>-addeps' (default for
    bare avg/linear/soft), '<mode>-zeroeps', '<mode>-clipeps'."""
    base, _, eps_kind = mode.partition("-")
    if base not in ("sum", "avg", "linear", "soft"):
        raise ValueError(f"unknown softsplat mode {mode!r}")
    if base in ("sum", "avg"):
        assert metric is None, f"mode {base} takes no metric"
    else:
        assert metric is not None, f"mode {base} needs a metric"
    if metric is not None and metric.ndim == 2:
        metric = metric[..., None]

    if base == "sum":
        return _bilinear_scatter(src, flow)
    if base == "avg":
        stacked = jnp.concatenate([src, jnp.ones_like(src[..., :1])], axis=-1)
    elif base == "linear":
        stacked = jnp.concatenate([src * metric, metric], axis=-1)
    else:  # soft
        e = jnp.exp(metric)
        stacked = jnp.concatenate([src * e, e], axis=-1)

    out = _bilinear_scatter(stacked, flow)
    norm = out[..., -1:]
    if eps_kind in ("", "addeps"):
        norm = norm + 1e-7
    elif eps_kind == "zeroeps":
        norm = jnp.where(norm == 0.0, 1.0, norm)
    elif eps_kind == "clipeps":
        norm = jnp.clip(norm, 1e-7, None)
    else:
        raise ValueError(f"unknown softsplat eps variant {mode!r}")
    return out[..., :-1] / norm
