"""DIFT-style diffusion features and the MD (mean distance) metric.

The reference's headline geometry metric (image_fidelity.py:125-181):
  1. detect keypoints inside the object mask of the source image;
  2. extract diffusion features for source and edit (DIFT: add noise at
     t=261, one UNet pass, up-block-1 features, ensemble of 8;
     evaluation/dift_sd.py);
  3. for each source keypoint, find the edit pixel with max cosine
     similarity and measure its distance to the *expected* warped location
     from the transform field.  MD = mean distance.

Native differences (documented):
  * features come from our flax UNet's `features` collection taps
    (models/unet.py) instead of a monkey-patched diffusers UNet;
  * keypoints are Harris corners (pure JAX/numpy) instead of OpenCV SIFT —
    the metric needs well-spread object keypoints, not SIFT specifically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import image as image_ops


def harris_keypoints(
    gray: np.ndarray, mask: Optional[np.ndarray] = None, max_points: int = 50,
    k: float = 0.04, min_distance: int = 5,
) -> np.ndarray:
    """Harris corner detection with non-max suppression.  Returns (N, 2) xy."""
    g = jnp.asarray(gray, jnp.float32)
    if g.ndim == 3:
        g = g.mean(-1)
    if g.max() > 1.5:
        g = g / 255.0
    dy, dx = jnp.gradient(g)
    ixx = image_ops.gaussian_smooth_2d(dx * dx, 5)
    iyy = image_ops.gaussian_smooth_2d(dy * dy, 5)
    ixy = image_ops.gaussian_smooth_2d(dx * dy, 5)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    r = det - k * tr * tr
    r = np.asarray(r)
    if mask is not None:
        r = np.where(np.asarray(mask) > 0.5, r, -np.inf)
    # greedy NMS
    pts = []
    r_work = r.copy()
    h, w = r.shape
    for _ in range(max_points):
        idx = np.argmax(r_work)
        y, x = divmod(int(idx), w)
        if not np.isfinite(r_work[y, x]) or r_work[y, x] <= 0:
            break
        pts.append((x, y))
        y0, y1 = max(0, y - min_distance), min(h, y + min_distance + 1)
        x0, x1 = max(0, x - min_distance), min(w, x + min_distance + 1)
        r_work[y0:y1, x0:x1] = -np.inf
    return np.asarray(pts, np.float64).reshape(-1, 2)


class SDFeaturizer:
    """Diffusion features from one noised UNet pass (dift_sd.py semantics:
    t=261, up_ft_index=1, ensemble of 8 noise draws)."""

    def __init__(self, pipeline: Pipeline, t: int = 261, up_block: int = 1,
                 ensemble: int = 8):
        self.pipeline = pipeline
        self.t = t
        self.up_block = up_block
        self.ensemble = ensemble

        def feat_fn(params, latent, context, noise, t_):
            s = self.pipeline.schedule
            a = s.alphas_cumprod[t_]
            noised = jnp.sqrt(a) * latent + jnp.sqrt(1.0 - a) * noise
            _, aux = self.pipeline.unet.apply(
                params, noised, t_, context, mutable=["features"]
            )
            return aux["features"][f"up_block_{self.up_block}"][0]

        self._feat = jax.jit(feat_fn)

    def __call__(self, image: np.ndarray, prompt: str = "") -> np.ndarray:
        """(H, W, 3) image -> (h', w', C) ensemble-averaged features."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        latent = self.pipeline.encode_image(jnp.asarray(img))
        ctx = self.pipeline.encode_text([prompt])
        acc = None
        for i in range(self.ensemble):
            noise = jax.random.normal(jax.random.PRNGKey(i), latent.shape)
            f = self._feat(
                self.pipeline.params["unet"], latent, ctx, noise, jnp.int32(self.t)
            )
            acc = f if acc is None else acc + f
        return np.asarray(acc[0] / self.ensemble)


def mean_distance_metric(
    featurizer: SDFeaturizer,
    source: np.ndarray,
    edited: np.ndarray,
    mask: np.ndarray,
    t_coords: np.ndarray,
    prompt: str = "",
    max_points: int = 50,
) -> Tuple[float, int]:
    """MD: mean distance between DIFT-matched keypoints and their expected
    warped locations (image_fidelity.py:125-181).

    Returns (mean_distance_px, n_keypoints).
    """
    h, w = mask.shape
    kps = harris_keypoints(source, mask, max_points=max_points)
    if len(kps) == 0:
        return float("nan"), 0
    fs = featurizer(source, prompt)
    fe = featurizer(edited, prompt)
    fh, fw, _ = fs.shape

    fs_n = fs / (np.linalg.norm(fs, axis=-1, keepdims=True) + 1e-8)
    fe_n = fe / (np.linalg.norm(fe, axis=-1, keepdims=True) + 1e-8)
    fe_flat = fe_n.reshape(-1, fe_n.shape[-1])

    dists = []
    for x, y in kps:
        fx = int(x * fw / w)
        fy = int(y * fh / h)
        q = fs_n[min(fy, fh - 1), min(fx, fw - 1)]
        sim = fe_flat @ q
        j = int(np.argmax(sim))
        my, mx = divmod(j, fw)
        # matched position back at image scale
        px = (mx + 0.5) * w / fw
        py = (my + 0.5) * h / fh
        # expected location from the transform field (NDC -> pixels)
        tc = t_coords[int(y), int(x)]
        ex = (tc[0] + 1.0) * 0.5 * (w - 1)
        ey = (tc[1] + 1.0) * 0.5 * (h - 1)
        dists.append(np.hypot(px - ex, py - ey))
    return float(np.mean(dists)), len(kps)
