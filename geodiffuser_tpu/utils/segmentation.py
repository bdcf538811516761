"""Point-prompted segmentation wrapper around the native SAM.

Rebuilds the SamPredictor flow used by the UI mask click
(get_mask_prediction / get_mask_prediction_multiple_points,
depth_predictor.py:53-102; ui_utils.py:322-360): resize longest side to the
model's input size, SAM pixel normalization, zero-pad to square, encode
once, then cheap per-click mask decoding; the last (largest-scale) mask is
returned, as the reference does (`masks[-1]`, depth_predictor.py:73).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.models.sam import Sam, SamConfig
from geodiffuser_tpu.ops import image as image_ops

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamPredictor:
    def __init__(self, params=None, config: Optional[SamConfig] = None,
                 checkpoint_path: Optional[str] = None):
        self.cfg = config or SamConfig.vit_h()
        self.model = Sam(self.cfg)
        if params is None:
            if checkpoint_path:
                import torch

                from geodiffuser_tpu.models import weights as weights_lib

                state = {
                    k: v.numpy()
                    for k, v in torch.load(checkpoint_path, map_location="cpu").items()
                }
                params = weights_lib.convert_sam(state)
            else:
                params = self.model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, self.cfg.img_size, self.cfg.img_size, 3)),
                    jnp.zeros((1, 1, 2)),
                    jnp.zeros((1, 1), jnp.int32),
                )
        self.params = params
        self._encode = jax.jit(
            lambda p, x: self.model.apply(p, x, method=self.model.encode_image)
        )
        self._decode = jax.jit(
            lambda p, emb, pts, lbl: self.model.apply(
                p, emb, pts, lbl, method=self.model.predict_masks
            )
        )
        self._embedding = None
        self._orig_hw: Tuple[int, int] = (0, 0)
        self._scale = 1.0

    def set_image(self, image: np.ndarray) -> None:
        """(H, W, 3) uint8 -> cache the image embedding."""
        img = np.asarray(image)
        if img.max() <= 1.5:
            img = img * 255.0
        h, w = img.shape[:2]
        self._orig_hw = (h, w)
        size = self.cfg.img_size
        self._scale = size / max(h, w)
        nh, nw = int(round(h * self._scale)), int(round(w * self._scale))
        x = image_ops.resize_bilinear_hwc(jnp.asarray(img, jnp.float32), nh, nw)
        x = (x - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        x = jnp.pad(x, ((0, size - nh), (0, size - nw), (0, 0)))
        self._embedding = self._encode(self.params, x[None])

    def predict(self, points: np.ndarray, labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """points: (N, 2) xy in original-image pixels; labels: (N,) {0,1}.
        Returns (masks (4, H, W) bool, iou (4,)); masks[-1] is the
        largest-scale mask the reference uses."""
        assert self._embedding is not None, "call set_image first"
        pts = np.asarray(points, np.float32)[None] * self._scale
        lbl = np.asarray(labels, np.int32)[None]
        low_res, iou = self._decode(self.params, self._embedding, jnp.asarray(pts), jnp.asarray(lbl))
        size = self.cfg.img_size
        h, w = self._orig_hw
        nh, nw = int(round(h * self._scale)), int(round(w * self._scale))
        masks = image_ops.resize_bilinear(low_res[0], size, size)
        masks = masks[:, :nh, :nw]
        masks = image_ops.resize_bilinear(masks, h, w)
        return np.asarray(masks > 0.0), np.asarray(iou[0])

    def mask_from_click(self, image: np.ndarray, x_frac: float, y_frac: float) -> np.ndarray:
        """Single normalized click -> binary mask (get_mask_prediction,
        depth_predictor.py:78-102)."""
        self.set_image(image)
        h, w = image.shape[:2]
        masks, _ = self.predict(np.array([[w * x_frac, h * y_frac]]), np.array([1]))
        return masks[-1].astype(np.float32)
