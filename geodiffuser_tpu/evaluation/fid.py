"""FID / IS computation with a pluggable feature extractor.

The reference computes FID/IS over experiment trees with pytorch-fid's
InceptionV3 (Evaluation/scripts/fid_is/fid_is_score_geodiff.py).  The math
here is extractor-agnostic: pass any embedder (image -> feature vector /
logits).  Default embedder is our CLIP ViT-B/32 image tower ("CLIP-FID", a
widely used variant) since Inception weights are not available offline.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import scipy.linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians fitted to feature sets."""
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fit_gaussian(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def fid_score(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    return frechet_distance(*fit_gaussian(feats_a), *fit_gaussian(feats_b))


def inception_score(logits: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS from class logits: exp(E_x KL(p(y|x) || p(y)))."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12))).sum(-1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


class CLIPFeatureExtractor:
    """Default embedder: CLIP ViT-B/32 image embeddings (weight-gated)."""

    def __init__(self, params=None, config=None):
        import jax

        from geodiffuser_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder

        self.cfg = config or CLIPVisionConfig()
        self.model = CLIPVisionEncoder(self.cfg)
        if params is None:
            raise RuntimeError(
                "CLIP-FID needs pretrained ViT-B/32 weights "
                "(models/weights.py:convert_clip_vision); none available offline."
            )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        from geodiffuser_tpu.models.clip_vision import preprocess_clip_image

        x = preprocess_clip_image(image, self.cfg.image_size)
        return np.asarray(self._apply(self.params, x))[0]


def fid_over_experiments(
    exp_root: str,
    embed: Callable[[np.ndarray], np.ndarray],
    result_name: str = "result_ls.png",
) -> float:
    """FID between edited results and input images over an experiment tree
    (the fid_is_score_geodiff.py flow)."""
    import os

    from PIL import Image

    from geodiffuser_tpu.utils import exp_io

    real, fake = [], []
    for _cat, folder in exp_io.list_experiments(exp_root):
        rp = os.path.join(folder, result_name)
        if not os.path.exists(rp):
            continue
        exp = exp_io.read_exp(folder)
        real.append(embed(exp.input_image))
        fake.append(embed(np.asarray(Image.open(rp).convert("RGB"))))
    if len(real) < 2:
        raise ValueError("need at least 2 experiments with results for FID")
    return fid_score(np.stack(real), np.stack(fake))
