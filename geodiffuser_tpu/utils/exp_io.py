"""Experiment-folder IO — the on-disk format shared with the reference.

The experiment folder is the de-facto serialization format tying the UI,
batch driver and evaluation together (save_exp/read_exp,
ui_utils.py:52-159):

    input_image.png, input_mask.png, depth.npy, depth.png, transform.npy,
    image_shape.npy, optional background_image.png / transformed_image.png /
    result.png, plus per-method result subfolders.

We keep the format byte-compatible so the reference's evaluation scripts and
datasets work unchanged against this framework's outputs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

CATEGORIES = (
    "Mix", "Rotation_3D", "Rotation_2D", "Translation_3D",
    "Scaling", "Removal", "Translation_2D",
)  # ui_utils.py:901-905


@dataclasses.dataclass
class Experiment:
    input_image: np.ndarray          # (H, W, 3) uint8
    input_mask: np.ndarray           # (H, W) float in [0, 1]
    depth: np.ndarray                # (H, W) float
    transform: np.ndarray            # (4, 4)
    image_shape: np.ndarray          # (2,) original aspect
    background_image: Optional[np.ndarray] = None
    transformed_image: Optional[np.ndarray] = None
    result: Optional[np.ndarray] = None
    path: str = ""


def _read_image(path: str) -> np.ndarray:
    im = np.asarray(Image.open(path).convert("RGB"))
    return im


def read_exp(folder: str) -> Experiment:
    """Load an experiment folder (read_exp, ui_utils.py:118-159)."""
    p = lambda n: os.path.join(folder, n)
    mask_img = np.asarray(Image.open(p("input_mask.png")))
    if mask_img.ndim == 3:
        mask_img = mask_img[..., 0]
    opt_img = lambda n: _read_image(p(n)) if os.path.exists(p(n)) else None
    shape = (
        np.load(p("image_shape.npy")) if os.path.exists(p("image_shape.npy"))
        else np.array([512, 512])
    )
    return Experiment(
        input_image=_read_image(p("input_image.png")),
        input_mask=mask_img.astype(np.float32) / 255.0,
        depth=np.load(p("depth.npy")),
        transform=np.load(p("transform.npy")),
        image_shape=shape,
        background_image=opt_img("background_image.png"),
        transformed_image=opt_img("transformed_image.png"),
        result=opt_img("result.png"),
        path=folder,
    )


def save_exp(
    folder: str,
    input_image: np.ndarray,
    depth: np.ndarray,
    input_mask: np.ndarray,
    transform: np.ndarray,
    transformed_image: Optional[np.ndarray] = None,
    result: Optional[np.ndarray] = None,
    background_image: Optional[np.ndarray] = None,
    image_shape=(512, 512),
) -> None:
    """Write an experiment folder (save_exp, ui_utils.py:52-109)."""
    os.makedirs(folder, exist_ok=True)
    p = lambda n: os.path.join(folder, n)
    Image.fromarray(np.asarray(input_image, np.uint8)).save(p("input_image.png"))
    m = np.asarray(np.clip(input_mask, 0, 1) * 255, np.uint8)
    Image.fromarray(np.stack([m] * 3, -1)).save(p("input_mask.png"))
    np.save(p("depth.npy"), np.asarray(depth))
    dvis = np.asarray(depth, np.float64)
    dvis = (dvis - dvis.min()) / (dvis.max() - dvis.min() + 1e-8)
    Image.fromarray((np.stack([dvis] * 3, -1) * 255).astype(np.uint8)).save(p("depth.png"))
    np.save(p("transform.npy"), np.asarray(transform))
    np.save(p("image_shape.npy"), np.asarray(image_shape))
    if transformed_image is not None:
        Image.fromarray(np.asarray(transformed_image, np.uint8)).save(p("transformed_image.png"))
    if result is not None:
        Image.fromarray(np.asarray(result, np.uint8)).save(p("result.png"))
    if background_image is not None:
        Image.fromarray(np.asarray(background_image, np.uint8)).save(p("background_image.png"))


def save_results(
    exp: Experiment,
    edited_image: np.ndarray,
    loss_log: Dict,
    method: str = "ours",
) -> None:
    """Write edit outputs next to the inputs (save_results,
    large_scale_editor.py:133-177): result_ls.png + loss log (json instead
    of pickle — same content, safely parseable)."""
    folder = exp.path
    Image.fromarray(np.asarray(edited_image, np.uint8)).save(
        os.path.join(folder, "result_ls.png")
    )
    h, w = [int(v) for v in exp.image_shape[:2]]
    if (h, w) != edited_image.shape[:2]:
        resized = np.asarray(
            Image.fromarray(np.asarray(edited_image, np.uint8)).resize((w, h))
        )
        Image.fromarray(resized).save(os.path.join(folder, "resized_result_ls.png"))
    with open(os.path.join(folder, "loss_log.json"), "w") as f:
        json.dump({str(k): v for k, v in loss_log.items()}, f, indent=1)


INVERSION_CACHE_FILE = "inversion.npz"


def load_inversion(folder: str, key: str):
    """Return the cached DDIM inversion trajectory for `key`, or None.

    `all_latents` is a pure function of (image, prompt, scheduler, model) —
    the reference re-inverts on every edit of the same image
    (editor.py:581-589, ~28% of each edit here); the experiment folder is
    the natural cache for the iterate-on-transform-knobs workflow.  The file
    holds exactly one entry; a key mismatch (different prompt/config/model)
    reads as a miss and is overwritten by the next save.
    """
    path = os.path.join(folder, INVERSION_CACHE_FILE)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["key"]) != key:
                return None
            return z["all_latents"]
    except Exception:
        return None


def save_inversion(folder: str, key: str, all_latents: np.ndarray) -> None:
    if not os.path.isdir(folder):
        return
    tmp = os.path.join(folder, INVERSION_CACHE_FILE + ".tmp.npz")
    np.savez(tmp, key=np.str_(key), all_latents=np.asarray(all_latents, np.float32))
    os.replace(tmp, os.path.join(folder, INVERSION_CACHE_FILE))


def list_experiments(root: str):
    """Yield (category, folder) pairs under an experiment root
    (the sweep structure of large_scale_editor.py:366-399)."""
    for cat in sorted(os.listdir(root)):
        cat_dir = os.path.join(root, cat)
        if not os.path.isdir(cat_dir):
            continue
        for num in sorted(os.listdir(cat_dir), key=lambda s: (len(s), s)):
            exp_dir = os.path.join(cat_dir, num)
            if os.path.isdir(exp_dir) and os.path.exists(
                os.path.join(exp_dir, "input_image.png")
            ):
                yield cat, exp_dir


def edit_type_for_category(category: str) -> Optional[str]:
    """Category -> edit type routing (large_scale_editor.py:377-386):
    Removal -> remover; Rotation_2D/Scaling skipped; stitch categories (the
    reference's ui_outputs/stitching tree, large_scale_editor.py:325-326)
    -> stitch; else editor."""
    if category in ("Rotation_2D", "Scaling"):
        return None
    if category == "Removal":
        return "geometry_remover"
    if category.lower() in ("stitch", "stitching", "geometry_stitch"):
        return "geometry_stitch"
    return "geometry_editor"
