"""UI callback layer — framework-native, UI-toolkit-agnostic.

Rebuilds the callback surface of the reference Gradio app
(ui_utils.py:322-995, wired in geo_diff_ui.py:62-1272) as plain functions
over an explicit `UIState`, so the same logic drives the gradio app
(ui/app.py), tests, or any other front end.  No mutable module globals.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from geodiffuser_tpu.config import EditConfig, SplatConfig
from geodiffuser_tpu.ops import camera
from geodiffuser_tpu.ops import image as image_ops
from geodiffuser_tpu.ops import splat as splat_ops
from geodiffuser_tpu.ops import transform_field as tf_ops
from geodiffuser_tpu.utils import depth as depth_utils
from geodiffuser_tpu.utils import exp_io

# preview overlay colors (ui_utils.py:466-492): orange = removed region,
# olive = amodal ring
ORANGE = np.array([255, 165, 0], np.uint8)
OLIVE = np.array([128, 128, 0], np.uint8)

# experiment categories (ui_utils.py:901-905), re-exported for the app layer
CATEGORIES = exp_io.CATEGORIES


@dataclasses.dataclass
class UIState:
    """Explicit replacement for the reference's shared module globals
    (editor.py:52-56) — one per browser session."""

    image: Optional[np.ndarray] = None       # (512, 512, 3) uint8
    mask: Optional[np.ndarray] = None        # (512, 512) float
    depth: Optional[np.ndarray] = None       # (512, 512) float
    background: Optional[np.ndarray] = None
    transform: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    image_shape: Tuple[int, int] = (512, 512)
    sam_predictor: object = None
    depth_predictor: object = None           # default ("depth_anything") backend
    depth_predictors: dict = dataclasses.field(default_factory=dict)  # per-model cache
    pipeline: object = None
    sessions: dict = dataclasses.field(default_factory=dict)
    # per-browser-session scratch dir for the DDIM inversion cache: knob
    # iteration that changes EditConfig creates a NEW EditSession (losing its
    # in-memory cache), but the disk cache keeps the trajectory as long as
    # (image, prompt, guidance, steps) are unchanged
    cache_dir: Optional[str] = None

    def inversion_cache_dir(self) -> str:
        if self.cache_dir is None:
            import tempfile

            self.cache_dir = tempfile.mkdtemp(prefix="geodiffuser_ui_")
        return self.cache_dir


@dataclasses.dataclass
class AdvancedOptions:
    """The reference UI's advanced-accordion knob surface
    (geo_diff_ui.py:291-527), mapped 1:1 onto EditConfig.

    `diffusion_correction` follows the reference mapping
    obj_edit_step = 1 - diffusion_correction (ui_utils.py:613).
    Loss weights of None keep the per-edit-type tuned defaults
    (config.EDITOR_LOSS_WEIGHTS / REMOVER_LOSS_WEIGHTS)."""

    guidance_scale: float = 3.0
    cross_replace_steps: float = 0.97
    self_replace_steps: float = 0.97
    skip_steps: int = 2
    latent_replace: float = 0.1
    optimize_steps: float = 0.65
    fast_optim_steps: float = 0.0            # fast_start_steps fraction
    num_first_optim_steps: int = 1
    num_ddim_steps: int = 50
    lr: float = 0.03
    splatting_radius: float = 1.3
    splatting_tau: float = 1.0
    splatting_points_per_pixel: int = 15
    cam_focal_length: float = 550.0
    diffusion_correction: float = 0.1
    removal_loss_adaptive_value: float = -1.5
    # per-loss weights (geo_diff_ui.py:430-527); None -> tuned defaults
    sim_loss_self: Optional[float] = None        # background preservation
    sim_loss_cross: Optional[float] = None
    movement_loss_self: Optional[float] = None   # object placement
    movement_loss_cross: Optional[float] = None
    removal_loss_self: Optional[float] = None
    removal_loss_cross: Optional[float] = None
    amodal_loss_self: Optional[float] = None
    amodal_loss_cross: Optional[float] = None
    smoothness_loss_self: Optional[float] = None
    smoothness_loss_cross: Optional[float] = None

    def loss_weight_table(self, edit_type: str):
        from geodiffuser_tpu.config import EDITOR_LOSS_WEIGHTS, REMOVER_LOSS_WEIGHTS

        base = REMOVER_LOSS_WEIGHTS if edit_type == "geometry_remover" else EDITOR_LOSS_WEIGHTS
        table = {b: dict(t) for b, t in base.items()}
        names = {
            "sim": (self.sim_loss_self, self.sim_loss_cross),
            "movement": (self.movement_loss_self, self.movement_loss_cross),
            "removal": (self.removal_loss_self, self.removal_loss_cross),
            "amodal": (self.amodal_loss_self, self.amodal_loss_cross),
            "smoothness": (self.smoothness_loss_self, self.smoothness_loss_cross),
        }
        overridden = False
        for key, (s, c) in names.items():
            if s is not None and key in table["self"]:
                table["self"][key] = float(s)
                overridden = True
            if c is not None and key in table["cross"]:
                table["cross"][key] = float(c)
                overridden = True
        return table if overridden else None

    def to_edit_config(self, edit_type: str = "geometry_editor") -> EditConfig:
        return EditConfig(
            edit_type=edit_type,
            guidance_scale=self.guidance_scale,
            cross_replace_steps=self.cross_replace_steps,
            self_replace_steps=self.self_replace_steps,
            skip_optim_steps=int(self.skip_steps),
            latent_replace=self.latent_replace,
            optimize_steps=self.optimize_steps,
            fast_start_steps=self.fast_optim_steps,
            num_first_optim_steps=int(self.num_first_optim_steps),
            num_ddim_steps=int(self.num_ddim_steps),
            lr=self.lr,
            focal_length=self.cam_focal_length,
            obj_edit_step=1.0 - self.diffusion_correction,
            removal_loss_value=self.removal_loss_adaptive_value,
            splat=SplatConfig(
                radius=self.splatting_radius,
                tau=self.splatting_tau,
                points_per_pixel=int(self.splatting_points_per_pixel),
            ),
            loss_weights=self.loss_weight_table(edit_type),
        )


def load_image(state: UIState, image: np.ndarray, size: int = 512) -> np.ndarray:
    """Resize the upload to the working square (geo_diff_ui flow)."""
    from PIL import Image

    state.image_shape = image.shape[:2]
    img = np.asarray(Image.fromarray(np.asarray(image, np.uint8)).resize((size, size)))
    state.image = img[..., :3]
    state.mask = None
    state.depth = None
    return state.image


def get_mask(state: UIState, x_frac: float, y_frac: float) -> np.ndarray:
    """Click-to-SAM-mask (ui_utils.py:322-360)."""
    assert state.image is not None
    if state.sam_predictor is None:
        raise RuntimeError("no SAM predictor configured (weights unavailable?)")
    state.mask = state.sam_predictor.mask_from_click(state.image, x_frac, y_frac)
    return state.mask


def set_mask(state: UIState, mask: np.ndarray) -> np.ndarray:
    state.mask = image_ops.binarize(np.asarray(mask, np.float32))
    state.mask = np.asarray(state.mask)
    return state.mask


# the reference dropdown exposes every depth_predictor.py backend
# (ui_utils.py:380-411 + depth_predictor.py:105-370)
DEPTH_MODELS = (
    "depth_anything", "dpt_large", "dpt_hybrid", "dpt_hybrid_kitti",
    "dpt_hybrid_nyu", "midas_v21", "zoedepth", "zoedepth_nk", "constant",
)


def get_depth(
    state: UIState, model: str = "depth_anything", translate_factor: float = 0.7
) -> np.ndarray:
    """Depth button (ui_utils.py:380-411): model choice + push-back factor."""
    assert state.image is not None
    h, w = state.image.shape[:2]
    if model == "constant":
        state.depth = depth_utils.constant_depth(h, w)
        return depth_utils.depth_scaler(state.depth)
    if model not in DEPTH_MODELS:
        raise ValueError(f"unknown depth model {model}; options: {DEPTH_MODELS}")
    pred = state.depth_predictors.get(model)
    if pred is None:
        if model == "depth_anything" and state.depth_predictor is not None:
            pred = state.depth_predictor
        else:
            pred = depth_utils.get_depth_predictor(model)
        state.depth_predictors[model] = pred
    state.depth = pred(state.image, translate_factor=translate_factor)
    return depth_utils.depth_scaler(state.depth)


def compose_transform_from_sliders(
    state: UIState,
    tx: float = 0.0, ty: float = 0.0, tz: float = 0.0,
    rx: float = 0.0, ry: float = 0.0, rz: float = 0.0,
    sx: float = 1.0, sy: float = 1.0, sz: float = 1.0,
) -> np.ndarray:
    """Slider ranges tx,ty,tz in [-.5,.5]; r in [-90,90] deg; s in [.5,1.5]
    composed T @ S @ Rx @ Ry @ Rz (ui_utils.py:529-555)."""
    state.transform = camera.compose_transform(tx, ty, tz, rx, ry, rz, sx, sy, sz)
    return state.transform


def get_transformed_preview(
    state: UIState,
    focal_length: float = 550.0,
    splat: SplatConfig = SplatConfig(),
) -> np.ndarray:
    """"Check Transformed Image" preview (project_image, ui_utils.py:414-503):
    warped image with orange fill where the object left and an olive amodal
    ring."""
    import jax.numpy as jnp

    assert state.image is not None and state.mask is not None and state.depth is not None
    tf = tf_ops.build_transform_field(
        jnp.asarray(state.image, jnp.float32) / 255.0,
        jnp.asarray(state.depth, jnp.float32),
        jnp.asarray(state.mask, jnp.float32),
        jnp.asarray(state.transform, jnp.float32),
        focal_length=focal_length,
        splat_radius=splat.radius, splat_tau=splat.tau, z_beta=splat.z_beta,
    )
    preview = np.asarray(jnp.clip(tf.warped_preview, 0, 1) * 255).astype(np.uint8)
    amodal = np.asarray(tf.amodal_mask)
    warped_mask = np.asarray(
        image_ops.binarize(
            splat_ops.splat_image(
                jnp.asarray(state.mask, jnp.float32)[..., None], tf.coords,
                radius=splat.radius, tau=splat.tau, z_beta=splat.z_beta,
            )[..., 0]
        )
    )
    removed = np.clip(state.mask - warped_mask, 0, 1)
    ring = np.clip(amodal - warped_mask, 0, 1)
    out = preview.copy()
    out[removed > 0.5] = ORANGE
    out[ring > 0.5] = OLIVE
    return out


def _get_session(state: UIState, cfg: EditConfig):
    from geodiffuser_tpu.core.editor import EditSession

    # key on the FULL config: most knobs are baked into the compiled step
    # programs (guidance scale, schedules, loss tables), so a coarser key
    # would silently reuse stale programs after an accordion change
    key = repr(cfg)
    if key not in state.sessions:
        state.sessions[key] = EditSession(state.pipeline, cfg)
    return state.sessions[key]


def get_edited_image(
    state: UIState, prompt: str = "", cfg: Optional[EditConfig] = None,
    adv: Optional[AdvancedOptions] = None, progress=None,
) -> np.ndarray:
    """"Move Object" (ui_utils.py:589-616); the full advanced-accordion knob
    surface passes through via `adv` (geo_diff_ui.py:291-527)."""
    assert state.image is not None and state.mask is not None and state.depth is not None
    if cfg is None:
        cfg = (adv or AdvancedOptions()).to_edit_config("geometry_editor")
    sess = _get_session(state, cfg)
    res = sess.run(state.image, state.depth, state.mask, state.transform,
                   prompt=prompt, progress=progress,
                   exp_folder=state.inversion_cache_dir())
    return res.edited_image


# remover knob defaults used by the reference inpaint tab
# (geo_diff_ui.py inpaint accordion + ui_utils.py:619-651)
REMOVER_ADVANCED_DEFAULTS = dict(
    guidance_scale=5.0, optimize_steps=0.85, latent_replace=0.4,
    cross_replace_steps=0.9, self_replace_steps=0.9,
)


def inpaint_mask(
    state: UIState, prompt: str = "", cfg: Optional[EditConfig] = None,
    adv: Optional[AdvancedOptions] = None, progress=None,
) -> np.ndarray:
    """"Inpaint Mask" (ui_utils.py:619-651): constant depth, identity
    transform, remover controller; `adv` threads the accordion knobs
    through instead of hardcoding the tab defaults."""
    assert state.image is not None and state.mask is not None
    h, w = state.image.shape[:2]
    if cfg is None:
        if adv is None:
            adv = AdvancedOptions(**REMOVER_ADVANCED_DEFAULTS)
        cfg = adv.to_edit_config("geometry_remover")
    sess = _get_session(state, cfg)
    res = sess.run(
        state.image, depth_utils.constant_depth(h, w), state.mask, np.eye(4),
        prompt=prompt, progress=progress,
        exp_folder=state.inversion_cache_dir(),
    )
    return res.edited_image


def save_experiment(state: UIState, root: str, category: str = "Mix",
                    result: Optional[np.ndarray] = None) -> str:
    """save_exp flow (ui_utils.py:52-109): auto-numbered folder under the
    category."""
    import os

    cat_dir = os.path.join(root, category)
    os.makedirs(cat_dir, exist_ok=True)
    nums = [int(d) for d in os.listdir(cat_dir) if d.isdigit()]
    folder = os.path.join(cat_dir, str(max(nums, default=0) + 1))
    exp_io.save_exp(
        folder, state.image, state.depth, state.mask, state.transform,
        result=result, background_image=state.background,
        image_shape=state.image_shape,
    )
    return folder


def load_experiment(state: UIState, folder: str):
    """read_exp flow (ui_utils.py:118-159)."""
    exp = exp_io.read_exp(folder)
    state.image = exp.input_image
    state.mask = image_ops.binarize(np.asarray(exp.input_mask, np.float32))
    state.mask = np.asarray(state.mask)
    state.depth = exp.depth
    state.transform = exp.transform
    state.background = exp.background_image
    state.image_shape = tuple(int(v) for v in exp.image_shape[:2])
    return exp
