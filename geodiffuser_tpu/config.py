"""Typed configuration for the GeoDiffuser-TPU framework.

The reference (RahulSajnani/GeoDiffuser) has no unified config system: it uses
module-level mutable globals (`editor.py:30-61`), 27-kwarg function signatures
(`editor.py:428-456`), and per-edit-type hardcoded weight tables
(`large_scale_editor.py:199-299`).  This module replaces all of that with
frozen dataclasses.

All values here are *static* (Python-level) configuration; traced runtime
state lives in `geodiffuser_tpu.core.edit_state`.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SplatConfig:
    """Point-splat parameters.

    Mirrors the reference splatter defaults (`warp_utils.py:50-66`:
    radius=1.3 px, points_per_pixel=15, tau=1.0, rad_pow=2) and the per-step
    annealing applied in the edit loop (`editor.py:154-156`).

    On TPU the splat is a z-aware soft scatter (see `ops/splat.py`), so
    `points_per_pixel` maps to the sharpness of the z weighting rather than a
    hard top-k; `z_beta` controls occlusion hardness.
    """

    radius: float = 1.3
    tau: float = 1.0
    points_per_pixel: int = 15
    rad_pow: int = 2
    z_beta: float = 20.0  # occlusion sharpness for the soft z-buffer weighting

    # Per-step annealing factors (reference: editor.py:154-156)
    radius_decay: float = 0.95
    tau_decay: float = 0.8
    tau_floor: float = 0.1
    ppp_decay: float = 0.9
    ppp_floor: int = 4


# Loss-weight tables.  Reference defaults:
#  - editor:  attention_processors.py:729-730 (class defaults) and the batch
#    driver's tuned table large_scale_editor.py:282-283.
#  - remover: attention_processors.py:1015-1016 / large_scale_editor.py:260-261.
EDITOR_LOSS_WEIGHTS: Mapping[str, Mapping[str, float]] = {
    "self": {"sim": 55.0, "movement": 30.5, "removal": 2.6, "smoothness": 30.0, "amodal": 80.5},
    "cross": {"sim": 45.0, "movement": 30.34, "removal": 2.6, "smoothness": 15.0, "amodal": 3.5},
}
REMOVER_LOSS_WEIGHTS: Mapping[str, Mapping[str, float]] = {
    "self": {"sim": 55.0, "movement": 0.0, "removal": 4.6, "smoothness": 30.0, "amodal": 0.0},
    "cross": {"sim": 45.0, "movement": 0.0, "removal": 4.6, "smoothness": 15.0, "amodal": 0.0},
}
# Stitch sweep table (large_scale_editor.py:233-246).  The reference's stitch
# losses split in/out-of-mask terms (sim/sim_out, movement/movement_out); our
# stitch redesign (core/editor.perform_stitch) runs the editor loss set on the
# pre-composited image, where `sim` IS the out-of-mask background-preservation
# term and `movement` the in-mask placement term — so sim takes the
# reference's sim_out value (self 120 / cross 30) and movement its movement
# value (self 40 / cross 5).  removal/amodal are unused by the reference's
# stitch table and stay 0.
STITCH_LOSS_WEIGHTS: Mapping[str, Mapping[str, float]] = {
    "self": {"sim": 120.0, "movement": 40.0, "removal": 0.0, "smoothness": 2.0, "amodal": 0.0},
    "cross": {"sim": 30.0, "movement": 5.0, "removal": 0.0, "smoothness": 1.0, "amodal": 0.0},
}


@dataclasses.dataclass(frozen=True)
class EditConfig:
    """Full configuration of one geometric edit.

    Defaults follow the batch driver's tuned values for `geometry_editor`
    (`large_scale_editor.py:199-299`), which are the values behind the paper
    results — not the weaker `perform_geometric_edit` signature defaults.
    """

    edit_type: str = "geometry_editor"  # geometry_editor | geometry_remover | geometry_stitch
    image_size: int = 512
    num_ddim_steps: int = 50
    guidance_scale: float = 3.0
    prompt: str = ""
    uncond_text: str = ""
    seed: int = 1234

    # Optimization schedule (reference: editor.py:65-423)
    optimize_steps: float = 0.65     # fraction of steps with latent optimization
    skip_optim_steps: int = 2        # optimize every k-th step
    lr: float = 0.03
    latent_replace: float = 0.1      # fraction of steps with hard latent warp-replace
    obj_edit_step: float = 0.9       # fraction of steps with attention sharing ("diffusion correction" after)
    cross_replace_steps: float = 0.95
    self_replace_steps: float = 0.95
    optimize_embeddings: bool = True
    optimize_latents: bool = True
    use_optimizer: bool = True       # SGD(momentum) path vs masked asymmetric rule
    sgd_momentum: float = 0.9
    use_adaptive_optimization: bool = True
    removal_loss_value: float = -1.5  # adaptive expected removal loss target
    fast_start_steps: float = 0.0
    num_first_optim_steps: int = 1
    perform_inversion: bool = False  # null-text optimization (off by default, as in reference)
    # Memoize the DDIM inversion trajectory per (image, prompt, model):
    # in-memory on the session, on-disk in the experiment folder when one is
    # passed (exp_io.load/save_inversion).  The reference re-inverts on every
    # edit (editor.py:581-589).
    cache_inversion: bool = True

    # Geometry
    focal_length: float = 550.0      # vis_utils.py:406
    mask_dilate_remover: int = 5     # attention_processors.py:986
    amodal_erode: int = 3            # editor.py:633 (torch_erode default kernel)

    splat: SplatConfig = dataclasses.field(default_factory=SplatConfig)

    # Loss weights; None -> per-edit-type defaults.
    loss_weights: Optional[Mapping[str, Mapping[str, float]]] = None

    # Reference-defect toggles (see SURVEY.md §7 "hard parts"):
    # attention_sharing.py:37-42 *intends* two hard attention constraints but
    # the chained boolean indexing writes into a copy (silent no-op in torch).
    # False replicates the reference behavior; True applies the stated intent.
    apply_attention_constraints: bool = False

    def resolved_loss_weights(self) -> Mapping[str, Mapping[str, float]]:
        if self.loss_weights is not None:
            return self.loss_weights
        if self.edit_type == "geometry_remover":
            return REMOVER_LOSS_WEIGHTS
        if self.edit_type == "geometry_stitch":
            return STITCH_LOSS_WEIGHTS
        return EDITOR_LOSS_WEIGHTS

    @property
    def latent_size(self) -> int:
        return self.image_size // 8


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture config covering the SD-1.x family.

    Defaults are SD-1.4/1.5 (`CompVis/stable-diffusion-v1-4`; editor.py:34).
    Tiny configs (for CPU tests) are produced by `ModelConfig.tiny()`.
    """

    # UNet
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    # SD-2.x style per-down-block head counts (diffusers attention_head_dim
    # list, e.g. (5, 10, 20, 20) = 64-dim heads); None -> num_attention_heads
    # for every block (SD-1.x)
    attention_head_dims: Optional[Tuple[int, ...]] = None
    cross_attention_dim: int = 768
    transformer_layers_per_block: int = 1
    norm_num_groups: int = 32
    # SD-2.x Transformer2DModel uses Dense proj_in/proj_out; SD-1.x 1x1 convs
    use_linear_projection: bool = False
    # VAE
    vae_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    vae_layers_per_block: int = 2
    vae_latent_channels: int = 4
    vae_scaling_factor: float = 0.18215
    # CLIP text encoder (openai/clip-vit-large-patch14)
    text_vocab_size: int = 49408
    text_hidden_size: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_max_length: int = 77
    text_hidden_act: str = "quick_gelu"   # SD-2.x OpenCLIP uses "gelu"
    # numerics
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Rematerialize the high-resolution transformer blocks in the backward
    # pass (the optimize step differentiates through the whole UNet).
    # Measured on v5e (15.75G HBM) at 512^2: the geometry_editor optimize
    # program fits without remat (~5% faster end to end); the
    # geometry_remover program does NOT (17.0G > 15.75G).  True is the safe
    # default; bench.py uses --no-remat for the editor-only headline.
    remat: bool = True

    def heads_for_block(self, block_idx: int) -> int:
        if self.attention_head_dims is not None:
            return self.attention_head_dims[block_idx]
        return self.num_attention_heads

    @staticmethod
    def sd21() -> "ModelConfig":
        """stabilityai/stable-diffusion-2-1 geometry: 64-dim heads
        ((5,10,20,20) per block), linear transformer projections, OpenCLIP
        ViT-H text tower (1024-wide, penultimate layer -> 23 layers, gelu).

        Used by the SD-2.1 DIFT featurizer configuration the reference's MD
        metric requires (evaluation/dift_sd.py:13-80, t=261, up_ft_index=1;
        image_fidelity.py:150-166)."""
        return ModelConfig(
            attention_head_dims=(5, 10, 20, 20),
            cross_attention_dim=1024,
            use_linear_projection=True,
            text_hidden_size=1024,
            text_layers=23,
            text_heads=16,
            text_hidden_act="gelu",
        )

    @staticmethod
    def tiny_sd21() -> "ModelConfig":
        """Miniature SD-2.x-style config (per-block heads + linear
        projections) for CPU tests."""
        return dataclasses.replace(
            ModelConfig.tiny(),
            attention_head_dims=(1, 2, 2, 2),
            use_linear_projection=True,
            text_hidden_act="gelu",
        )

    @staticmethod
    def tiny() -> "ModelConfig":
        """A miniature config for CPU tests and the multichip dry run."""
        return ModelConfig(
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            num_attention_heads=2,
            cross_attention_dim=32,
            norm_num_groups=8,
            vae_block_out_channels=(16, 16, 32, 32),
            vae_layers_per_block=1,
            text_vocab_size=1000,
            text_hidden_size=32,
            text_layers=2,
            text_heads=2,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDIM schedule parameters (reference: diffusion.py:110, inversion.py:143)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    set_alpha_to_one: bool = False
