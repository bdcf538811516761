"""Stable-Diffusion pipeline context: models + params + tokenizer + schedule.

Replaces the reference's mutable module-global model cache
(`LDM_STABLE/TOKENIZER/SCHEDULER/UNET_NAME`, editor.py:52-56, 553-579) — an
unguarded shared-state hazard under Gradio's request queue — with an explicit
immutable context object.

Weights: loaded from a local diffusers-format checkpoint when available
(models/weights.py); otherwise deterministically random-initialized (this
build environment has no network egress, so benchmarks run with random
weights — wall-clock is weight-independent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.config import ModelConfig, SchedulerConfig
from geodiffuser_tpu.core import scheduler as sched
from geodiffuser_tpu.models.clip_text import CLIPTextEncoder
from geodiffuser_tpu.models.tokenizer import load_tokenizer
from geodiffuser_tpu.models.unet import UNet2DCondition
from geodiffuser_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass(frozen=True)
class Pipeline:
    config: ModelConfig
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    params: Any          # {"unet": .., "vae": .., "text": ..}
    tokenizer: Any
    schedule: sched.Schedule
    image_size: int = 512
    # jitted encoder/decoder wrappers (one compile per shape); created lazily
    _jit_cache: dict = dataclasses.field(default_factory=dict, compare=False)

    @property
    def latent_size(self) -> int:
        return self.image_size // 8

    # -- factory ------------------------------------------------------------
    @staticmethod
    def create(
        config: ModelConfig = ModelConfig(),
        image_size: int = 512,
        checkpoint_dir: Optional[str] = None,
        seed: int = 0,
    ) -> "Pipeline":
        unet = UNet2DCondition(config)
        vae = AutoencoderKL(config)
        text = CLIPTextEncoder(config)
        ls = image_size // 8
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        # init on tiny spatial shapes (params are shape-independent spatially)
        sample = jnp.zeros((1, 8, 8, config.in_channels))
        ctx = jnp.zeros((1, config.text_max_length, config.cross_attention_dim))
        img = jnp.zeros((1, 32, 32, 3))
        ids = jnp.zeros((1, config.text_max_length), jnp.int32)
        # jit the inits: eager flax init dispatches thousands of tiny ops
        # one-by-one (~ms each through the axon device tunnel -> ~320 s for
        # the UNet alone); one jitted program is ~56 s cold and ~s from the
        # persistent compile cache
        params = {
            "unet": jax.jit(unet.init)(k1, sample, jnp.int32(0), ctx),
            "vae": jax.jit(vae.init)(k2, img),
            "text": jax.jit(text.init)(k3, ids),
        }
        if checkpoint_dir:
            from geodiffuser_tpu.models import weights as weights_lib

            params = weights_lib.load_sd_checkpoint(checkpoint_dir, params, config)
        tokenizer = load_tokenizer(checkpoint_dir, config.text_vocab_size, config.text_max_length)
        schedule = sched.make_schedule(SchedulerConfig())
        return Pipeline(
            config=config, unet=unet, vae=vae, text_encoder=text, params=params,
            tokenizer=tokenizer, schedule=schedule, image_size=image_size,
        )

    # -- model wrappers (jitted; op-by-op dispatch through the device tunnel
    # costs ~ms per op, so even "one-shot" encoders must be compiled) -------
    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def text_fn(self):
        """The jitted text-encoder program (exposed so EditSession.precompile
        can compile it ahead of the first encode_text call)."""
        return self._jitted("text", lambda p, i: self.text_encoder.apply(p, i))

    def encode_text(self, prompts) -> jnp.ndarray:
        """List[str] -> (B, 77, cross_dim) float32 embeddings."""
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        return self.text_fn()(self.params["text"], ids)

    def vae_enc_fn(self):
        """The jitted single-image VAE-encode program (see text_fn)."""

        def enc(p, img):
            x = (img.astype(jnp.float32) * 2.0 - 1.0)[None]
            mean = self.vae.apply(p, x, method=self.vae.encode)
            return mean * self.config.vae_scaling_factor

        return self._jitted("vae_enc", enc)

    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 3) float in [0,1] -> (1, h, w, 4) scaled latents.

        Reference: image2latent (diffusion.py:71-97): x*2-1, VAE posterior
        mean, * 0.18215.
        """
        return self.vae_enc_fn()(self.params["vae"], jnp.asarray(image))

    def encode_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """(E, H, W, 3) float in [0,1] -> (E, h, w, 4) scaled latents.

        Batched variant of encode_image: one VAE dispatch for the whole edit
        batch instead of E sequential programs (the sharded driver's encode
        was the one O(E) host serialization left on its setup path)."""

        def enc(p, imgs):
            x = imgs.astype(jnp.float32) * 2.0 - 1.0
            mean = self.vae.apply(p, x, method=self.vae.encode)
            return mean * self.config.vae_scaling_factor

        return self._jitted("vae_enc_batch", enc)(self.params["vae"], jnp.asarray(images))

    def decode_latents(self, latents: jnp.ndarray) -> np.ndarray:
        """(S, h, w, 4) scaled latents -> (S, H, W, 3) uint8 images.

        Reference: latent2image (diffusion.py:62-68).
        """

        def dec(p, z):
            img = self.vae.apply(p, z / self.config.vae_scaling_factor, method=self.vae.decode)
            img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
            return jnp.round(img * 255.0).astype(jnp.uint8)

        key = f"vae_dec_{latents.shape[0]}"
        return np.asarray(self._jitted(key, dec)(self.params["vae"], latents))

    def unet_apply(self, params_unet, sample, t, context, edit=None, mutable=()):
        return self.unet.apply(params_unet, sample, t, context, edit, mutable=list(mutable))
