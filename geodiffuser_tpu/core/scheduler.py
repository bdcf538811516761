"""DDIM and inverse-DDIM as pure functions of the cumulative alphas.

The closed forms are specified by the reference at inversion.py:47-65
(prev_step/next_step) with the schedule from diffusion.py:110 /
inversion.py:143: scaled-linear betas in [0.00085, 0.012], 1000 train steps,
clip_sample=False, set_alpha_to_one=False, leading timestep spacing.

Everything here is shape-static and jit/scan friendly; timesteps are traced
int32 scalars indexing a precomputed alphas_cumprod table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from geodiffuser_tpu.config import SchedulerConfig


class Schedule(NamedTuple):
    alphas_cumprod: jnp.ndarray   # (num_train_timesteps,)
    final_alpha_cumprod: jnp.ndarray  # scalar: ac[0] (set_alpha_to_one=False)
    num_train_timesteps: int


def make_schedule(cfg: SchedulerConfig = SchedulerConfig()) -> Schedule:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, cfg.num_train_timesteps) ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    ac = np.cumprod(1.0 - betas)
    final = 1.0 if cfg.set_alpha_to_one else ac[0]
    return Schedule(
        alphas_cumprod=jnp.asarray(ac, jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, jnp.float32),
        num_train_timesteps=cfg.num_train_timesteps,
    )


def timesteps(num_inference_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """Descending sampling timesteps, 'leading' spacing: [.., 40, 20, 0]
    reversed — matches diffusers DDIMScheduler.set_timesteps for SD-1.x."""
    ratio = num_train_timesteps // num_inference_steps
    return (np.arange(num_inference_steps) * ratio)[::-1].copy()


def inverse_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """Ascending inversion timesteps [0, 20, ..., 980] — matches diffusers
    DDIMInverseScheduler.set_timesteps (used at inversion.py:143-151)."""
    ratio = num_train_timesteps // num_inference_steps
    return np.arange(num_inference_steps) * ratio


def _alpha_at(schedule: Schedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t] with t < 0 mapping to final_alpha_cumprod."""
    safe_t = jnp.clip(t, 0, schedule.num_train_timesteps - 1)
    return jnp.where(t >= 0, schedule.alphas_cumprod[safe_t], schedule.final_alpha_cumprod)


def ddim_step(
    schedule: Schedule,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """One denoising step x_t -> x_{t-ratio} (eta=0).

    Spec: NullInversion.prev_step (inversion.py:47-55) — identical to
    diffusers DDIMScheduler.step with eta=0, clip_sample=False.
    """
    ratio = schedule.num_train_timesteps // num_inference_steps
    t_prev = t - ratio
    a_t = _alpha_at(schedule, t)
    a_prev = _alpha_at(schedule, t_prev)
    eps32 = eps.astype(jnp.float32)
    x32 = sample.astype(jnp.float32)
    x0 = (x32 - jnp.sqrt(1.0 - a_t) * eps32) / jnp.sqrt(a_t)
    out = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps32
    return out.astype(sample.dtype)


def ddim_inverse_step(
    schedule: Schedule,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """One inversion step: the sample at noise level (t - ratio) is pushed to
    level t.

    Spec: NullInversion.next_step (inversion.py:57-65) / diffusers
    DDIMInverseScheduler.step: "from" alpha is alphas_cumprod[t - ratio],
    mapping to alphas_cumprod[0] when t - ratio < 0 (set_alpha_to_one=False).
    """
    ratio = schedule.num_train_timesteps // num_inference_steps
    t_from = jnp.minimum(t - ratio, schedule.num_train_timesteps - 1)
    a_from = _alpha_at(schedule, t_from)
    a_to = _alpha_at(schedule, t)
    eps32 = eps.astype(jnp.float32)
    x32 = sample.astype(jnp.float32)
    x0 = (x32 - jnp.sqrt(1.0 - a_from) * eps32) / jnp.sqrt(a_from)
    out = jnp.sqrt(a_to) * x0 + jnp.sqrt(1.0 - a_to) * eps32
    return out.astype(sample.dtype)
