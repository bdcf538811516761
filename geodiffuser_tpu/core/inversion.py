"""Jitted DDIM inversion (lax.scan over the full trajectory).

Rebuilds NullInversion.ddim_loop (inversion.py:131-196) — CFG-guided DDIM
inversion collecting the full latent trajectory — as a single compiled scan.
Null-text optimization (inversion.py:213-259) is intentionally a separate,
optional routine: the reference disables it by default ("not required for
GeoDiffuser", inversion.py:270-276) and GeoDiffuser passes
perform_inversion=False from the batch driver (large_scale_editor.py:208).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from geodiffuser_tpu.core import scheduler as sched
from geodiffuser_tpu.core.pipeline import Pipeline


def ddim_invert(
    pipeline: Pipeline,
    params_unet,
    latent: jnp.ndarray,          # (S0, h, w, 4) scaled latents at t=0
    context_uncond: jnp.ndarray,  # (S0, 77, D)
    context_cond: jnp.ndarray,    # (S0, 77, D)
    guidance_scale: float,
    num_steps: int,
    cfg_free: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (all_latents (num_steps+1, S0, h, w, 4), all_noise_cond
    (num_steps, S0, h, w, 4)).

    all_latents[k] is the latent at noise level (k-1)*ratio; index 0 is the
    clean latent, index num_steps the fully inverted x_T — matching the
    reference's `all_latent` list (inversion.py:138-193).

    Guidance is applied *during inversion* (the reference's choice,
    inversion.py:174-187) with the caller's guidance_scale.  cfg_free=True
    is the exact fast path for prompt == uncond_text (the batch driver's
    default): cond == uncond makes the guided eps equal the plain eps, so
    the doubled batch is skipped.
    """
    timesteps = jnp.asarray(sched.inverse_timesteps(num_steps, pipeline.schedule.num_train_timesteps))
    context = jnp.concatenate([context_uncond, context_cond], axis=0)  # (2*S0, 77, D)
    s0 = latent.shape[0]

    def step(x, t):
        if cfg_free:
            eps_c = pipeline.unet.apply(params_unet, x, t, context[s0:])
            eps_g = eps_c
        else:
            batched = jnp.concatenate([x, x], axis=0)
            eps = pipeline.unet.apply(params_unet, batched, t, context)
            eps_u, eps_c = eps[:s0], eps[s0:]
            eps_g = eps_u + guidance_scale * (eps_c - eps_u)
        x_next = sched.ddim_inverse_step(pipeline.schedule, eps_g, t, x, num_steps)
        return x_next, (x_next, eps_c)

    _, (lat_traj, noise_traj) = jax.lax.scan(step, latent.astype(jnp.float32), timesteps)
    all_latents = jnp.concatenate([latent[None].astype(jnp.float32), lat_traj], axis=0)
    return all_latents, noise_traj


def reconstruct(
    pipeline: Pipeline,
    params_unet,
    latent_T: jnp.ndarray,
    context_uncond: jnp.ndarray,
    context_cond: jnp.ndarray,
    guidance_scale: float,
    num_steps: int,
) -> jnp.ndarray:
    """CFG DDIM sampling from an inverted latent — the invert->reconstruct
    round trip is BASELINE config 1 and the core scheduler-parity check."""
    timesteps = jnp.asarray(sched.timesteps(num_steps, pipeline.schedule.num_train_timesteps))
    context = jnp.concatenate([context_uncond, context_cond], axis=0)
    s0 = latent_T.shape[0]

    def step(x, t):
        batched = jnp.concatenate([x, x], axis=0)
        eps = pipeline.unet.apply(params_unet, batched, t, context)
        eps_u, eps_c = eps[:s0], eps[s0:]
        eps_g = eps_u + guidance_scale * (eps_c - eps_u)
        return sched.ddim_step(pipeline.schedule, eps_g, t, x, num_steps), None

    out, _ = jax.lax.scan(step, latent_T.astype(jnp.float32), timesteps)
    return out


def null_text_optimization(
    pipeline: Pipeline,
    params_unet,
    all_latents: jnp.ndarray,      # (T+1, S0, h, w, 4) inversion trajectory
    context_uncond: jnp.ndarray,   # (S0, 77, D)
    context_cond: jnp.ndarray,     # (S0, 77, D)
    guidance_scale: float,
    num_steps: int,
    num_inner_steps: int = 10,
    early_stop_eps: float = 1e-5,
    lr: float = 1e-2,
):
    """Per-timestep null-text (unconditional embedding) optimization.

    Rebuilds NullInversion.null_optimization (inversion.py:213-259): for each
    denoising timestep, Adam-optimize the uncond embedding so the CFG DDIM
    step reproduces the stored inversion trajectory; lr decays 1e-2*(1-i/100),
    early stop at eps + i*2e-5.  Off by default — the reference ships with
    perform_inversion=False ("Null text optimization is not required for
    GeoDiffuser", inversion.py:270) — but provided for API completeness.

    Returns (T, S0, 77, D) optimized uncond embeddings, one per timestep.
    """
    import optax

    timesteps = sched.timesteps(num_steps, pipeline.schedule.num_train_timesteps)

    def recon_loss(uncond, latent_cur, eps_cond, t):
        eps_u = pipeline.unet.apply(params_unet, latent_cur, t, uncond)
        eps = eps_u + guidance_scale * (eps_cond - eps_u)
        prev = sched.ddim_step(pipeline.schedule, eps, t, latent_cur, num_steps)
        return prev, eps

    def loss_fn(uncond, latent_cur, latent_prev, eps_cond, t):
        prev, _ = recon_loss(uncond, latent_cur, eps_cond, t)
        return jnp.mean((prev - latent_prev) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    eps_cond_fn = jax.jit(
        lambda p, x, t, c: pipeline.unet.apply(p, x, t, c)
    )
    step_fn = jax.jit(
        lambda uncond, latent_cur, eps_cond, t: recon_loss(uncond, latent_cur, eps_cond, t)[0]
    )

    uncond = context_uncond.astype(jnp.float32)
    latent_cur = all_latents[-1]
    out = []
    for i, t in enumerate(timesteps):
        t_j = jnp.int32(t)
        latent_prev = all_latents[num_steps - 1 - i]
        eps_cond = eps_cond_fn(params_unet, latent_cur, t_j, context_cond)
        opt = optax.adam(lr * (1.0 - i / 100.0))
        opt_state = opt.init(uncond)
        for _ in range(num_inner_steps):
            loss, g = grad_fn(uncond, latent_cur, latent_prev, eps_cond, t_j)
            updates, opt_state = opt.update(g, opt_state)
            uncond = optax.apply_updates(uncond, updates)
            if float(loss) < early_stop_eps + i * 2e-5:
                break
        out.append(uncond)
        latent_cur = step_fn(uncond, latent_cur, eps_cond, t_j)
    return jnp.stack(out, axis=0)
