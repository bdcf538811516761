"""Latent/embedding update rules and the adaptive loss-weight schedule.

Rebuilds optimization.py of the reference:
  * `_update_latent` (optimization.py:165-253): masked asymmetric gradient
    step (2x inside the warped mask) on the edit latent and the conditional
    edit embedding, with non-finite protection;
  * the adaptive loss-weight schedulers (optimization.py:7-105) as pure
    host-side functions of (step, logged losses) -> new weight table.

Reference defect NOT replicated: the torch SGD path re-creates the param
list every step, silently discarding momentum state (optimization.py:196 —
state is keyed by tensor identity).  Our SGD carries momentum properly; the
effective reference behavior (plain SGD at the first step's lr) is available
with momentum=0.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


def effective_lr(lr: float, step: int, skip_optim_steps: int, num_ddim_steps: int) -> float:
    """l_eff = lr * (50 - i) * skip * (50 / T)  (editor.py:207; the two 50s
    are hardcoded in the reference independent of T)."""
    return lr * (50.0 - step) * skip_optim_steps * (50.0 / (num_ddim_steps + 1e-8))


class SGDState(flax.struct.PyTreeNode):
    mom_latent: jnp.ndarray
    mom_context: jnp.ndarray


def init_sgd_state(latent_edit: jnp.ndarray, ctx_edit: jnp.ndarray) -> SGDState:
    return SGDState(jnp.zeros_like(latent_edit), jnp.zeros_like(ctx_edit))


def apply_update(
    latent_edit: jnp.ndarray,
    ctx_edit: jnp.ndarray,
    grad_latent: jnp.ndarray,
    grad_ctx: jnp.ndarray,
    step_size: jnp.ndarray,
    mask_warped: Optional[jnp.ndarray],
    sgd: Optional[SGDState],
    momentum: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[SGDState]]:
    """One update of the edit-stream latent and conditional embedding.

    Manual path (sgd=None): the reference's masked asymmetric rule
    (optimization.py:224-247) — effective step (1 + mask) * step_size * grad
    on the latent (2x inside the warped mask), plain step on the embedding.

    SGD path: momentum update with the same mask weighting.
    Both paths nan_to_num the grads and keep only finite results
    (optimization.py:196-217).
    """
    gl = jnp.nan_to_num(grad_latent, nan=0.0, posinf=0.0, neginf=0.0)
    gc = jnp.nan_to_num(grad_ctx, nan=0.0, posinf=0.0, neginf=0.0)
    scale = 1.0 if mask_warped is None else (1.0 + mask_warped)

    if sgd is None:
        new_latent = latent_edit - step_size * scale * gl
        new_ctx = ctx_edit - step_size * gc
        new_state = None
    else:
        ml = momentum * sgd.mom_latent + gl
        mc = momentum * sgd.mom_context + gc
        new_latent = latent_edit - step_size * scale * ml
        new_ctx = ctx_edit - step_size * mc
        new_state = SGDState(ml, mc)

    new_latent = jnp.where(jnp.isfinite(new_latent), new_latent, latent_edit)
    new_ctx = jnp.where(jnp.isfinite(new_ctx), new_ctx, ctx_edit)
    return new_latent, new_ctx, new_state


def project_norm(latent_edit: jnp.ndarray, target_norm: jnp.ndarray) -> jnp.ndarray:
    """Re-project the edit latent to its pre-update Frobenius norm
    (editor.py:312-316)."""
    cur = jnp.sqrt(jnp.sum(latent_edit * latent_edit) + 1e-12)
    return latent_edit * target_norm / cur


# ---------------------------------------------------------------------------
# Adaptive loss weights (host-side float math; ~17 calls per edit)
# ---------------------------------------------------------------------------

WeightTable = Dict[str, Dict[str, float]]


def _clone(w: Mapping[str, Mapping[str, float]]) -> WeightTable:
    return {b: dict(t) for b, t in w.items()}


def adaptive_step(
    weights: WeightTable,
    defaults: Mapping[str, Mapping[str, float]],
    step: int,
    skip_optim_steps: int,
    num_ddim_steps: int,
    logged_self_removal: float,
    edit_type: str = "geometry_editor",
    removal_loss_value: float = -1.5,
) -> WeightTable:
    """Exponential expected-loss targeting of the removal weight
    (adaptive_optimization_step_editing/remover, optimization.py:7-105).

    Phase 1 (first 40% of steps): expected = target / 1.25^remaining;
    removal weight *= 1.3 if behind, /= 2.0 (editor) or /= 2.5 (remover) if
    far ahead.  Phase 2 (40-80%): *= 2.0 if behind (target - 0.3), else
    reset to defaults.  Phase 3: reset to defaults.
    """
    w = _clone(weights)
    frac = step / num_ddim_steps
    down = 2.0 if edit_type == "geometry_editor" else 2.5

    if frac < 0.4:
        remaining = int((0.4 - frac) * num_ddim_steps / skip_optim_steps)
        expected = removal_loss_value / (1.25 ** remaining)
        if expected < logged_self_removal:
            w["self"]["removal"] *= 1.3
        elif 2.5 * expected > logged_self_removal:
            w["self"]["removal"] /= down
    elif frac < 0.8:
        if (removal_loss_value - 0.3) < logged_self_removal:
            w["self"]["removal"] *= 2.0
        else:
            w = _clone(defaults)
    else:
        w = _clone(defaults)
    return w


def adaptive_step_stitching(
    weights: WeightTable,
    defaults: Mapping[str, Mapping[str, float]],
    step: int,
    skip_optim_steps: int,
    num_ddim_steps: int,
    logged_self_sim: float,
    sim_key: str = "sim",
) -> WeightTable:
    """Adaptive stitching weight schedule
    (adaptive_optimization_step_stitching, optimization.py:109-162):
    exponential expected-loss targeting of the background-similarity weight.

    Phase 1 (first 40%): expected = 0.18 / 1.01^remaining; sim weight *= 1.1
    if behind, /= 2.5 if far ahead.  Phase 2 (40-70%): *= 1.1 while the
    logged sim loss stays above 0.2, else reset.  Phase 3: reset to defaults.

    The reference's stitch controller keys this on its `sim_out` loss; our
    stitch redesign (editor.perform_stitch) reuses the editor loss set, so
    the key defaults to `sim`.
    """
    w = _clone(weights)
    frac = step / num_ddim_steps
    if frac < 0.4:
        remaining = int((0.4 - frac) * num_ddim_steps / skip_optim_steps)
        expected = 0.18 / (1.01 ** remaining)
        if expected < logged_self_sim:
            w["self"][sim_key] *= 1.1
        elif 2.5 * expected > logged_self_sim:
            w["self"][sim_key] /= 2.5
    elif frac < 0.7:
        if logged_self_sim > 0.2:
            w["self"][sim_key] *= 1.1
        else:
            w = _clone(defaults)
    else:
        w = _clone(defaults)
    return w
