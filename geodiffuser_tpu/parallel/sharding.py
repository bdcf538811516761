"""Multi-chip parallelism for batched edits.

The reference is strictly single-GPU and sweeps experiment folders
sequentially (large_scale_editor.py:366-399).  Edits never communicate, so
the natural multi-chip design (SURVEY.md §2.4/§5) is *data parallelism at
the edit level*: a mesh axis "dp" shards a batch of independent edits, model
params are replicated, and collectives only appear if a reduction over edits
is requested (e.g. mean loss for logging) — riding ICI via jnp.mean under
pjit.

A second mesh axis "tp" is reserved for within-edit tensor parallelism of
the UNet (attention heads / FF shards).  Per SURVEY §2.4 the 2-4 stream
batch per edit makes whole-edit-per-chip residency the right grain, so tp=1
is the default; the axis exists so larger models can shard without API
changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devs = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, axis_names=("dp", "tp"))


def edit_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = edits, sharded over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_edit_pytree(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree whose leaves all have a leading edit axis."""
    s = edit_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), params)
