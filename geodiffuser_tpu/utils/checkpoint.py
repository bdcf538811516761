"""Orbax checkpointing of pipeline params + edit-session state.

The reference has no model-state checkpointing (weights come from the HF
hub; the experiment folder is the only persistence, SURVEY.md §5).  For a
production TPU deployment we add:
  * save/load of the full param tree (orbax, sharded-array aware), so
    converted SD/SAM/Depth-Anything weights are loaded once and restored
    fast on every host;
  * batch-sweep resume manifests complementing the driver's skip-existing.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def save_params(path: str, params: Any, force: bool = True) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=force)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


class SweepManifest:
    """Resumable record of a batch sweep (driver-side)."""

    def __init__(self, path: str):
        self.path = path
        self.done: Dict[str, float] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.done = json.load(f)

    def is_done(self, folder: str) -> bool:
        return folder in self.done

    def mark(self, folder: str, seconds: float) -> None:
        self.done[folder] = seconds
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.done, f, indent=1)
        os.replace(tmp, self.path)
