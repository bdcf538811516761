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

import logging
import os
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("geodiffuser_tpu.sharding")

_DIST_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Multi-host job launch over DCN (SURVEY §2.4's distributed surface).

    Edits never communicate, so multi-host scaling is a *sweep partition*:
    each host process runs its share of the experiment folders on its local
    chips (see `partition_for_process` / `run_folder_sweep`), and the only
    cross-host traffic is `jax.distributed` control-plane setup — nothing
    rides DCN in steady state, which is exactly the right design for
    independent edits (vs the reference's strictly single-GPU sequential
    sweep, large_scale_editor.py:366-399).

    Triggers (checked in order; returns True iff running multi-process):
      * already initialized (idempotent);
      * GEODIFF_COORDINATOR / GEODIFF_NUM_PROCESSES / GEODIFF_PROCESS_ID —
        explicit DCN launch, e.g.
          GEODIFF_COORDINATOR=host0:8476 GEODIFF_NUM_PROCESSES=4 \\
          GEODIFF_PROCESS_ID=$i python -m geodiffuser_tpu.parallel.driver ...
      * GEODIFF_AUTO_DISTRIBUTED=1 — Cloud-TPU pod autodetection
        (jax.distributed.initialize() with no args).

    Must run before any other jax call in the process; the driver's main()
    calls it first.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("GEODIFF_COORDINATOR")
    nproc = os.environ.get("GEODIFF_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ["GEODIFF_PROCESS_ID"]),
        )
        _DIST_INITIALIZED = True
        log.info("jax.distributed initialized: process %d/%d, %d local devices",
                 jax.process_index(), jax.process_count(), len(jax.local_devices()))
        return True
    if os.environ.get("GEODIFF_AUTO_DISTRIBUTED"):
        jax.distributed.initialize()
        _DIST_INITIALIZED = True
        log.info("jax.distributed autodetected: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    return jax.process_count() > 1


def partition_for_process(items: Sequence,
                          n_proc: Optional[int] = None,
                          pid: Optional[int] = None) -> List:
    """This process's share of a work list: round-robin by process index
    (keeps per-category runs interleaved so hosts finish together)."""
    n_proc = jax.process_count() if n_proc is None else n_proc
    pid = jax.process_index() if pid is None else pid
    if n_proc <= 1:
        return list(items)
    return [it for i, it in enumerate(items) if i % n_proc == pid]


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devs = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, axis_names=("dp", "tp"))


# HBM per JAX device (GiB) by device kind.  memory_stats() is empty through
# the axon tunnel (and absent on some backends), so capacity is tabled by
# generation; the table is the fallback, a reported bytes_limit wins.
_HBM_GIB = {
    "TPU v2": 8.0,
    "TPU v3": 16.0,
    "TPU v4": 32.0,
    "TPU v4 lite": 8.0,
    "TPU v5 lite": 16.0,   # v5e
    "TPU v5": 95.0,        # v5p
    "TPU v6 lite": 32.0,   # v6e / Trillium
}


def device_hbm_gib(device) -> Optional[float]:
    """Usable accelerator memory of one JAX device in GiB, or None when it
    cannot be determined (host-CPU test meshes)."""
    try:
        stats = device.memory_stats() or {}
        if stats.get("bytes_limit"):
            return float(stats["bytes_limit"]) / 2**30
    except Exception:  # pragma: no cover - backend-dependent
        pass
    kind = getattr(device, "device_kind", "")
    if kind in _HBM_GIB:
        return _HBM_GIB[kind]
    return 16.0 if device.platform == "tpu" else None


def per_chip_packing(hbm_gib: Optional[float], image_size: int = 512) -> int:
    """Throughput-optimal edits resident per chip.

    Measured basis (PARITY §7b, one 16 GB v5e at 512^2, bf16, no remat):
    E=4 is the optimum — E=8 still fits but the CFG step regresses on
    bandwidth.  Smaller chips halve the packing; sub-256^2 latents are a
    conservative 2x extrapolation (quarter the activation footprint),
    capped at the measured E=8 fit."""
    if hbm_gib is None:
        return 1
    if hbm_gib >= 14.0:
        per = 4
    elif hbm_gib >= 8.0:
        per = 2
    else:
        per = 1
    if image_size <= 256:
        per = min(8, per * 2)
    return per


def auto_group_size(image_size: int = 512, devices: Optional[Sequence] = None) -> int:
    """Default lockstep group for the batch driver (VERDICT r3 next-#4):
    per-chip packing x LOCAL device count on TPU (each host process packs
    its own chips); 0 (the sequential single-edit path) elsewhere, where no
    packing measurement exists."""
    devices = list(devices if devices is not None else jax.local_devices())
    if not devices or devices[0].platform != "tpu":
        return 0
    return per_chip_packing(device_hbm_gib(devices[0]), image_size) * len(devices)


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
