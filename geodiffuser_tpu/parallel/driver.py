"""Batch edit driver: sweep an experiment-folder tree (large_scale_editor.py
rebuilt).

Improvements over the reference sweep (large_scale_editor.py:320-402),
per SURVEY.md §5:
  * skip-existing / resume (the reference has none);
  * compiled-session reuse across edits of the same type;
  * optional lockstep sharded execution of groups of edits over a device
    mesh (`--group-size`), replacing the strictly sequential loop;
  * per-experiment loss logs as JSON.

Per-edit-type hyperparameters follow the reference's tuned tables
(perform_exp, large_scale_editor.py:199-317).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

from geodiffuser_tpu.config import (
    EDITOR_LOSS_WEIGHTS,
    EditConfig,
    ModelConfig,
    SplatConfig,
)
from geodiffuser_tpu.utils import exp_io

log = logging.getLogger("geodiffuser_tpu.driver")

# Tuned per-type configs (large_scale_editor.py:199-317)
REMOVER_SWEEP_WEIGHTS = {
    "self": {"sim": 55.0, "movement": 0.0, "removal": 4.6, "smoothness": 30.0, "amodal": 0.0},
    "cross": {"sim": 45.0, "movement": 0.0, "removal": 4.6, "smoothness": 15.0, "amodal": 0.0},
}


def config_for_edit_type(edit_type: str, num_ddim_steps: int = 50) -> EditConfig:
    if edit_type == "geometry_remover":
        return EditConfig(
            edit_type=edit_type,
            num_ddim_steps=num_ddim_steps,
            guidance_scale=5.0,
            optimize_steps=0.85,
            latent_replace=0.4,
            cross_replace_steps=0.9,
            self_replace_steps=0.9,
            obj_edit_step=1.0,
            skip_optim_steps=2,
            loss_weights=REMOVER_SWEEP_WEIGHTS,
        )
    if edit_type == "geometry_stitch":
        # tuned stitch block (large_scale_editor.py:233-246): lr 0.03,
        # latent_replace 0.2, softer splat (tau 0.1, radius 1.0, ppp 30);
        # the rest inherit perform_exp's defaults (optimize 0.85,
        # cross/self replace 0.9, obj_edit 1.0, guidance 5.0,
        # large_scale_editor.py:199-212).  Weights: config.STITCH_LOSS_WEIGHTS.
        return EditConfig(
            edit_type=edit_type,
            num_ddim_steps=num_ddim_steps,
            guidance_scale=5.0,
            lr=0.03,
            optimize_steps=0.85,
            latent_replace=0.2,
            cross_replace_steps=0.9,
            self_replace_steps=0.9,
            obj_edit_step=1.0,
            skip_optim_steps=2,
            splat=SplatConfig(radius=1.0, tau=0.1, points_per_pixel=30),
        )
    return EditConfig(
        edit_type="geometry_editor",
        num_ddim_steps=num_ddim_steps,
        guidance_scale=3.0,
        optimize_steps=0.65,
        latent_replace=0.1,
        cross_replace_steps=0.95,
        self_replace_steps=0.95,
        obj_edit_step=0.9,
        skip_optim_steps=2,
        loss_weights=EDITOR_LOSS_WEIGHTS,
    )


def _experiment_loader(folders, use_native: Optional[bool]):
    """Iterator of Experiments over `folders`, in order.

    Default (use_native=None): the native C++ prefetcher (exp_loader.cpp) —
    background threads decode experiment k+1 while the device crunches k —
    falling back to the synchronous Python reader if the native library
    can't build/load.  use_native=True forces native (raises on failure);
    False forces the Python reader."""
    if use_native is False:
        return (exp_io.read_exp(f) for f in folders)
    try:
        from geodiffuser_tpu.native.loader import NativePrefetcher

        return iter(NativePrefetcher(list(folders), threads=2))
    except Exception as err:  # pragma: no cover - env-dependent
        if use_native:
            raise
        log.info("native prefetcher unavailable (%s); using python reader", err)
        return (exp_io.read_exp(f) for f in folders)


def run_folder_sweep(
    exp_root: str,
    checkpoint_dir: Optional[str] = None,
    num_ddim_steps: int = 50,
    image_size: int = 512,
    skip_existing: bool = True,
    group_size: Optional[int] = None,
    limit: Optional[int] = None,
    pipe=None,
    config_overrides: Optional[Dict] = None,
    use_native: Optional[bool] = None,
) -> Dict[str, float]:
    """Run every experiment under exp_root; returns {folder: seconds}.

    `pipe` injects a prebuilt Pipeline (tests use a tiny one);
    `config_overrides` are dataclasses.replace kwargs applied to every
    per-type EditConfig (e.g. num_ddim_steps for smoke runs);
    `use_native` controls the experiment loader (see _experiment_loader)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from geodiffuser_tpu.core.editor import EditSession
    from geodiffuser_tpu.core.pipeline import Pipeline
    from geodiffuser_tpu.parallel.batch import ShardedEditSession
    from geodiffuser_tpu.parallel.sharding import auto_group_size, make_mesh

    if group_size is None:
        # default: measured throughput-optimal packing on TPU (E=4/chip on a
        # 16 GB v5e at 512^2, PARITY §7b), sequential elsewhere
        group_size = auto_group_size(image_size)
        if group_size > 1:
            log.info("auto group size: %d (per-chip packing x devices)", group_size)

    if pipe is None:
        mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        pipe = Pipeline.create(mcfg, image_size=image_size, checkpoint_dir=checkpoint_dir)

    sessions: Dict[str, EditSession] = {}
    times: Dict[str, float] = {}
    todo = []
    for cat, folder in exp_io.list_experiments(exp_root):
        edit_type = exp_io.edit_type_for_category(cat)
        if edit_type is None:
            log.info("skipping category %s (%s)", cat, folder)
            continue
        if skip_existing and os.path.exists(os.path.join(folder, "result_ls.png")):
            log.info("skip existing %s", folder)
            continue
        todo.append((edit_type, folder))
        if limit and len(todo) >= limit:
            break

    # multi-host: each process sweeps its round-robin share on local chips
    # (sharding.maybe_initialize_distributed in main(); no DCN traffic in
    # steady state — edits are independent)
    import jax

    if jax.process_count() > 1:
        from geodiffuser_tpu.parallel.sharding import partition_for_process

        todo = partition_for_process(todo)
        log.info("process %d/%d: %d experiments assigned",
                 jax.process_index(), jax.process_count(), len(todo))

    def edit_inputs(edit_type: str, exp, cfg):
        """(image, depth, mask, transform) for the session.  Stitch
        experiments (background_image.png present) are pre-composited —
        the warped object pasted onto the background — and run as an
        identity-transform edit on the warped mask (perform_stitch)."""
        if edit_type == "geometry_stitch" and exp.background_image is not None:
            from geodiffuser_tpu.core.editor import stitch_composite

            comp, wmask = stitch_composite(
                cfg, exp.background_image, exp.input_image, exp.input_mask,
                exp.depth, exp.transform,
            )
            h, w = comp.shape[:2]
            return (comp, np.full((h, w), 0.5, np.float32), wmask,
                    np.eye(4, dtype=np.float32))
        return exp.input_image, exp.depth, exp.input_mask, exp.transform

    def get_session(edit_type: str) -> EditSession:
        if edit_type not in sessions:
            cfg = config_for_edit_type(edit_type, num_ddim_steps)
            if config_overrides:
                cfg = _dc.replace(cfg, **config_overrides)
            if group_size > 1:
                # dp must divide the edit batch: largest divisor of
                # group_size that fits the LOCAL device count (each process
                # runs its own sweep share on its own chips)
                import jax

                local = jax.local_devices()
                n_dp = max(d for d in range(1, min(group_size, len(local)) + 1)
                           if group_size % d == 0)
                sessions[edit_type] = ShardedEditSession(
                    pipe, cfg, mesh=make_mesh(n_dp=n_dp, devices=local[:n_dp])
                )
            else:
                sessions[edit_type] = EditSession(pipe, cfg)
        return sessions[edit_type]

    if group_size > 1:
        # lockstep groups per edit type; the loader prefetches/decodes the
        # next group's folders while the device executes the current one
        by_type: Dict[str, list] = {}
        for et, folder in todo:
            by_type.setdefault(et, []).append(folder)
        ordered = [f for folders in by_type.values() for f in folders]
        loader = _experiment_loader(ordered, use_native)
        for et, folders in by_type.items():
            sess = get_session(et)
            for i in range(0, len(folders), group_size):
                chunk = folders[i : i + group_size]
                exps = [next(loader) for _ in chunk]
                # pad the group to a full shard count by repeating the last
                pad = group_size - len(exps)
                exps_p = exps + [exps[-1]] * pad
                inputs = [edit_inputs(et, e, sess.cfg) for e in exps_p]
                t0 = time.time()
                res = sess.run_batch(
                    np.stack([i[0] for i in inputs]),
                    np.stack([i[1] for i in inputs]),
                    np.stack([i[2] for i in inputs]),
                    np.stack([i[3] for i in inputs]),
                    exp_folders=[e.path for e in exps_p],
                )
                dt = time.time() - t0
                for j, exp in enumerate(exps):
                    per_exp_log = {
                        k: {kk: vv[j].tolist() if hasattr(vv[j], "tolist") else float(vv[j])
                            for kk, vv in v.items()}
                        for k, v in res.loss_log.items()
                    }
                    exp_io.save_results(exp, res.edited_images[j], per_exp_log)
                    times[exp.path] = dt / len(exps)
                log.info("group of %d edits (%s): %.1fs", len(exps), et, dt)
    else:
        loader = _experiment_loader([f for _, f in todo], use_native)
        for (et, folder), exp in zip(todo, loader):
            sess = get_session(et)
            img, dep, msk, tra = edit_inputs(et, exp, sess.cfg)
            t0 = time.time()
            res = sess.run(img, dep, msk, tra, exp_folder=folder)
            dt = time.time() - t0
            exp_io.save_results(exp, res.edited_image, res.loss_log)
            times[folder] = dt
            log.info("%s (%s): %.1fs", folder, et, dt)
    return times


def main():
    ap = argparse.ArgumentParser(description="GeoDiffuser-TPU batch editor")
    ap.add_argument("exp_root")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--group-size", type=int, default=None,
                    help="lockstep group; default: auto (measured per-chip "
                         "packing x device count on TPU, sequential elsewhere);"
                         " 0/1 forces the sequential path")
    ap.add_argument("--no-skip-existing", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no-native", action="store_true",
                    help="force the synchronous Python experiment reader")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    from geodiffuser_tpu.parallel.sharding import maybe_initialize_distributed

    maybe_initialize_distributed()
    times = run_folder_sweep(
        args.exp_root,
        checkpoint_dir=args.checkpoint_dir,
        num_ddim_steps=args.steps,
        image_size=args.size,
        skip_existing=not args.no_skip_existing,
        group_size=args.group_size,
        limit=args.limit,
        use_native=False if args.no_native else None,
    )
    print(json.dumps({"edits": len(times), "mean_sec": float(np.mean(list(times.values()) or [0]))}))


if __name__ == "__main__":
    main()
