"""Benchmark: one full GeoDiffuser edit (50-step DDIM, 512x512) on TPU.

Prints the headline JSON line IMMEDIATELY after the first measured edit
(flushed), so a driver timeout during the optional extras can never produce
an empty artifact (the round-3 failure mode):

  {"metric": "sec/edit (50-step DDIM, 512^2)", "value": N, "unit": "s",
   "vs_baseline": B}

vs_baseline is measured against the driver target of 10 s/edit on v5e
(BASELINE.md): vs_baseline = 10.0 / measured, so > 1.0 beats the target.
The upstream GeoDiffuser README publishes no wall-clock numbers (its
"Speed up code" TODO checklist, reference README.md:55-56).

After the headline line, the remover + cached-re-edit extras run under a
wall-clock budget (--budget-s, default 1200 s measured from process start);
when they complete, ONE final merged JSON line (headline keys + extras) is
printed so the driver's tail parse picks up the full record, and the merged
record is also written to BENCH_EXTRAS.json.  When the budget is exceeded,
extras are skipped and only the headline line exists.

Weights are random-init (no network egress in this environment); wall-clock
is weight-independent.  The run includes the complete pipeline the reference
executes per edit (editor.py:65-423): transform-field preprocessing, VAE
encode, 50-step CFG DDIM inversion, the 50-step edit loop with 17 grad-
through-UNet optimization steps, VAE decode and histogram matching.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

T_PROCESS_START = time.time()


def build_scene(size: int):
    rng = np.random.RandomState(0)
    image = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    mask = (((xx - size * 0.4) ** 2 + (yy - size * 0.6) ** 2) < (size * 0.15) ** 2).astype(
        np.float32
    )
    depth = (0.3 + 0.5 * (yy / size)).astype(np.float32)
    return image, depth, mask


def emit(record: dict) -> None:
    """Print one JSON line and flush — the driver parses stdout's tail."""
    print(json.dumps(record), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--edit-type", default="geometry_editor")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("GEODIFFUSER_BENCH_BUDGET_S", 1200)),
                    help="wall-clock budget from process start; extras "
                         "(remover, cached re-edit) are skipped once exceeded")
    ap.add_argument("--skip-remover", action="store_true",
                    help="skip the secondary remover measurement")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks (safe default for "
                         "larger-than-512 images; the 512^2 benchmark fits "
                         "without it and runs ~5%% faster)")
    ap.add_argument("--prompt", default="benchmark scene")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    def elapsed():
        return time.time() - T_PROCESS_START

    def note(msg):
        print(f"# [{elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)

    import jax

    # persistent compilation cache: the optimize-step grad program takes
    # minutes to compile through the remote-compile tunnel; cache it on disk
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from geodiffuser_tpu.config import EditConfig, ModelConfig
    from geodiffuser_tpu.core.editor import EditSession
    from geodiffuser_tpu.core.pipeline import Pipeline
    from geodiffuser_tpu.ops import camera

    # bf16 params for inference (the reference runs fp16 weights,
    # diffusion.py:107); the UNet is frozen so no fp32 master copy is needed.
    mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                       remat=args.remat)
    # cache_inversion=False: the headline measures a FRESH edit (the session
    # memoizes the DDIM trajectory per image+prompt, which would otherwise
    # make repeat timings skip inversion); the cached re-edit workload is
    # recorded separately as repeat_edit_sec.
    ecfg = EditConfig(num_ddim_steps=args.steps, edit_type=args.edit_type,
                      cache_inversion=False)

    pipe = Pipeline.create(mcfg, image_size=args.size)
    sess = EditSession(pipe, ecfg)
    image, depth, mask = build_scene(args.size)
    transform = camera.compose_transform(tx=0.08, ry=15.0)

    # Warmup: compile the device programs concurrently (overlaps backend
    # compiles on a cold cache; ~no-ops on a warm one), then one full edit.
    t0 = time.time()
    note("warmup: parallel precompile starting (cold cache may take minutes)")
    timers = sess.precompile(uncond_prompt=(args.prompt == ecfg.uncond_text),
                             verbose=args.verbose)
    note(f"precompile done: { {k: round(v, 1) for k, v in timers.items()} }")
    res = sess.run(image, depth, mask, transform, prompt=args.prompt)
    warmup = time.time() - t0
    note(f"warmup (incl. compile): {warmup:.1f}s  timings={res.timings}")

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        res = sess.run(image, depth, mask, transform, prompt=args.prompt)
        times.append(time.time() - t0)
        if args.verbose:
            note(f"edit: {times[-1]:.2f}s  timings={res.timings}")

    sec_per_edit = float(np.median(times))
    record = {
        "metric": f"sec/edit ({args.steps}-step DDIM, {args.size}^2)",
        "value": round(sec_per_edit, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / sec_per_edit, 3),
    }
    # headline out the door FIRST — extras can never starve the artifact
    emit(record)
    headline_only = dict(record)

    def budget_left(need: float) -> bool:
        ok = elapsed() + need <= args.budget_s
        if not ok:
            note(f"budget {args.budget_s:.0f}s: skipping extras needing ~{need:.0f}s "
                 f"at t={elapsed():.0f}s")
        return ok

    extras_done = False
    # Re-edit of the same image (the UI transform-knob iteration workload):
    # the session's inversion cache converts the DDIM inversion to ~0 s.
    # Cost: ~2 edits (prime + measure) — no new compiles.
    import dataclasses as _dc

    if budget_left(2.5 * sec_per_edit):
        sess.cfg = _dc.replace(sess.cfg, cache_inversion=True)
        sess.run(image, depth, mask, transform, prompt=args.prompt)  # prime cache
        t0 = time.time()
        res = sess.run(image, depth, mask, transform, prompt=args.prompt)
        record["repeat_edit_sec"] = round(time.time() - t0, 3)
        note(f"repeat edit (cached inversion): {record['repeat_edit_sec']:.2f}s")
        sess.cfg = _dc.replace(sess.cfg, cache_inversion=False)
        extras_done = True

    # Removal is the second headline edit type (large_scale_editor.py:377-386
    # maps the Removal category to geometry_remover).  Cost: warmup (compile
    # when cold — budget a full warmup) + repeats edits.
    if (args.edit_type == "geometry_editor" and not args.skip_remover
            and budget_left(warmup + args.repeats * sec_per_edit)):
        rcfg = EditConfig(num_ddim_steps=args.steps, edit_type="geometry_remover",
                          cache_inversion=False)
        rsess = EditSession(pipe, rcfg)
        t0 = time.time()
        try:
            rsess.precompile(uncond_prompt=(args.prompt == rcfg.uncond_text))
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            record["remover_remat"] = bool(args.remat)
        except Exception as exc:  # HBM overflow -> retry with remat
            if "RESOURCE_EXHAUSTED" not in str(exc) and "memory" not in str(exc).lower():
                raise
            note("remover OOM without remat; retrying with remat")
            rpipe = Pipeline.create(
                ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=True),
                image_size=args.size,
            )
            rsess = EditSession(rpipe, rcfg)
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            record["remover_remat"] = True
        r_warm = time.time() - t0
        note(f"remover warmup: {r_warm:.1f}s  timings={rres.timings}")
        rtimes = []
        for _ in range(args.repeats):
            t0 = time.time()
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            rtimes.append(time.time() - t0)
            if args.verbose:
                note(f"remover edit: {rtimes[-1]:.2f}s  timings={rres.timings}")
        record["remover_sec"] = round(float(np.median(rtimes)), 3)
        record["remover_vs_baseline"] = round(10.0 / float(np.median(rtimes)), 3)
        extras_done = True

    if extras_done and record != headline_only:
        # final merged line (a superset of the headline line): drivers that
        # parse the LAST JSON line get the full record, drivers that parse
        # the FIRST get the headline — both are valid measurements
        emit(record)
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_EXTRAS.json"), "w") as f:
                json.dump(record, f, indent=1)
        except OSError:
            pass


if __name__ == "__main__":
    main()
