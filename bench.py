"""Benchmark: one full GeoDiffuser edit (50-step DDIM, 512x512) on TPU.

Prints ONE JSON line:
  {"metric": "sec/edit (50-step DDIM, 512^2)", "value": N, "unit": "s",
   "vs_baseline": B}

vs_baseline is measured against the driver target of 10 s/edit on v5e
(BASELINE.md): vs_baseline = 10.0 / measured, so > 1.0 beats the target.
The reference publishes no wall-clock numbers (README.md:55-56).

Weights are random-init (no network egress in this environment); wall-clock
is weight-independent.  The run includes the complete pipeline the reference
executes per edit (editor.py:65-423): transform-field preprocessing, VAE
encode, 50-step CFG DDIM inversion, the 50-step edit loop with 17 grad-
through-UNet optimization steps, VAE decode and histogram matching.
"""

import argparse
import json
import sys
import time

import numpy as np


def build_scene(size: int):
    rng = np.random.RandomState(0)
    image = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    mask = (((xx - size * 0.4) ** 2 + (yy - size * 0.6) ** 2) < (size * 0.15) ** 2).astype(
        np.float32
    )
    depth = (0.3 + 0.5 * (yy / size)).astype(np.float32)
    return image, depth, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--edit-type", default="geometry_editor")
    ap.add_argument("--skip-remover", action="store_true",
                    help="skip the secondary remover measurement (recorded as "
                         "extra keys in the same JSON line)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks (safe default for "
                         "larger-than-512 images; the 512^2 benchmark fits "
                         "without it and runs ~5%% faster)")
    ap.add_argument("--prompt", default="benchmark scene")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    # persistent compilation cache: the optimize-step grad program takes
    # ~15 min to compile through the remote-compile tunnel; cache it on disk
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

    # Warmup edit: compiles the 4 device programs.
    t0 = time.time()
    res = sess.run(image, depth, mask, transform, prompt=args.prompt)
    warmup = time.time() - t0
    if args.verbose:
        print(f"# warmup (incl. compile): {warmup:.1f}s  timings={res.timings}", file=sys.stderr)

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        res = sess.run(image, depth, mask, transform, prompt=args.prompt)
        times.append(time.time() - t0)
        if args.verbose:
            print(f"# edit: {times[-1]:.2f}s  timings={res.timings}", file=sys.stderr)

    sec_per_edit = float(np.median(times))
    record = {
        "metric": f"sec/edit ({args.steps}-step DDIM, {args.size}^2)",
        "value": round(sec_per_edit, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / sec_per_edit, 3),
    }

    # Re-edit of the same image (the UI transform-knob iteration workload):
    # the session's inversion cache converts the DDIM inversion to ~0 s.
    import dataclasses as _dc

    sess.cfg = _dc.replace(sess.cfg, cache_inversion=True)
    sess.run(image, depth, mask, transform, prompt=args.prompt)  # prime cache
    t0 = time.time()
    res = sess.run(image, depth, mask, transform, prompt=args.prompt)
    record["repeat_edit_sec"] = round(time.time() - t0, 3)
    if args.verbose:
        print(f"# repeat edit (cached inversion): {record['repeat_edit_sec']:.2f}s "
              f"timings={res.timings}", file=sys.stderr)
    sess.cfg = _dc.replace(sess.cfg, cache_inversion=False)

    # Removal is the second headline edit type (large_scale_editor.py:377-386
    # maps the Removal category to geometry_remover); record it in the same
    # JSON line so both numbers land in BENCH_r{N}.json.
    if args.edit_type == "geometry_editor" and not args.skip_remover:
        rcfg = EditConfig(num_ddim_steps=args.steps, edit_type="geometry_remover",
                          cache_inversion=False)
        rsess = EditSession(pipe, rcfg)
        t0 = time.time()
        try:
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            record["remover_remat"] = bool(args.remat)
        except Exception as exc:  # HBM overflow -> retry with remat
            if "RESOURCE_EXHAUSTED" not in str(exc) and "memory" not in str(exc).lower():
                raise
            print(f"# remover OOM without remat; retrying with remat", file=sys.stderr)
            rpipe = Pipeline.create(
                ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=True),
                image_size=args.size,
            )
            rsess = EditSession(rpipe, rcfg)
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            record["remover_remat"] = True
        r_warm = time.time() - t0
        if args.verbose:
            print(f"# remover warmup: {r_warm:.1f}s  timings={rres.timings}", file=sys.stderr)
        rtimes = []
        for _ in range(args.repeats):
            t0 = time.time()
            rres = rsess.run(image, depth, mask, np.eye(4), prompt=args.prompt)
            rtimes.append(time.time() - t0)
            if args.verbose:
                print(f"# remover edit: {rtimes[-1]:.2f}s  timings={rres.timings}", file=sys.stderr)
        record["remover_sec"] = round(float(np.median(rtimes)), 3)
        record["remover_vs_baseline"] = round(10.0 / float(np.median(rtimes)), 3)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
