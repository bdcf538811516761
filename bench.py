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

Robustness ladder against the round-3/round-4 empty-artifact failures:
 1. The precompile LOWERS sequentially (deterministic persistent-cache keys;
    see EditSession._lower_and_compile) and runs under a DEADLINE
    (--budget-s * --precompile-deadline-frac from process start): when cold
    compile mass would otherwise eat the whole budget, the optional
    taps-CFG/fused-tail programs are skipped and the edit runs on the
    minimal program set — a slightly slower but REAL measurement.
 2. Per-program persistent-cache hit/miss is printed at precompile end, so
    any cold run is diagnosable after the fact (VERDICT r4 #3).
 3. A PROVISIONAL headline line (the warmup edit's loop time) is emitted
    before the measured repeats; later lines supersede it (the driver
    parses the LAST JSON line).
 4. Extras (cached re-edit, remover) run under the wall-clock budget and
    re-emit the merged record as each one lands, so a timeout mid-extra
    keeps everything measured so far.

GEODIFFUSER_BENCH_MODE=remover (or --edit-type geometry_remover) makes the
REMOVER the headline measurement (identity transform, the reference's
Removal category — large_scale_editor.py:377-386).

Weights are random-init (no network egress in this environment); wall-clock
is weight-independent.  The run includes the complete pipeline the reference
executes per edit (editor.py:65-423): transform-field preprocessing, VAE
encode, 50-step CFG DDIM inversion, the 50-step edit loop with 17 grad-
through-UNet optimization steps, VAE decode and histogram matching.
"""

import argparse
import json
import os
import subprocess
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


def git_state() -> dict:
    """Commit + geodiffuser_tpu/ tree hash + dirty flag of the measured code
    (VERDICT r4 #8: scripts/check_rehearsed.py compares these against HEAD
    so post-rehearsal code commits can never ship unrehearsed silently)."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def run(*cmd):
        return subprocess.run(cmd, capture_output=True, text=True, cwd=cwd,
                              timeout=10).stdout.strip()

    try:
        return {
            "commit": run("git", "rev-parse", "HEAD"),
            "tree": run("git", "rev-parse", "HEAD:geodiffuser_tpu"),
            "dirty": bool(run("git", "status", "--porcelain",
                              "geodiffuser_tpu", "bench.py",
                              "__graft_entry__.py")),
        }
    except Exception:
        return {"commit": "unknown", "tree": "unknown", "dirty": True}


def write_extras(record: dict) -> None:
    """Record the merged measurement + the commit it ran at (VERDICT r4 #8:
    rehearsal-at-HEAD enforcement — tests/test_repo_hygiene.py compares
    this hash against HEAD's geodiffuser_tpu/ tree)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_EXTRAS.json"), "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--edit-type",
                    default=os.environ.get("GEODIFFUSER_BENCH_MODE",
                                           "geometry_editor"))
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("GEODIFFUSER_BENCH_BUDGET_S", 1200)),
                    help="wall-clock budget from process start; extras "
                         "(remover, cached re-edit) are skipped once exceeded")
    ap.add_argument("--precompile-deadline-frac", type=float,
                    default=float(os.environ.get(
                        "GEODIFFUSER_BENCH_PRECOMPILE_FRAC", 0.55)),
                    help="fraction of --budget-s after which the precompile "
                         "skips optional programs (taps-CFG, fused tail) and "
                         "the edit runs on the minimal program set")
    ap.add_argument("--skip-remover", action="store_true",
                    help="skip the secondary remover measurement")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks (safe default for "
                         "larger-than-512 images; the 512^2 benchmark fits "
                         "without it and runs ~5%% faster)")
    ap.add_argument("--prompt", default="benchmark scene")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    if args.edit_type == "remover":
        args.edit_type = "geometry_remover"

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
    is_remover = args.edit_type == "geometry_remover"
    transform = (np.eye(4, dtype=np.float32) if is_remover
                 else camera.compose_transform(tx=0.08, ry=15.0))
    label = f"sec/edit ({args.steps}-step DDIM, {args.size}^2" + (
        ", remover)" if is_remover else ")")

    # Warmup: compile the device programs (sequential lowering for stable
    # cache keys, concurrent backend compiles) under the precompile deadline,
    # then one full edit.
    t0 = time.time()
    deadline_ts = T_PROCESS_START + args.budget_s * args.precompile_deadline_frac
    note(f"warmup: precompile starting (deadline at "
         f"t={args.budget_s * args.precompile_deadline_frac:.0f}s; cold cache "
         "may take minutes)")
    timers = sess.precompile(uncond_prompt=(args.prompt == ecfg.uncond_text),
                             verbose=args.verbose, deadline_ts=deadline_ts)
    report = getattr(sess, "last_precompile_report", {})
    note(f"precompile done: { {k: round(v, 1) for k, v in timers.items()} }")
    note(f"precompile cache[{report.get('cache_dir')}]: {report.get('cache')}")
    if report.get("skipped"):
        note(f"precompile SKIPPED (deadline) -> minimal program set: "
             f"{report['skipped']}")
    res = sess.run(image, depth, mask, transform, prompt=args.prompt)
    warmup = time.time() - t0
    note(f"warmup (incl. compile): {warmup:.1f}s  timings={res.timings}")
    # provisional headline from the warmup edit (superseded by every later
    # emit — insurance against a timeout during the measured repeats)
    emit({"metric": label, "value": round(res.timings["total"], 3), "unit": "s",
          "vs_baseline": round(10.0 / res.timings["total"], 3),
          "provisional": True})

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        res = sess.run(image, depth, mask, transform, prompt=args.prompt)
        times.append(time.time() - t0)
        if args.verbose:
            note(f"edit: {times[-1]:.2f}s  timings={res.timings}")

    sec_per_edit = float(np.median(times))
    record = {
        "metric": label,
        "value": round(sec_per_edit, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / sec_per_edit, 3),
        "rehearsed": git_state(),
    }
    if report.get("minimal_mode"):
        record["minimal_programs"] = True
    # headline out the door FIRST — extras can never starve the artifact
    emit(record)
    write_extras(record)

    def budget_left(need: float) -> bool:
        ok = elapsed() + need <= args.budget_s
        if not ok:
            note(f"budget {args.budget_s:.0f}s: skipping extras needing ~{need:.0f}s "
                 f"at t={elapsed():.0f}s")
        return ok

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
        emit(record)
        write_extras(record)

    # Removal is the second headline edit type (large_scale_editor.py:377-386
    # maps the Removal category to geometry_remover).  Cost estimate: warm
    # caches make the remover precompile minutes cheaper than the editor's
    # cold warmup, but budget a full warmup to be safe; its own precompile
    # deadline keeps a cold-cache remover inside the budget too.
    if (not is_remover and not args.skip_remover
            and budget_left(0.25 * warmup + (1 + args.repeats) * sec_per_edit)):
        rcfg = EditConfig(num_ddim_steps=args.steps, edit_type="geometry_remover",
                          cache_inversion=False)
        rsess = EditSession(pipe, rcfg)
        r_deadline = T_PROCESS_START + args.budget_s * 0.95
        t0 = time.time()
        try:
            rsess.precompile(uncond_prompt=(args.prompt == rcfg.uncond_text),
                             deadline_ts=r_deadline)
            rrep = getattr(rsess, "last_precompile_report", {})
            note(f"remover precompile cache: {rrep.get('cache')} "
                 f"skipped={rrep.get('skipped')}")
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
        emit(record)
        write_extras(record)


if __name__ == "__main__":
    main()
