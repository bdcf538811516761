"""Op-level profile of the edit-step programs via jax.profiler + ProfileData.

Aggregates device-plane event durations by op name, ONE TRACE PER PROGRAM
(cfg, taps-CFG, optimize, remover-optimize), so every cost is attributable
to the program that pays it (no TensorBoard needed).

Usage:  python scripts/tpu_profile_steps.py [cfg optimize cfg_taps r_optimize]
"""
import glob
import os
import shutil
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import build_scene
from geodiffuser_tpu.config import EditConfig, ModelConfig
from geodiffuser_tpu.core import optimization
from geodiffuser_tpu.core.editor import EditSession
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import camera


def sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=False)
pipe = Pipeline.create(mcfg, image_size=512)
ecfg = EditConfig()
sess = EditSession(pipe, ecfg)
image, depth, mask = build_scene(512)
img = jnp.asarray(image, jnp.float32) / 255.0
tf, masks = sess._preprocess(
    img, jnp.asarray(depth), jnp.asarray(mask),
    jnp.asarray(camera.compose_transform(tx=0.08, ry=15.0), jnp.float32),
)
ctx_c = pipe.encode_text(["probe"])
ctx_u = pipe.encode_text([""])
lat0 = pipe.encode_image(img)
lat2 = jnp.concatenate([lat0, lat0], 0)
ctx4 = jnp.concatenate([ctx_u, ctx_u, ctx_c, ctx_c], 0).astype(jnp.float32)
w = {b: {k: np.float32(v) for k, v in t.items()}
     for b, t in ecfg.resolved_loss_weights().items()}
sgd = optimization.init_sgd_state(lat2[1], ctx4[3])
params = pipe.params["unet"]
wm = sess._warp_mats(masks, np.float32(1.0), np.float32(0.5))

# remover session shares the pipeline (separate static programs)
rcfg = EditConfig(edit_type="geometry_remover")
rsess = EditSession(pipe, rcfg)
_, rmasks = rsess._preprocess(
    img, jnp.asarray(depth), jnp.asarray(mask),
    jnp.asarray(np.eye(4, dtype=np.float32)),
)
rw = {b: {k: np.float32(v) for k, v in t.items()}
      for b, t in rcfg.resolved_loss_weights().items()}
rwm = rsess._warp_mats(rmasks, np.float32(1.0), np.float32(0.5))
rsgd = optimization.init_sgd_state(lat2[1], ctx4[3])

# Profile the static-phase variants the run() loop actually dispatches
# (self_window/past_obj compiled as constants — no per-layer lax.conds);
# the early-window phase (w=1, o=0) is where the optimize steps live.
RUNNERS = {
    "cfg": lambda: sess._cfg_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), lat0, np.bool_(False), wm,
        self_window=True, past_obj=False),
    "optimize": lambda: sess._optimize_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm,
        self_window=True, past_obj=False)[3],
    "r_optimize": lambda: rsess._optimize_step(
        params, lat2, ctx4, np.int32(500), rmasks, np.int32(10), rw,
        np.float32(1.0), np.float32(0.5), np.float32(3.0), rsgd, rwm,
        self_window=True, past_obj=True)[3],
}


def taps_runner():
    _, _, _, _, taps = sess._optimize_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm,
        self_window=True, past_obj=False)
    return lambda: sess._cfg_step_taps(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), lat0, np.bool_(False), wm, taps,
        self_window=True, past_obj=False)


def profile_one(name, runner, reps=3):
    sync(runner())  # compile + warm
    outdir = f"/tmp/jax_trace_{name}"
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(reps):
            out = runner()
        sync(out)
    paths = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        print(f"== {name}: no trace written"); return
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[-1], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
        total = sum(agg.values())
        if not total:
            continue
        # the jit_* umbrella event double-counts its children; report it
        # as the per-step time and the children as the breakdown
        prog = [(n, ns) for n, ns in agg.items() if n.startswith("jit_")]
        prog_ms = sum(ns for _, ns in prog) / 1e6 / reps
        print(f"== {name}: {prog_ms:.1f} ms/step (device plane, {reps} reps)")
        for n, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
            if n.startswith("jit_"):
                continue
            print(f"   {ns/1e6/reps:9.3f} ms/step  x{cnt[n]//reps:<4d} {n[:105]}")


if __name__ == "__main__":
    want = sys.argv[1:] or ["cfg", "optimize", "cfg_taps", "r_optimize"]
    for nm in want:
        runner = taps_runner() if nm == "cfg_taps" else RUNNERS[nm]
        profile_one(nm, runner)
