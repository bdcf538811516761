"""Op-level profile of the edit-step programs via jax.profiler + ProfileData.

Aggregates device-plane event durations by op name to show where the UNet
step time actually goes (no TensorBoard needed).
"""
import glob
import os
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

# Profile the static-phase variants the run() loop actually dispatches
# (self_window/past_obj compiled as constants — no per-layer lax.conds);
# the early-window phase (w=1, o=0) is where the optimize steps live.
run_cfg = lambda: sess._cfg_step(
    params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
    np.float32(1.0), np.float32(0.5), lat0, np.bool_(False), wm,
    self_window=True, past_obj=False)
run_opt = lambda: sess._optimize_step(
    params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
    np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm,
    self_window=True, past_obj=False)[3]

# warm up
sync(run_cfg())
sync(run_opt())

outdir = "/tmp/jax_trace"
os.makedirs(outdir, exist_ok=True)
with jax.profiler.trace(outdir):
    for _ in range(3):
        out = run_cfg()
    sync(out)
    for _ in range(3):
        out = run_opt()
    sync(out)

# parse the xspace
paths = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
print("traces:", paths, flush=True)
if not paths:
    sys.exit("no trace written")
pd = jax.profiler.ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
for plane in pd.planes:
    print(f"== plane: {plane.name}", flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    n_lines = 0
    for line in plane.lines:
        n_lines += 1
        for ev in line.events:
            agg[ev.name] += ev.duration_ns
            cnt[ev.name] += 1
    total = sum(agg.values())
    if not total:
        continue
    print(f"   lines={n_lines} total={total/1e6:.1f} ms (3x cfg + 3x opt)")
    for name, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        print(f"   {ns/1e6:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")
