"""Per-program timing of the edit loop's device steps (fetch-forced sync)."""
import sys
import time

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

mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
ecfg = EditConfig()
pipe = Pipeline.create(mcfg, image_size=512)
sess = EditSession(pipe, ecfg)
image, depth, mask = build_scene(512)
transform = camera.compose_transform(tx=0.08, ry=15.0)


def sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


img = jnp.asarray(image, jnp.float32) / 255.0
tf, masks = sess._preprocess(
    img, jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(transform, jnp.float32)
)
ctx_c = pipe.encode_text(["probe"])
ctx_u = pipe.encode_text([""])
lat0 = pipe.encode_image(img)
all_lat, _ = sess._invert(pipe.params["unet"], lat0, ctx_u, ctx_c)
sync(all_lat)

x_t = all_lat[-1]
lat2 = jnp.concatenate([x_t, x_t], 0)
ctx4 = jnp.concatenate([ctx_u, ctx_u, ctx_c, ctx_c], 0).astype(jnp.float32)
w = {b: {k: np.float32(v) for k, v in t.items()} for b, t in ecfg.resolved_loss_weights().items()}
sgd = optimization.init_sgd_state(lat2[1], ctx4[3])
params = pipe.params["unet"]


def timeit(fn, iters=8):
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.time() - t0) / iters


wm = sess._warp_mats(masks, np.float32(1.0), np.float32(0.5))
dt = timeit(lambda: sess._warp_mats(masks, np.float32(1.0), np.float32(0.5)))
print(f"warp_mats build: {dt*1e3:.1f} ms", flush=True)

dt = timeit(lambda: sess._cfg_step(
    params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
    np.float32(1.0), np.float32(0.5), all_lat[40], np.bool_(False), wm))
print(f"cfg step: {dt*1e3:.1f} ms", flush=True)

dt = timeit(lambda: sess._optimize_step(
    params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
    np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm)[3], iters=5)
print(f"optimize step: {dt*1e3:.1f} ms", flush=True)

t0 = time.time()
out = sess._invert(params, lat0, ctx_u, ctx_c)
sync(out)
print(f"inversion scan: {(time.time()-t0):.2f} s", flush=True)
t0 = time.time()
out = sess._invert_cfg_free(params, lat0, ctx_u, ctx_c)
sync(out)
print(f"inversion scan (cfg-free): {(time.time()-t0):.2f} s", flush=True)
