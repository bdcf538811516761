"""Measure the SHARDED (vmapped) step programs on the real chip at dp=1.

Gives the per-step basis for the v5e-8 throughput claim: the sharded
programs are the single-chip programs vmapped over the edit axis, so dp=N
runs N of these in parallel, one edit per chip.
"""
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
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import camera
from geodiffuser_tpu.parallel import sharding as sh
from geodiffuser_tpu.parallel.batch import ShardedEditSession


def sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(fn, iters=5):
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.time() - t0) / iters


mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
ecfg = EditConfig()
pipe = Pipeline.create(mcfg, image_size=512)
mesh = sh.make_mesh(n_dp=1)
sess = ShardedEditSession(pipe, ecfg, mesh=mesh)

image, depth, mask = build_scene(512)
e = 1
images = image[None]
depths = depth[None]
masks_in = mask[None]
transforms = np.asarray(camera.compose_transform(tx=0.08, ry=15.0))[None]

t0 = time.time()
res = sess.run_batch(images, depths, masks_in, transforms, prompts=["probe"])
print(f"sharded dp=1 full edit (warmup incl. compile): {time.time()-t0:.1f}s "
      f"timings={res.timings}", flush=True)
t0 = time.time()
res = sess.run_batch(images, depths, masks_in, transforms, prompts=["probe"])
print(f"sharded dp=1 full edit (steady): {time.time()-t0:.2f}s "
      f"timings={res.timings}", flush=True)

# per-program timings
img = jnp.asarray(images, jnp.float32) / 255.0
tf, masks = sess._b_preprocess(
    img, jnp.asarray(depths), jnp.asarray(masks_in),
    jnp.asarray(transforms, jnp.float32),
)
ctx_c = jnp.stack([pipe.encode_text(["probe"])[0]])[:, None]
ctx_u = jnp.stack([pipe.encode_text([""])[0]])[:, None]
lat0 = pipe.encode_image(img[0])                      # (1, h, w, 4)
lat2 = jnp.concatenate([lat0, lat0], axis=0)[None]    # (1, 2, h, w, 4)
ctx4 = jnp.concatenate([ctx_u, ctx_u, ctx_c, ctx_c], axis=1).astype(jnp.float32)
w = {b: {k: jnp.ones((e,), jnp.float32) * v for k, v in t.items()}
     for b, t in ecfg.resolved_loss_weights().items()}
sgd = jax.vmap(optimization.init_sgd_state)(lat2[:, 1], ctx4[:, 3])
params = sess.pipeline.params["unet"]
wm = sess._b_warp_mats(masks, jnp.float32(1.0), jnp.float32(0.5))

dt = timeit(lambda: sess._b_cfg(
    params, lat2, ctx4, jnp.int32(500), masks, jnp.int32(10), w,
    jnp.float32(1.0), jnp.float32(0.5), lat2[:, :1], jnp.bool_(False), wm))
print(f"sharded cfg step (dp=1): {dt*1e3:.1f} ms", flush=True)

dt = timeit(lambda: sess._b_optimize(
    params, lat2, ctx4, jnp.int32(500), masks, jnp.int32(10), w,
    jnp.float32(1.0), jnp.float32(0.5), jnp.float32(3.0), sgd, wm)[3], iters=3)
print(f"sharded optimize step (dp=1): {dt*1e3:.1f} ms", flush=True)
