"""Decompose the optimize-step cost (editor vs remover) on the real TPU.

Components:
  fwd-vanilla   2-stream UNet forward, no edit state (inversion-style)
  fwd-loss      2-stream forward with edit + losses, no grad
  optimize      full value_and_grad + masked update (the recorded step)
  cfg           4-stream CFG step (for reference)
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
from geodiffuser_tpu.core import edit_attention, optimization
from geodiffuser_tpu.core.editor import EditSession
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import camera


def sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(fn, iters=8):
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.time() - t0) / iters


mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
pipe = Pipeline.create(mcfg, image_size=512)
image, depth, mask = build_scene(512)
img = jnp.asarray(image, jnp.float32) / 255.0

for edit_type in ("geometry_editor", "geometry_remover"):
    ecfg = EditConfig(edit_type=edit_type)
    sess = EditSession(pipe, ecfg)
    transform = (
        camera.compose_transform(tx=0.08, ry=15.0)
        if edit_type == "geometry_editor" else np.eye(4)
    )
    tf, masks = sess._preprocess(
        img, jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(transform, jnp.float32)
    )
    ctx_c = pipe.encode_text(["probe"])
    ctx_u = pipe.encode_text([""])
    lat0 = pipe.encode_image(img)
    x_t = lat0
    lat2 = jnp.concatenate([x_t, x_t], 0)
    ctx4 = jnp.concatenate([ctx_u, ctx_u, ctx_c, ctx_c], 0).astype(jnp.float32)
    w = {b: {k: np.float32(v) for k, v in t.items()}
         for b, t in ecfg.resolved_loss_weights().items()}
    sgd = optimization.init_sgd_state(lat2[1], ctx4[3])
    params = pipe.params["unet"]
    wm = sess._warp_mats(masks, np.float32(1.0), np.float32(0.5))

    print(f"=== {edit_type}", flush=True)

    @jax.jit
    def fwd_vanilla(params, lat2, t, ctx2):
        return pipe.unet.apply(params, lat2, t, ctx2, None)

    dt = timeit(lambda: fwd_vanilla(params, lat2, np.int32(500), ctx4[2:]))
    print(f"  fwd-vanilla (2-stream): {dt*1e3:.1f} ms", flush=True)

    def _state(compute_losses):
        return sess._state(masks, np.int32(10), w, np.float32(1.0), np.float32(0.5),
                           use_cfg=False, compute_losses=compute_losses, warp_mats=wm)

    @jax.jit
    def fwd_loss(params, lat2, t, ctx2):
        _, aux = pipe.unet.apply(params, lat2, t, ctx2, _state(True), mutable=["edit"])
        return edit_attention.collect_edit_aux(aux)[0]

    dt = timeit(lambda: fwd_loss(params, lat2, np.int32(500), ctx4[2:]))
    print(f"  fwd-loss (2-stream, edit+losses): {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def fwd_edit_noloss(params, lat2, t, ctx2):
        return pipe.unet.apply(params, lat2, t, ctx2, _state(False))

    dt = timeit(lambda: fwd_edit_noloss(params, lat2, np.int32(500), ctx4[2:]))
    print(f"  fwd-edit no-loss (2-stream): {dt*1e3:.1f} ms", flush=True)

    dt = timeit(lambda: sess._optimize_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm)[3], iters=5)
    print(f"  optimize step: {dt*1e3:.1f} ms", flush=True)

    dt = timeit(lambda: sess._cfg_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), lat0, np.bool_(False), wm))
    print(f"  cfg step (4-stream): {dt*1e3:.1f} ms", flush=True)

# ---- inversion decomposition: bare UNet scan vs the full inversion scan
ecfg0 = EditConfig()
ctx_c0 = pipe.encode_text(["probe"])
ctx_u0 = pipe.encode_text([""])
lat00 = pipe.encode_image(img)


@jax.jit
def bare_scan(params, latent, ctx2):
    def step(x, t):
        batched = jnp.concatenate([x, x], axis=0)
        eps = pipe.unet.apply(params, batched, t, ctx2)
        return x - 1e-4 * eps[:1], None

    out, _ = jax.lax.scan(step, latent, jnp.arange(50, dtype=jnp.int32) * 20)
    return out


from geodiffuser_tpu.core.editor import EditSession as _ES

sess0 = _ES(pipe, ecfg0)
ctx2_0 = jnp.concatenate([ctx_u0, ctx_c0], axis=0)

t0 = time.time()
out = bare_scan(pipe.params["unet"], lat00, ctx2_0)
sync(out)
t0 = time.time()
out = bare_scan(pipe.params["unet"], lat00, ctx2_0)
sync(out)
print(f"bare 50x 2-stream UNet scan: {time.time()-t0:.2f} s", flush=True)

t0 = time.time()
out = sess0._invert(pipe.params["unet"], lat00, ctx_u0, ctx_c0)
sync(out)
t0 = time.time()
out = sess0._invert(pipe.params["unet"], lat00, ctx_u0, ctx_c0)
sync(out)
print(f"full inversion scan: {time.time()-t0:.2f} s", flush=True)
