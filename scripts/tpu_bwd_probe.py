"""Decompose the optimize-step BACKWARD cost (remat=False, bench config).

  grad-plain   d(sum eps^2)/d(latent,ctx) through the vanilla 2-stream UNet
  grad-edit    same but with edit state active, no losses (blend path grads)
  grad-loss    the real optimize objective (edit + losses)
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
from geodiffuser_tpu.core import edit_attention
from geodiffuser_tpu.core.editor import EditSession
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import camera


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


mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=False)
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
    lat2 = jnp.concatenate([lat0, lat0], 0)
    ctx2 = jnp.concatenate([ctx_c, ctx_c], 0).astype(jnp.float32)
    w = {b: {k: np.float32(v) for k, v in t.items()}
         for b, t in ecfg.resolved_loss_weights().items()}
    params = pipe.params["unet"]
    wm = sess._warp_mats(masks, np.float32(1.0), np.float32(0.5))
    print(f"=== {edit_type} (remat=False)", flush=True)

    def _state(compute_losses, use_edit=True):
        if not use_edit:
            return None
        return sess._state(masks, np.int32(10), w, np.float32(1.0), np.float32(0.5),
                           use_cfg=False, compute_losses=compute_losses, warp_mats=wm)

    @jax.jit
    def grad_plain(params, lat, ctx):
        def f(l, c):
            eps = pipe.unet.apply(params, jnp.stack([lat[0], l]), jnp.int32(500),
                                  jnp.stack([ctx[0], c]), None)
            return jnp.sum(eps.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(lat[1], ctx[1])

    dt = timeit(lambda: grad_plain(params, lat2, ctx2), iters=3)
    print(f"  fwd+bwd plain UNet: {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def grad_edit_noloss(params, lat, ctx):
        def f(l, c):
            eps = pipe.unet.apply(params, jnp.stack([lat[0], l]), jnp.int32(500),
                                  jnp.stack([ctx[0], c]), _state(False))
            return jnp.sum(eps.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(lat[1], ctx[1])

    dt = timeit(lambda: grad_edit_noloss(params, lat2, ctx2), iters=3)
    print(f"  fwd+bwd edit no-loss: {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def grad_loss(params, lat, ctx):
        def f(l, c):
            _, aux = pipe.unet.apply(params, jnp.stack([lat[0], l]), jnp.int32(500),
                                     jnp.stack([ctx[0], c]), _state(True),
                                     mutable=["edit"])
            return edit_attention.collect_edit_aux(aux)[0]
        return jax.grad(f, argnums=(0, 1))(lat[1], ctx[1])

    dt = timeit(lambda: grad_loss(params, lat2, ctx2), iters=3)
    print(f"  fwd+bwd full loss: {dt*1e3:.1f} ms", flush=True)

    from geodiffuser_tpu.core import optimization

    ctx4 = jnp.concatenate([ctx_u, ctx_u, ctx_c, ctx_c], 0).astype(jnp.float32)
    sgd = optimization.init_sgd_state(lat2[1], ctx4[3])
    dt = timeit(lambda: sess._optimize_step(
        params, lat2, ctx4, np.int32(500), masks, np.int32(10), w,
        np.float32(1.0), np.float32(0.5), np.float32(3.0), sgd, wm)[3], iters=3)
    print(f"  full optimize step (remat=False): {dt*1e3:.1f} ms", flush=True)
