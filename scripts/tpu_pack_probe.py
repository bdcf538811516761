"""Measure multi-edit-per-chip packing (VERDICT r2 weak #3 / next-#1b).

The chip runs ~45% MFU at 2-3 UNet streams per edit; packing E edits on ONE
chip widens the effective batch to E x streams.  This probe measures the
sharded step programs at E in {1, 2, 4} on a dp=1 mesh (all edits resident
on the single real chip), plus one full end-to-end batch at the best E, and
reports amortized per-edit cost + HBM headroom.

Run alone (never two TPU processes at once):
    timeout 3600 python scripts/tpu_pack_probe.py [--no-remat]
"""
import argparse
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


def hbm_gb():
    try:
        st = jax.devices()[0].memory_stats()
        return st["bytes_in_use"] / 2**30, st.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return float("nan"), float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--es", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--full-run-e", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                       remat=not args.no_remat)
    ecfg = EditConfig(num_ddim_steps=args.steps)
    pipe = Pipeline.create(mcfg, image_size=512)
    mesh = sh.make_mesh(n_dp=1)
    sess = ShardedEditSession(pipe, ecfg, mesh=mesh)

    image, depth, mask = build_scene(512)
    params = sess.pipeline.params["unet"]

    for e in args.es:
        images = np.tile(image[None], (e, 1, 1, 1))
        depths = np.tile(depth[None], (e, 1, 1))
        masks_in = np.tile(mask[None], (e, 1, 1))
        transforms = np.stack(
            [np.asarray(camera.compose_transform(tx=0.05 + 0.01 * i, ry=10.0))
             for i in range(e)]
        )
        img = jnp.asarray(images, jnp.float32)
        tf, masks = sess.preprocess_batch(
            img, jnp.asarray(depths), jnp.asarray(masks_in),
            jnp.asarray(transforms, jnp.float32),
        )
        ctx_c = jnp.tile(pipe.encode_text(["probe"]), (e, 1, 1))
        ctx_u = jnp.tile(pipe.encode_text([""]), (e, 1, 1))
        lat0 = pipe.encode_images(img)                        # (E, h, w, 4)
        lat2 = jnp.stack([lat0, lat0], axis=1)                # (E, 2, h, w, 4)
        ctx4 = jnp.stack([ctx_u, ctx_u, ctx_c, ctx_c], axis=1).astype(jnp.float32)
        w = {b: {k: jnp.ones((e,), jnp.float32) * v for k, v in t.items()}
             for b, t in ecfg.resolved_loss_weights().items()}
        sgd = jax.vmap(optimization.init_sgd_state)(lat2[:, 1], ctx4[:, 3])
        wm = sess._b_warp_mats(masks, jnp.float32(1.0), jnp.float32(0.5))

        t0 = time.time()
        dt_cfg = timeit(lambda: sess._b_cfg(
            params, lat2, ctx4, jnp.int32(500), masks, jnp.int32(10), w,
            jnp.float32(1.0), jnp.float32(0.5), lat2[:, :1], jnp.bool_(False), wm))
        compile_cfg = time.time() - t0 - 5 * dt_cfg
        used, peak = hbm_gb()
        print(f"E={e}: cfg step {dt_cfg*1e3:.1f} ms total, "
              f"{dt_cfg*1e3/e:.1f} ms/edit (compile+warm {compile_cfg:.0f}s) "
              f"hbm used={used:.2f}G peak={peak:.2f}G", flush=True)

        t0 = time.time()
        try:
            dt_opt = timeit(lambda: sess._b_optimize(
                params, lat2, ctx4, jnp.int32(500), masks, jnp.int32(10), w,
                jnp.float32(1.0), jnp.float32(0.5), jnp.float32(3.0), sgd, wm)[3],
                iters=3)
            compile_opt = time.time() - t0 - 3 * dt_opt
            used, peak = hbm_gb()
            print(f"E={e}: optimize step {dt_opt*1e3:.1f} ms total, "
                  f"{dt_opt*1e3/e:.1f} ms/edit (compile+warm {compile_opt:.0f}s) "
                  f"hbm used={used:.2f}G peak={peak:.2f}G", flush=True)
        except Exception as err:
            print(f"E={e}: optimize step FAILED ({type(err).__name__}): "
                  f"{str(err)[:300]}", flush=True)
            break

    e = args.full_run_e
    if e:
        images = np.tile(image[None], (e, 1, 1, 1))
        depths = np.tile(depth[None], (e, 1, 1))
        masks_in = np.tile(mask[None], (e, 1, 1))
        transforms = np.stack(
            [np.asarray(camera.compose_transform(tx=0.05 + 0.01 * i, ry=10.0))
             for i in range(e)]
        )
        for label in ("cold", "warm"):
            t0 = time.time()
            res = sess.run_batch(images, depths, masks_in, transforms,
                                 prompts=["probe"] * e)
            wall = time.time() - t0
            print(f"E={e} full 50-step batch ({label}): {wall:.1f}s total = "
                  f"{wall/e:.2f}s/edit amortized; timings="
                  f"{ {k: round(v, 2) for k, v in res.timings.items()} }",
                  flush=True)


if __name__ == "__main__":
    main()
