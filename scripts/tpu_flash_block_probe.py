"""Flash-attention block-size sweep at the real edit-loop layer shapes.

VERDICT r2 next-#6: the optimize step is backward-bound (~90 ms device vs a
~55 ms forward); the flash bwd kernels run at fixed 512/512 blocks.  This
probe times fwd / fwd+bwd over (block_q, block_k) at the two flash layers
of the 512^2 edit (L=4096 d=40 and L=1024 d=80, SD-1.x head layout) and the
batch sizes the step programs actually see (streams x 8 heads).

Run alone (never two TPU processes at once):
    timeout 1800 python scripts/tpu_flash_block_probe.py
"""
import itertools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from geodiffuser_tpu.kernels.flash_attention import flash_attention


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters * 1e3


def main():
    # (batch=streams*heads, L, d): 64^2 layer has 8 heads of d=40; 32^2 has
    # 8 heads of d=80.  Streams: 1 (optimize fwd/bwd), 2-3 (CFG fwd).
    shapes = [
        (8, 4096, 40), (24, 4096, 40),
        (8, 1024, 80), (24, 1024, 80),
    ]
    blocks = [256, 512, 1024]
    rng = np.random.RandomState(0)
    for b, l, d in shapes:
        q = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)
        print(f"--- B={b} L={l} D={d}", flush=True)
        for bq, bk in itertools.product(blocks, blocks):
            if bq > l or bk > l:
                continue
            fwd = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, scale, bq, bk))

            def loss(q, k, v, bq=bq, bk=bk):
                return jnp.sum(flash_attention(q, k, v, scale, bq, bk).astype(jnp.float32) ** 2)

            bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                t_f = timeit(fwd, q, k, v)
                t_b = timeit(bwd, q, k, v)
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                continue
            print(f"bq={bq:5d} bk={bk:5d}  fwd {t_f:6.2f} ms   fwd+bwd {t_b:6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
