"""Real-TPU smoke + microbench for the Pallas kernels.

Validates, on the actual chip (axon tunnel):
 1. flash_attention forward AND backward compile and match XLA attention;
 2. removal_correlation (fused corr kernel) matches the XLA formulation and
    reports the per-layer speedup at SD-1.5 64^2 geometry.

Usage: python scripts/tpu_kernel_smoke.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])[..., :1]  # axon: fetch = sync


def timeit(fn, *args, n=5):
    fn(*args)  # warm
    _ = fetch(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = fetch(out)
    return (time.time() - t0) / n


def main():
    print("backend:", jax.default_backend(), jax.devices())
    from geodiffuser_tpu.core import edit_attention as ea
    from geodiffuser_tpu.kernels import flash_attention as fa
    from geodiffuser_tpu.kernels import removal_corr as rc

    rng = np.random.RandomState(0)
    h, l, d = 8, 4096, 40
    scale = d ** -0.5
    q = jnp.asarray(rng.randn(h, l, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(h, l, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(h, l, d), jnp.bfloat16)
    co = jnp.asarray(rng.randn(h, l, d), jnp.bfloat16)

    # ---- flash forward
    f_flash = jax.jit(lambda a, b, c: fa.flash_attention(a, b, c, scale))
    f_ref = jax.jit(lambda a, b, c: ea.vanilla_attention(a, b, c, scale))
    o1, o2 = f_flash(q, k, v), f_ref(q, k, v)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"flash fwd max|err|={err:.4f}  flash={timeit(f_flash, q, k, v)*1e3:.2f}ms  "
          f"xla={timeit(f_ref, q, k, v)*1e3:.2f}ms")
    assert err < 0.05, err

    # ---- flash backward
    def loss_flash(a, b, c):
        return jnp.sum(fa.flash_attention(a, b, c, scale) * co)

    def loss_ref(a, b, c):
        return jnp.sum(ea.vanilla_attention(a, b, c, scale) * co)

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))
    gf, gr = g_flash(q, k, v), g_ref(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"flash bwd d{name} max|err|={e:.4f}")
        assert e < 0.25, (name, e)
    print(f"flash bwd: flash={timeit(g_flash, q, k, v)*1e3:.2f}ms  "
          f"xla={timeit(g_ref, q, k, v)*1e3:.2f}ms")

    # ---- removal correlation at SD-1.5 64^2 loss-layer geometry
    kk = l // 4
    qe = jnp.asarray(rng.randn(h, kk, d), jnp.bfloat16)
    qb = jnp.asarray(rng.randn(h, l, d), jnp.bfloat16)
    inp = (rng.rand(l) < 0.1).astype(np.float32)
    inp[:8] = 1
    bg = ((rng.rand(l) < 0.6) & (inp < 0.5)).astype(np.float32)
    bg[-8:] = 1
    inp, bg = jnp.asarray(inp), jnp.asarray(bg)

    f_pal = jax.jit(lambda a, b, c, e: rc.removal_correlation(a, b, c, e, inp, bg, None, scale, "pallas", False))
    f_xla = jax.jit(lambda a, b, c, e: rc.removal_correlation(a, b, c, e, inp, bg, None, scale, "xla", False))
    rp, rx = f_pal(qe, k, qb, k), f_xla(qe, k, qb, k)
    for a, b, name in zip(rp[:2], rx[:2], ("p_in", "p_bg")):
        e = float(jnp.max(jnp.abs(a - b)))
        print(f"removal {name} max|err|={e:.5f}")
        assert e < 0.02, (name, e)
    print(f"removal corr: pallas={timeit(f_pal, qe, k, qb, k)*1e3:.2f}ms  "
          f"xla={timeit(f_xla, qe, k, qb, k)*1e3:.2f}ms")

    # ---- removal loss grad through the fused op
    dist = jnp.asarray(rng.rand(l, l), jnp.float32)
    rows = jnp.arange(kk, dtype=jnp.int32)

    def loss_fused(qe_):
        p_in, p_bg, _, j_bg = rc.removal_correlation(qe_, k, qb, k, inp, bg, None, scale, "pallas", False)
        d_bg = dist[rows[None, :], j_bg]
        w = jax.lax.stop_gradient(jnp.exp(-d_bg))
        return (w * (-jnp.log(jnp.maximum(p_bg, 0.) + 1e-4)
                     + jnp.log(jnp.maximum(p_in, 0.) + 1e-4))).sum()

    g_l = jax.jit(jax.grad(lambda qe_: loss_fused(qe_.astype(jnp.bfloat16))))
    t = timeit(g_l, qe.astype(jnp.float32))
    print(f"removal loss grad (fused fwd + sparse bwd): {t*1e3:.2f}ms")
    print("ALL KERNEL SMOKES PASSED")


if __name__ == "__main__":
    main()
