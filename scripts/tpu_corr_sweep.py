"""Microbench: removal-correlation kernel block sweep at the edit loop's
real shapes (64^2 self-attention: 8 heads, L=4096, d=40; editor budget
K=seq//4=1024, remover K=seq//2=2048) with realistic active-row prefixes.

Usage: python scripts/tpu_corr_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from geodiffuser_tpu.kernels import removal_corr as rc

H, L, D = 8, 4096, 40
SCALE = 1.0 / np.sqrt(D)
REPS = 30


def timed(fn):
    def body(c, _):
        out = fn()
        return c + jnp.sum(out[0][0, :2]), None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=REPS)[0])
    _ = np.asarray(scan())
    t0 = time.time()
    _ = np.asarray(scan())
    return (time.time() - t0) / REPS


def case(k_budget, n_active, label):
    key = jax.random.PRNGKey(0)
    qe = jax.random.normal(key, (H, k_budget, D), jnp.bfloat16)
    ke = jax.random.normal(jax.random.PRNGKey(1), (H, L, D), jnp.bfloat16)
    qb = jax.random.normal(jax.random.PRNGKey(2), (H, L, D), jnp.bfloat16)
    kb = jax.random.normal(jax.random.PRNGKey(3), (H, L, D), jnp.bfloat16)
    inpaint = jnp.zeros((L,)).at[:n_active].set(1.0)
    background = 1.0 - inpaint
    row_mask = jnp.zeros((k_budget,)).at[:n_active].set(1.0)
    print(f"-- {label}: K={k_budget} active_rows={n_active}")
    for bi in (128, 256, 512, 1024):
        for bj, bk in ((512, 512), (1024, 512), (512, 1024), (1024, 1024)):
            try:
                dt = timed(lambda: rc._corr_pallas(
                    qe, ke, qb, kb, inpaint, background, row_mask, SCALE,
                    False, block_i=bi, block_j=bj, block_k=bk))
                print(f"   bi={bi:<5d} bj={bj:<5d} bk={bk:<5d} "
                      f"{dt*1e6:8.0f} us", flush=True)
            except Exception as e:
                print(f"   bi={bi} bj={bj} bk={bk} FAILED {str(e)[:70]}",
                      flush=True)


if __name__ == "__main__":
    case(1024, 384, "editor 64^2 (typical mask)")
    case(2048, 640, "remover 64^2 (dilated mask)")
