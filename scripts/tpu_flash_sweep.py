"""Microbench: flash-attention fwd/bwd block-size sweep at the UNet's hot
shape (8 heads, 4096 seq, d=40).  Times N in-graph calls via lax.scan (one
dispatch, one fetch — the axon tunnel's per-dispatch sync makes host loops
measure RPC, not compute; see verify skill).

Usage: python scripts/tpu_flash_sweep.py [fwd|bwd|both]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from geodiffuser_tpu.kernels import flash_attention as fa

H, L, D = 8, 4096, 40
SCALE = 1.0 / np.sqrt(D)
REPS = 50

rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (H, L, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (H, L, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (H, L, D), jnp.bfloat16)
g = jax.random.normal(jax.random.PRNGKey(3), (H, L, D), jnp.bfloat16)

# useful-FLOP reference for MXU-efficiency percentages
FWD_TFLOP = 2 * 2 * H * L * L * D / 1e12
BWD_TFLOP = 2.5 * FWD_TFLOP  # 5 matmuls vs 2


def timed(fn, *args):
    def body(c, _):
        out = fn(*args)
        # fold a scalar of the output back so the scan can't be elided
        s = jnp.sum(jax.tree.leaves(out)[0][0, 0, :2].astype(jnp.float32))
        return c + s, None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=REPS)[0])
    r = scan()
    _ = np.asarray(r)  # compile+warm
    t0 = time.time()
    r = scan()
    _ = np.asarray(r)
    return (time.time() - t0) / REPS


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"shape=({H},{L},{D}) reps={REPS}   fwd={FWD_TFLOP*1e3:.1f} GFLOP")
    for bq in (256, 512, 1024, 2048):
        for bk in (512, 1024, 2048, 4096):
            if bq > L or bk > L:
                continue
            if what in ("fwd", "both"):
                f = lambda: fa._flash_fwd_impl(q, k, v, SCALE, bq, bk, False)
                try:
                    dt = timed(f)
                    print(f"fwd  bq={bq:<5d} bk={bk:<5d} {dt*1e6:8.0f} us  "
                          f"{FWD_TFLOP/dt:6.1f} TF/s "
                          f"({100*FWD_TFLOP/dt/197:4.1f}% peak)", flush=True)
                except Exception as e:
                    print(f"fwd  bq={bq} bk={bk} FAILED {str(e)[:80]}", flush=True)
            if what in ("bwd", "both"):
                o, lse = fa._flash_fwd_impl(q, k, v, SCALE, 512, 1024, False)
                fb = lambda: fa._flash_bwd_impl(q, k, v, o, lse, g, SCALE,
                                                bq, bk, False)
                try:
                    dt = timed(fb)
                    print(f"bwd  bq={bq:<5d} bk={bk:<5d} {dt*1e6:8.0f} us  "
                          f"{BWD_TFLOP/dt:6.1f} TF/s "
                          f"({100*BWD_TFLOP/dt/197:4.1f}% peak)", flush=True)
                except Exception as e:
                    print(f"bwd  bq={bq} bk={bk} FAILED {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
