"""Perf probe v2: axon's block_until_ready doesn't block; force sync with a
device_get of the result after the timed loop."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

def timeit(f, *args, iters=20):
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]   # drain queue
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]   # FIFO drain => all done
    return (time.time() - t0) / iters

r = {}
n = 4096
a = jnp.ones((n, n), jnp.bfloat16); b = jnp.ones((n, n), jnp.bfloat16)
f = jax.jit(lambda a, b: a @ b)
dt = timeit(f, a, b)
print(f"matmul 4096: {dt*1e3:.2f} ms = {2*n**3/dt/1e12:.1f} TFLOP/s", flush=True)

x = jnp.ones((2, 64, 64, 320), jnp.bfloat16)
w = jnp.ones((3, 3, 320, 320), jnp.bfloat16)
f_conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(x, w, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")))
dt = timeit(f_conv, x, w)
print(f"conv 2x64x64x320: {dt*1e3:.2f} ms = {2*2*64*64*9*320*320/dt/1e12:.1f} TFLOP/s", flush=True)

q = jnp.ones((4, 8, 4096, 40), jnp.bfloat16)
def attn_xla(q, k, v):
    logits = jnp.einsum("shid,shjd->shij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * 0.158, axis=-1)
    return jnp.einsum("shij,shjd->shid", p.astype(v.dtype), v)
f1 = jax.jit(attn_xla)
dt = timeit(f1, q, q, q)
print(f"attn_xla 4-stream 64^2: {dt*1e3:.2f} ms", flush=True)

import sys; sys.path.insert(0, "/root/repo")
from geodiffuser_tpu.kernels.flash_attention import flash_attention
f2 = jax.jit(lambda q, k, v: flash_attention(q, k, v, 0.158))
dt = timeit(f2, q, q, q)
print(f"attn_flash 4-stream 64^2: {dt*1e3:.2f} ms", flush=True)

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.core.pipeline import Pipeline
mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
pipe = Pipeline.create(mcfg, image_size=512)
params = pipe.params["unet"]
lat2 = jnp.ones((2, 64, 64, 4)); ctx2 = jnp.ones((2, 77, 768))
lat4 = jnp.ones((4, 64, 64, 4)); ctx4 = jnp.ones((4, 77, 768))
f_u = jax.jit(lambda p, l, c: pipe.unet.apply(p, l, jnp.int32(500), c))
dt = timeit(f_u, params, lat2, ctx2, iters=20)
print(f"unet fwd 2-stream (flash on): {dt*1e3:.1f} ms", flush=True)
dt = timeit(f_u, params, lat4, ctx4, iters=20)
print(f"unet fwd 4-stream (flash on): {dt*1e3:.1f} ms", flush=True)

# no-flash variant for comparison
import geodiffuser_tpu.core.edit_attention as ea
orig = ea.fast_attention
ea.fast_attention = lambda q,k,v,s,allow_flash: ea.vanilla_attention(q,k,v,s)
f_u2 = jax.jit(lambda p, l, c: pipe.unet.apply(p, l, jnp.int32(500), c))
dt = timeit(f_u2, params, lat4, ctx4, iters=20)
print(f"unet fwd 4-stream (no flash): {dt*1e3:.1f} ms", flush=True)
ea.fast_attention = orig
