"""Calibrate achievable TFLOP/s and ablate UNet fwd cost on the TPU."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

def timeit(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

# 1) matmul peak
for n in (4096, 8192):
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    dt = timeit(f, a, b)
    print(f"matmul {n}: {dt*1e3:.2f} ms = {2*n**3/dt/1e12:.1f} TFLOP/s", flush=True)

# 2) chained matmul (dispatch amortization check)
f_chain = jax.jit(lambda a, b: jax.lax.fori_loop(0, 20, lambda i, x: x @ b * (1/n), a))
a = jnp.ones((4096, 4096), jnp.bfloat16); b = jnp.ones((4096, 4096), jnp.bfloat16); n = 4096
dt = timeit(f_chain, a, b)
print(f"chained 20x matmul 4096: {dt*1e3:.2f} ms = {20*2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)

# 3) conv cost (SD first block shape)
x = jnp.ones((2, 64, 64, 320), jnp.bfloat16)
w = jnp.ones((3, 3, 320, 320), jnp.bfloat16)
f_conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(x, w, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")))
dt = timeit(f_conv, x, w)
fl = 2 * 2*64*64*9*320*320
print(f"conv 64x64x320: {dt*1e3:.2f} ms = {fl/dt/1e12:.1f} TFLOP/s", flush=True)

# 4) attention ablation at 64^2 (2 streams, 8 heads, d=40)
q = jnp.ones((2, 8, 4096, 40), jnp.bfloat16)
def attn_f32(q, k, v):
    logits = jnp.einsum("shid,shjd->shij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * 0.158, axis=-1)
    return jnp.einsum("shij,shjd->shid", p.astype(v.dtype), v)
def attn_bf16(q, k, v):
    logits = jnp.einsum("shid,shjd->shij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * 0.158, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("shij,shjd->shid", p, v)
def attn_dpa(q, k, v):
    return jax.nn.dot_product_attention(q.transpose(0,2,1,3), k.transpose(0,2,1,3), v.transpose(0,2,1,3), scale=0.158).transpose(0,2,1,3)
for name, fn in [("attn_f32", attn_f32), ("attn_bf16", attn_bf16), ("attn_dpa", attn_dpa)]:
    f = jax.jit(fn)
    dt = timeit(f, q, q, q)
    fl = 2 * 2*8*4096*4096*40*2
    print(f"{name} 64^2: {dt*1e3:.2f} ms ({fl/dt/1e12:.1f} TFLOP/s)", flush=True)

# 5) full vanilla UNet fwd again with careful chained timing
import sys; sys.path.insert(0, "/root/repo")
from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.core.pipeline import Pipeline
mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
pipe = Pipeline.create(mcfg, image_size=512)
params = pipe.params["unet"]
lat2 = jnp.ones((2, 64, 64, 4)); ctx2 = jnp.ones((2, 77, 768))
f_u = jax.jit(lambda p, l, c: pipe.unet.apply(p, l, jnp.int32(500), c))
dt = timeit(f_u, params, lat2, ctx2, iters=10)
print(f"vanilla unet fwd 2-stream: {dt*1e3:.1f} ms", flush=True)
lat4 = jnp.ones((4, 64, 64, 4)); ctx4 = jnp.ones((4, 77, 768))
dt = timeit(f_u, params, lat4, ctx4, iters=10)
print(f"vanilla unet fwd 4-stream: {dt*1e3:.1f} ms", flush=True)

# 6) preprocess breakdown
from geodiffuser_tpu.ops import camera, transform_field, splat
from geodiffuser_tpu.core import edit_state
H=W=512
mask = jnp.zeros((H,W)).at[180:300,180:300].set(1.)
depth = jnp.full((H,W), 0.5)
T = jnp.asarray(camera.compose_transform(tx=0.08, ry=15.0), jnp.float32)
img = jnp.ones((H,W,3))
f_tf = jax.jit(lambda i,d,m,t: transform_field.build_transform_field(i,d,m,t))
dt = timeit(f_tf, img, depth, mask, T, iters=5)
print(f"build_transform_field: {dt*1e3:.1f} ms", flush=True)
tc = camera.identity_field(H,W)
f_am = jax.jit(lambda m, c: splat.densified_mask_splat(m, c))
dt = timeit(f_am, mask, tc, iters=5)
print(f"densified amodal splat (4x): {dt*1e3:.1f} ms", flush=True)
f_sp = jax.jit(lambda s, c: splat.splat_image(s, c))
dt = timeit(f_sp, img, tc, iters=5)
print(f"plain 512^2 splat: {dt*1e3:.1f} ms", flush=True)
am = jnp.zeros((H,W)).at[180:300,150:330].set(1.)
f_ms = jax.jit(lambda m, c, a: edit_state.build_mask_sets(m, c, a, resolutions=(64,32,16,8)))
dt = timeit(f_ms, mask, tc, am, iters=5)
print(f"build_mask_sets: {dt*1e3:.1f} ms", flush=True)
