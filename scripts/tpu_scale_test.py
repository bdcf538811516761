"""Full-size (512^2, SD-1.x) single-step timing probe on the real TPU."""
import time, numpy as np, jax, jax.numpy as jnp
from geodiffuser_tpu.config import ModelConfig, EditConfig
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.core import edit_state, edit_attention
from geodiffuser_tpu.ops import camera

print("devices", jax.devices(), flush=True)
mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
pipe = Pipeline.create(mcfg, image_size=512)
print("pipeline created", flush=True)

H = W = 512
mask = jnp.zeros((H, W)).at[180:300, 180:300].set(1.)
tc = camera.identity_field(H, W).at[..., 0].add(0.15)
am = jnp.zeros((H, W)).at[180:300, 150:330].set(1.)
masks = edit_state.build_mask_sets(mask, tc, am, resolutions=(64, 32, 16, 8))
ecfg = EditConfig()
st_cfg = edit_state.make_edit_state(ecfg, masks, cur_step=3, use_cfg=True, compute_losses=False)
st_opt = edit_state.make_edit_state(ecfg, masks, cur_step=3, use_cfg=False, compute_losses=True)

params = pipe.params["unet"]
lat4 = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 4))
lat2 = lat4[:2]
ctx4 = jax.random.normal(jax.random.PRNGKey(1), (4, 77, 768))
ctx2 = ctx4[:2]

f_cfg = jax.jit(lambda p, l, c, s: pipe.unet.apply(p, l, jnp.int32(500), c, s))
t0 = time.time(); out = jax.block_until_ready(f_cfg(params, lat4, ctx4, st_cfg)); print("cfg fwd compile", time.time() - t0, flush=True)
t0 = time.time()
for _ in range(3):
    out = jax.block_until_ready(f_cfg(params, lat4, ctx4, st_cfg))
print("cfg fwd (4-stream, edit on):", (time.time() - t0) / 3, flush=True)

def loss_fn(le, ce, p):
    lat = jnp.stack([lat2[0], le]); ctx = jnp.stack([ctx2[0], ce])
    _, aux = pipe.unet.apply(p, lat, jnp.int32(500), ctx, st_opt, mutable=['edit'])
    loss, logs = edit_attention.collect_edit_aux(aux)
    return loss

g_f = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
t0 = time.time(); lv, (gl, gc) = jax.block_until_ready(g_f(lat2[1], ctx2[1], params)); print("opt grad compile", time.time() - t0, flush=True)
t0 = time.time()
for _ in range(3):
    lv, (gl, gc) = jax.block_until_ready(g_f(lat2[1], ctx2[1], params))
print("opt grad step:", (time.time() - t0) / 3, "loss", float(lv), flush=True)

# vanilla 2-stream fwd (inversion step cost)
f_inv = jax.jit(lambda p, l, c: pipe.unet.apply(p, l, jnp.int32(500), c))
t0 = time.time(); out = jax.block_until_ready(f_inv(params, lat2, ctx2)); print("inv fwd compile", time.time() - t0, flush=True)
t0 = time.time()
for _ in range(5):
    out = jax.block_until_ready(f_inv(params, lat2, ctx2))
print("vanilla fwd (2-stream):", (time.time() - t0) / 5, flush=True)
