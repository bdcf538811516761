"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's compile checks;
unit tests must be hermetic and CPU-runnable.

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so we must override via jax.config after import — env vars alone
are not sufficient.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the big grad-through-UNet programs cost
# minutes of XLA-CPU compile; caching them makes test reruns (and the
# driver's full-size AOT dry run, which compiles the same programs) cheap.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
