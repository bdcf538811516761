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
# XLA:CPU AOT entries are host-machine-keyed (utils/compile_cache.py), so
# CPU tests must NOT share the TPU cache dir.
from geodiffuser_tpu.utils import compile_cache  # noqa: E402

compile_cache.configure("cpu")
